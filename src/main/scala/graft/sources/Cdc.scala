package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ivm.IvmCore

/** Change-data-capture ingestion: maps a Debezium-shaped op log to the
  * engine's delta convention (base columns + boolean
  * `_duckdb_ivm_multiplicity`), so any CDC feed can drive
  * `Ivm.refreshState` / `IvmStream.maintain` directly.
  *
  * Expected log shape (Debezium envelope, the de-facto CDC wire format):
  * an `op` discriminator plus `before`/`after` row-image structs typed as
  * the base table's schema. Mapping:
  *
  *  - insert ops (`c`reate, `r`ead/snapshot) → after-image, mult = true
  *  - delete ops (`d`) → before-image, mult = false
  *  - update ops (`u`) → BOTH: before-image retraction ⊎ after-image
  *    assertion — exactly the reference's update model (README.md:41-43:
  *    "an update is modeled as delete + insert")
  *
  * An op value outside the three sets fails the batch loudly (a checked op
  * PROJECTION applied before the insert/delete split filters — a pushed-down
  * filter can never prune a row before its op was checked) rather than
  * silently dropping a change: a skipped CDC row is a silently diverged
  * view, the one failure mode an IVM engine must never have.
  *
  * Pure select/filter/union — works identically on batch and streaming
  * DataFrames (no state, no shuffle; the union is per-partition).
  */
object Cdc {
  def toDeltas(
      log: DataFrame,
      opCol: String = "op",
      beforeCol: String = "before",
      afterCol: String = "after",
      insertOps: Seq[String] = Seq("c", "r"),
      updateOps: Seq[String] = Seq("u"),
      deleteOps: Seq[String] = Seq("d")): DataFrame = {
    val op = col(opCol)
    // The op column is CHECKED by projection BEFORE any split filter: every
    // row's op routes through a CASE that raises on an unrecognized value.
    // The insert/delete split then filters on the checked column, so a
    // source that handles pushed IN filters cannot prune a junk-op row
    // before the check runs — the raise_error branch is not expressible as
    // a source filter, so Catalyst keeps the predicate (and the check)
    // above the scan.
    val all = insertOps ++ updateOps ++ deleteOps
    val checkedCol = "__cdc_checked_op"
    val checked = log.withColumn(checkedCol,
      when(op.isin(all: _*), op).otherwise(
        raise_error(concat(lit("CDC op not in insert/update/delete sets: "), op))))
    val assertions = checked
      .where(col(checkedCol).isin(insertOps ++ updateOps: _*))
      .select(col(s"$afterCol.*"))
      .withColumn(IvmCore.MULT, lit(true))
    val retractions = checked
      .where(col(checkedCol).isin(deleteOps ++ updateOps: _*))
      .select(col(s"$beforeCol.*"))
      .withColumn(IvmCore.MULT, lit(false))
    assertions.unionByName(retractions)
  }
}
