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
  * An op value outside the three sets fails the batch loudly (assert_true
  * inside the filter predicate — evaluated per row, never pruned) rather
  * than silently dropping a change: a skipped CDC row is a silently
  * diverged view, the one failure mode an IVM engine must never have.
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
    // NULL on pass, raises on an unrecognized op — keeps the guard inside
    // the filter so every surviving row was checked.
    val guard = assert_true(op.isin(insertOps ++ updateOps ++ deleteOps: _*),
      concat(lit("CDC op not in insert/update/delete sets: "), op)).isNull
    val assertions = log
      .where(guard && op.isin(insertOps ++ updateOps: _*))
      .select(col(s"$afterCol.*"))
      .withColumn(IvmCore.MULT, lit(true))
    val retractions = log
      .where(guard && op.isin(deleteOps ++ updateOps: _*))
      .select(col(s"$beforeCol.*"))
      .withColumn(IvmCore.MULT, lit(false))
    assertions.unionByName(retractions)
  }
}
