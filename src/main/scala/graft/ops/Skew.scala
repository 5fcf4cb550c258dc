package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for aggregations over hot keys.
  *
  * A `groupBy(k)` over data where one key holds a large share of all rows
  * sends that share to a single reducer. Map-side partial aggregation
  * already absorbs most of this for algebraic aggregates; salting is the
  * explicit guard for when it cannot (high-cardinality partial state per
  * group — e.g. collect_set/approx distinct — or extreme single-key skew):
  * phase 1 aggregates on (key, salt) spreading each hot key over `salts`
  * reducers, phase 2 merges the `salts` partials per key. Results are
  * identical to the direct aggregation for any commutative merge.
  *
  * The salt is a deterministic hash of the whole input row (not rand()):
  * re-running the job reproduces the same partials, which keeps results
  * stable under speculative execution and retries.
  *
  * For JOIN skew, prefer AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it splits
  * oversized partitions at runtime without changing the query.
  */
object Skew {

  /** A salted aggregate: `partial` runs per (keys, salt), `merge` combines
    * the per-salt partials into the final per-key value named `name`. */
  final case class SaltedAgg(partial: Column, merge: String => Column, name: String)

  object SaltedAgg {
    /** SUM: partial sums merge by summing. */
    def sum_(e: Column, name: String): SaltedAgg =
      SaltedAgg(sum(e), p => sum(col(p)), name)
    /** COUNT(*): partial counts merge by summing. */
    def countStar(name: String): SaltedAgg =
      SaltedAgg(count(lit(1)), p => sum(col(p)).cast("long"), name)
    /** COUNT(e). */
    def count_(e: Column, name: String): SaltedAgg =
      SaltedAgg(count(e), p => sum(col(p)).cast("long"), name)
    /** MIN / MAX: partial extrema merge by min/max. */
    def min_(e: Column, name: String): SaltedAgg =
      SaltedAgg(min(e), p => min(col(p)), name)
    def max_(e: Column, name: String): SaltedAgg =
      SaltedAgg(max(e), p => max(col(p)), name)
  }

  /** Two-phase salted aggregation. Output: keys ++ agg names, identical to
    * the unsalted `groupBy(keys).agg(...)` for these algebraic aggregates. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      aggs: Seq[SaltedAgg],
      salts: Int = 32): DataFrame = {
    require(aggs.nonEmpty && salts > 0)
    val salt = pmod(xxhash64(df.columns.map(col): _*), lit(salts)).as("__ivm_salt")
    val partialNames = aggs.zipWithIndex.map { case (a, i) => s"__ivm_p$i" }
    val partials = aggs.zip(partialNames).map { case (a, p) => a.partial.as(p) }
    val merged = aggs.zip(partialNames).map { case (a, p) => a.merge(p).as(a.name) }
    val phase1 = df
      .withColumn("__ivm_salt", salt)
      .groupBy((keys :+ "__ivm_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val phase2 =
      if (keys.isEmpty) phase1.agg(merged.head, merged.tail: _*)
      else phase1.groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
    phase2
  }
}
