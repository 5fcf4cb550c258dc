package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling for training-data pipelines.
  *
  * Everything here derives membership from a HASH of a stable row id —
  * never `rand()`, which changes under task retries/speculation, breaks
  * reproducibility across runs, and cannot be mirrored by an oracle engine.
  * Hash-derived membership is also embarrassingly parallel: a pure
  * filter with zero shuffle, the plan you want at 100 TB (predicate and
  * column pruning still reach the parquet scan below it).
  *
  * The reference has no sampling surface; this extends the training-data
  * ops family (BASELINE.json north star) alongside dedup/split
  * ([[TextOps.hashSplit]] supplies the bucket function).
  */
object Sampling {

  /** Uniform `percent`% sample: keep a row iff its id hashes into the
    * first `percent` of 100 buckets. Complementary cuts compose exactly:
    * `uniform(df, id, 95)` and `hashSplit(id) >= 95` partition the data. */
  def uniform(df: DataFrame, id: Column, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    df.where(TextOps.hashSplit(id, 100) < percent)
  }

  /** Stratified sample with a per-row rate: keep a row iff its id hashes
    * below `ratePercent` (a Column in [0, 100], typically a CASE over the
    * stratum column — e.g. downsample the dominant event type to 5% while
    * keeping rare types at 100%). Rates are exact in expectation per
    * stratum and deterministic per row; rows never move between samples
    * when other strata's rates change (the hash ignores the stratum). */
  def stratified(df: DataFrame, id: Column, ratePercent: Column): DataFrame =
    df.where(TextOps.hashSplit(id, 100) < ratePercent)
}
