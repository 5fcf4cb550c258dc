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

  /** Rebalance a corpus to TARGET MIXTURE proportions (the Pile/LLaMA-style
    * source-mixing step): given per-source target weights, derive each
    * source's keep-rate FROM THE DATA so the sampled corpus hits the
    * target mix at the largest size achievable without upsampling —
    * scale = minₛ(nₛ/wₛ), rateₛ = min(1, scale·wₛ/nₛ); the scarcest
    * source keeps 100% and every other source downsamples to match.
    * Sources not in `weights` are dropped; a weighted source with zero
    * corpus rows fails loudly (the target mix would be silently wrong).
    *
    * Scale shape: one map-side-combinable count per source (tiny result),
    * a broadcast rate table, then a pure hash filter — the corpus itself
    * never shuffles, and membership is a deterministic function of the
    * row id (stable across retries, runs, and engines — the DuckDB
    * oracle recomputes the same rates and the same md5 threshold). */
  def mixture(df: DataFrame, id: Column, source: Column,
      weights: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "mixture weights must be positive")
    val spark = df.sparkSession
    val tagged = df.withColumn("__mix_src", source)
    // One map-side-combinable count per source — a tiny result collected to
    // the driver. (The old plan computed the same aggregate INSIDE the
    // final query, so total passes over the corpus are unchanged: one for
    // the counts, one for the filter.) Collecting it lets us fail loudly
    // when a weighted source has ZERO corpus rows — the inner join used to
    // silently drop it, deriving scale from the remaining sources and
    // missing the requested proportions without any signal.
    val n = tagged.groupBy("__mix_src")
      .agg(count(lit(1)).cast("double").as("__mix_n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val missing = weights.collect { case (s, _) if !n.contains(s) => s }
    require(missing.isEmpty,
      s"mixture: weighted source(s) with zero corpus rows: ${missing.mkString(", ")}")
    // Same IEEE double arithmetic, same op order as the SQL oracle:
    // scale = min_s(n_s/w_s); rate_s = min(1, scale*w_s/n_s).
    val scale = weights.map { case (s, wt) => n(s) / wt }.min
    val rates = spark.createDataFrame(weights.map { case (s, wt) =>
      (s, math.min(1.0, scale * wt / n(s)))
    }).toDF("__mix_src", "__mix_rate")
    // integer threshold on the 10⁶-bucket hash: floor(rate·10⁶) mirrors
    // bit-for-bit in the oracle (IEEE ops in the same order both sides)
    tagged.join(broadcast(rates), "__mix_src")
      .where(TextOps.hashSplit(id, 1000000) <
        floor(col("__mix_rate") * lit(1000000.0)).cast("long"))
      .drop("__mix_src", "__mix_rate")
  }
}
