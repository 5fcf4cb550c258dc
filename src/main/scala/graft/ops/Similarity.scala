package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — correct, O(queries × corpus), used
  * when the query set is small (broadcast) or as the verifier for ANN.
  *
  * Scale path: bucketed ANN — a deterministic sign-bit sketch (random-
  * hyperplane LSH with axis-aligned planes) partitions the corpus; a query
  * only scans its own bucket. At 100 TB the corpus is written bucketed
  * (partitionBy(bucket)) so a query prunes to one partition on disk; the
  * cross-bucket recall loss is the standard ANN trade-off, measured against
  * the brute-force baseline.
  *
  * Dot products are sequential folds over `zip_with` (deterministic,
  * codegen'd, no UDF) with inputs cast to double — bit-identical across
  * engines, so the DuckDB oracle can hash-match even floating point.
  */
object Similarity {

  /** Codegen'd native dot product bound to the df's session — identical
    * semantics to [[dot]], ~8x faster (see graft.functions.VecDot). */
  def fastDot(df: DataFrame): (Column, Column) => Column = {
    val spark = df.sparkSession
    (a, b) => graft.functions.VecDot.dot(spark, a, b)
  }

  /** Sequential-fold dot product of two float vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  /** Sequential-fold L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity, deterministic evaluation order. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Two-phase deterministic top-k: a PARTIAL top-k per (query, salt)
    * group, then the global ranking over the union of partials.
    *
    * The naive single window `partitionBy(q_id)` funnels every scored
    * (query, corpus) row for one query through ONE reducer — O(|corpus|)
    * rows per task at scale. Salting by hash(n_id) spreads each query's
    * candidates over `salts` reducers first; only salts×k survivors per
    * query reach the global window. The global top-k of the per-salt
    * top-ks IS the overall top-k (every global winner wins its own salt
    * group), and (cosine desc, n_id asc) ordering keeps ranking
    * deterministic across partitionings. */
  private[ops] def topKPerQuery(scored: DataFrame, k: Int, salts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPart = Window.partitionBy(col("q_id"), pmod(hash(col("n_id")), lit(salts)))
      .orderBy(col("cosine").desc, col("n_id").asc)
    val wGlobal = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id").asc)
    scored
      .withColumn("__ann_pr", row_number().over(wPart))
      .where(col("__ann_pr") <= k)
      .withColumn("rank", row_number().over(wGlobal))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "cosine", "rank")
  }

  /** Brute-force cosine top-k: for every query vector, the k nearest
    * corpus vectors (excluding itself). The query side is broadcast — the
    * corpus streams from parquet with no shuffle until the two-phase
    * per-query top-k ([[topKPerQuery]]), which shuffles only salts×k rows
    * per query into the final ranking.
    * Deterministic ranking: (cosine rounded to 6 dp desc, id asc). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      salts: Int = 32): DataFrame = {
    val nDot = fastDot(corpus)
    // Norms are precomputed per vector BEFORE the join (norm(v) is the same
    // fold either way, so results are bit-identical) — at n queries × m
    // corpus this saves 2·n·m folds, leaving one dot per pair.
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      sqrt(nDot(col(vecCol), col(vecCol))).as("q_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      sqrt(nDot(col(vecCol), col(vecCol))).as("n_norm"))
    val scored = c.crossJoin(q)
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        round(nDot(col("qv"), col("nv")) / (col("q_norm") * col("n_norm")), 6))
    topKPerQuery(scored, k, salts)
  }

  /** Sign-bit LSH bucket from the first `nBits` dimensions: bit i set iff
    * v[i] >= 0. Deterministic, engine-portable. */
  def signBucket(v: Column, nBits: Int = 8): Column =
    (0 until nBits).map { i =>
      when(element_at(v, i + 1) >= 0, lit(1L) * (1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN top-k: queries only scan corpus vectors in their own
    * sign-bucket. Same ranking rule as brute force; recall < 1 by design.
    * Candidate sets are bucket-bounded, but a hot bucket still benefits
    * from the same two-phase top-k. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nBits: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding",
      salts: Int = 32): DataFrame = {
    val nDot = fastDot(corpus)
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), nBits).as("bucket"),
      sqrt(nDot(col(vecCol), col(vecCol))).as("q_norm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"),
      signBucket(col(vecCol), nBits).as("bucket"),
      sqrt(nDot(col(vecCol), col(vecCol))).as("n_norm"))
    val scored = c.join(q, Seq("bucket"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        round(nDot(col("qv"), col("nv")) / (col("q_norm") * col("n_norm")), 6))
    topKPerQuery(scored, k, salts)
  }
}
