package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the data-dependent
  * alternative to [[Similarity.bucketedTopK]]'s sign-bit LSH: cluster
  * centroids are LEARNED from the corpus (spherical k-means-lite), so
  * cells adapt to the embedding distribution instead of slicing
  * axis-aligned half-spaces. Recall at a given probe budget is measured
  * against [[Similarity.bruteForceTopK]] (see IvfSpec).
  *
  * Scale design (100 TB corpus):
  *   - Training samples/iterates as distributed jobs; only the k×dim
  *     centroid matrix (a few KB) reaches the driver, and it re-enters
  *     the plan as LITERALS — cell assignment is a pure Catalyst
  *     expression over codegen'd [[graft.functions.VecDot]] dot products
  *     (argmax via array_max/array_position), no UDF anywhere.
  *   - Index build is one pass: each vector gets its nearest-centroid cell
  *     id; at scale the corpus is written `partitionBy("ivf_cell")` so a
  *     query reads only its `nprobe` cells from disk (same pruning story
  *     as the IVM store's buckets).
  *   - Query: probe cells come from the same centroid literals on the
  *     (small, broadcast) query side; the corpus join prunes to probed
  *     cells; ranking is the two-phase salted top-k ([[Similarity]]),
  *     never a one-reducer-per-query window.
  *   - `nprobe = nCells` degenerates to exact brute force (every cell
  *     scanned) — the correctness oracle and the recall = 1 endpoint of
  *     the accuracy/cost curve.
  */
object Ivf {

  /** Learned model: row-major centroid matrix, L2-normalized. */
  final case class Model(centroids: Array[Array[Float]]) {
    def nCells: Int = centroids.length
  }

  private def normalize(v: Array[Double]): Array[Float] = {
    var n = 0d; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n == 0d) 0d else 1d / math.sqrt(n)
    v.map(x => (x * inv).toFloat)
  }

  /** Cosine argmax cell — train-time twin of the Catalyst [[cellExpr]]
    * (primitive loop; used inside typed mapPartitions during training). */
  private def nearestCell(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0d; var i = 0
      while (i < v.length && i < cent.length) { d += v(i).toDouble * cent(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c } // strict >: ties → lower id
      c += 1
    }
    best
  }

  /** k-means-lite on cosine geometry: deterministic init (k lowest-id
    * vectors), `iters` assign/re-center rounds via per-partition partial
    * (sum, count) aggregation, centroids re-normalized each round.
    * Empty cells keep their previous centroid. */
  def train(corpus: DataFrame, k: Int, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    var cents: Array[Array[Float]] = vecs
      .orderBy(col(idCol)).limit(k).collect()
      .map { case (_, v) => normalize(v.map(_.toDouble)) }
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = vecs.mapPartitions { it =>
        val cs = bc.value
        val dim = cs.head.length
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val counts = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          val cell = nearestCell(v, cs)
          val s = sums(cell)
          var i = 0
          while (i < v.length && i < s.length) { s(i) += v(i); i += 1 }
          counts(cell) += 1
        }
        Iterator.tabulate(cs.length)(c => (c, sums(c), counts(c)))
          .filter(_._3 > 0)
      }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val (c, s1, n1) = a; val (_, s2, n2) = b
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          (c, s1, n1 + n2)
        }
        .map(_._2)
        .collect()
      val next = cents.map(_.clone())
      partials.foreach { case (c, s, n) => next(c) = normalize(s.map(_ / n)) }
      cents = next
      bc.destroy()
    }
    Model(cents)
  }

  /** Per-centroid dot products of `v` as a literal-matrix expression —
    * k codegen'd VecDot calls against array literals. */
  private def dotsExpr(spark: SparkSession, v: Column, m: Model): Column =
    array(m.centroids.map(c =>
      graft.functions.VecDot.dot(spark, v, typedLit(c.toSeq))): _*)

  /** Nearest-cell id as a pure Catalyst expression: argmax of the dot
    * array; first occurrence of the max → ties break to the lower cell id,
    * matching [[nearestCell]]. */
  def cellExpr(spark: SparkSession, v: Column, m: Model): Column = {
    val d = dotsExpr(spark, v, m)
    (array_position(d, array_max(d)) - 1).cast("int")
  }

  /** The `nprobe` nearest cell ids (descending dot, ties → lower id). */
  def probeExpr(spark: SparkSession, v: Column, m: Model, nprobe: Int): Column = {
    val d = dotsExpr(spark, v, m)
    val ranked = array_sort(zip_with(
      d, sequence(lit(0), lit(m.nCells - 1)),
      (dot, i) => struct((-dot).as("nd"), i.as("i"))))
    transform(slice(ranked, 1, nprobe), s => s("i"))
  }

  /** Corpus with its `ivf_cell` assignment appended — at scale, write this
    * `partitionBy("ivf_cell")` so queries prune cells on disk. */
  def assign(corpus: DataFrame, model: Model,
      vecCol: String = "embedding"): DataFrame =
    corpus.withColumn("ivf_cell",
      cellExpr(corpus.sparkSession, col(vecCol), model))

  /** Persist the on-disk IVF index: the corpus partitioned by cell, one
    * directory per cell. [[topKIndexed]] then reads ONLY the cells a
    * query batch probes — same disk-pruning story as the IVM store's
    * buckets. The model itself (k×dim floats) travels separately; it is
    * a few KB of literals. */
  def writeIndex(corpus: DataFrame, model: Model, dir: String,
      vecCol: String = "embedding"): Unit =
    assign(corpus, model, vecCol)
      .write.partitionBy("ivf_cell").mode("overwrite").parquet(dir)

  /** IVF top-k over an on-disk index written by [[writeIndex]]: the probe
    * cells of the (small) query batch decide which cell DIRECTORIES are
    * read — disk I/O is |probed cells| / |cells| of the corpus, before
    * any executor sees a row. Explicit path pruning rather than relying
    * on dynamic partition pruning heuristics: the probe set is known
    * driver-side, so the pruning is deterministic. Results are identical
    * to [[topK]] with the same model/nprobe. */
  def topKIndexed(indexDir: String, queries: DataFrame, k: Int, model: Model,
      nprobe: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      salts: Int = 32): DataFrame = {
    val spark = queries.sparkSession
    val nDot = Similarity.fastDot(queries)
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        sqrt(nDot(col(vecCol), col(vecCol))).as("q_norm"),
        explode(probeExpr(spark, col(vecCol), model, nprobe)).as("ivf_cell")))
    // queries are small by contract — one cheap pass finds the probed set
    val probed = queries
      .select(explode(probeExpr(spark, col(vecCol), model, nprobe)).as("c"))
      .distinct().collect().map(_.getInt(0))
    val dirs = probed.map(c => s"$indexDir/ivf_cell=$c")
      .filter(p => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p)))
    // basePath keeps the partition column in the schema for the join
    val c = spark.read.option("basePath", indexDir).parquet(dirs.toIndexedSeq: _*)
      .select(col(idCol).as("n_id"), col(vecCol).as("nv"),
        sqrt(nDot(col(vecCol), col(vecCol))).as("n_norm"), col("ivf_cell"))
    val scored = c.join(q, Seq("ivf_cell"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        round(nDot(col("qv"), col("nv")) / (col("q_norm") * col("n_norm")), 6))
    Similarity.topKPerQuery(scored, k, salts)
  }

  /** IVF top-k: each query probes its `nprobe` nearest cells and scores
    * only vectors in those cells. Scoring/rounding/ranking identical to
    * [[Similarity.bruteForceTopK]], so `nprobe = model.nCells` returns
    * bit-identical results to brute force. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, model: Model,
      nprobe: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      salts: Int = 32): DataFrame =
    topKAssigned(assign(corpus, model, vecCol), queries, k, model, nprobe,
      idCol, vecCol, salts)

  /** [[topK]] over an ALREADY-ASSIGNED index frame (`ivf_cell` column
    * present) — the MAINTAINED-index path: the cell assignment lives in
    * IVM state kept current by refresh, so a query pays scoring only,
    * never re-assignment of the corpus. */
  def topKAssigned(index: DataFrame, queries: DataFrame, k: Int, model: Model,
      nprobe: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      salts: Int = 32): DataFrame = {
    val spark = index.sparkSession
    val nDot = Similarity.fastDot(index)
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        sqrt(nDot(col(vecCol), col(vecCol))).as("q_norm"),
        explode(probeExpr(spark, col(vecCol), model, nprobe)).as("ivf_cell")))
    val c = index
      .select(col(idCol).as("n_id"), col(vecCol).as("nv"),
        sqrt(nDot(col(vecCol), col(vecCol))).as("n_norm"), col("ivf_cell"))
    val scored = c.join(q, Seq("ivf_cell"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        round(nDot(col("qv"), col("nv")) / (col("q_norm") * col("n_norm")), 6))
    Similarity.topKPerQuery(scored, k, salts)
  }
}
