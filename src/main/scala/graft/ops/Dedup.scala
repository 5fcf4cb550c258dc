package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB case:
  *
  *  - exact: one hash-shuffle on a 32-byte digest, never on the document
  *    body; map-side partial aggregation halves the shuffle.
  *  - n-gram Jaccard: inverted shingle index + equi-join — candidate pairs
  *    only ever meet through a shared shingle; a document-frequency cap
  *    drops degenerate ultra-common shingles (stopword runs), which is both
  *    the scale guard (bounds join skew) and standard practice.
  *  - MinHash+LSH: fixed-width signature per doc (k small constants), then
  *    band-bucket equi-joins — pair candidates are found without any
  *    all-pairs work; cost is O(docs × k) + O(bucket collisions).
  *  - SimHash: constant-size fingerprint per doc; near-dup lookup is a
  *    bucket group-by, hamming verification is two integer ops.
  *  - embedding near-dup: cosine over a blocked (label-partitioned) join;
  *    the blocking key is what keeps it off the all-pairs cliff.
  *
  * All hashing goes through md5 hex (portable across engines); folds are
  * sequential; every op has an exact DuckDB SQL mirror for the oracle gate.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup via content digest: one row per distinct text with the
    * canonical (minimum) id and the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ----------------------------------------------------------- shingles

  /** Word n-gram shingles per document: (id, shingle), one row per
    * occurrence (consumers dedup where semantics need it — min() and
    * collect_set() are duplicate-insensitive).
    *
    * Typed flatMap, not array higher-order functions: Spark's array HOFs
    * (transform/aggregate/…) are CodegenFallback — interpreted, boxing per
    * element — and measured 8-10× slower here. Per-row imperative token
    * sliding is exactly the case where Dataset.flatMap is the right tool. */
  def shingles(docs: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ts = text.split(' ')
        if (ts.length < n) Iterator.empty
        else ts.sliding(n).map(w => (id, w.mkString(" ")))
      }.toDF("id", "shingle")
  }

  // ------------------------------------------------- decontamination

  /** Benchmark-contamination detection: corpus documents sharing at least
    * `minHits` distinct word n-grams with an evaluation-set document.
    * Training pipelines run this before every release — eval rows that
    * leak into the corpus invalidate the benchmark.
    *
    * Scale shape: the benchmark side is tiny by construction (eval sets
    * are thousands of docs against a 100 TB corpus), so its distinct
    * shingle set is broadcast and the corpus streams through a map-side
    * hash join — the only shuffle is the per-(doc, bench) hit count.
    * Shingles meet as xxhash64 keys (8 bytes, collision odds
    * ~|shingles|²/2⁶⁴), never as strings. */
  def benchmarkOverlap(corpus: DataFrame, bench: DataFrame, n: Int = 3,
      minHits: Int = 2): DataFrame = {
    def hashed(docs: DataFrame, as: String) =
      shingles(docs, n)
        .select(col("id").as(as), xxhash64(col("shingle")).as("h"))
        .distinct()
    hashed(corpus, "doc_id")
      .join(broadcast(hashed(bench, "bench_id")), Seq("h"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") >= minHits)
  }

  // ---------------------------------------------------- n-gram Jaccard

  /** Near-duplicate pairs by n-gram Jaccard similarity ≥ `threshold`.
    * `maxShingleDf`: shingles appearing in more documents are dropped from
    * candidate generation (scale guard; also applied to the size counts so
    * the measure stays a true Jaccard over the kept shingle sets). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxShingleDf: Int = 100): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // Inverted index without a self-join: ONE shuffle groups doc-ids by
    // shingle (hashed to 8 bytes — xxhash64 collisions are ~|shingles|²/2⁶⁴,
    // negligible), collect_set dedups in-group, and candidate pairs explode
    // map-side from each posting list. A 260k×260k string sort-merge join
    // becomes groupBy + flatMap — the difference between O(index) shuffle
    // bytes and O(pairs) shuffle bytes matters enormously at 100 TB.
    // The df cap both bounds the per-group explosion (skew guard) and drops
    // degenerate ultra-common shingles.
    val postings = shingles(docs, n)
      .groupBy(xxhash64(col("shingle")).as("h"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) <= maxShingleDf)
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds pairs AND sizes
    val sizes = postings.select(explode(col("ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_sh"))
    val pairs = postings
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          b => struct(a.as("a_id"), b.as("b_id")))))).as("p"))
      .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    // sizes is one row per doc — NOT broadcast-hinted (it scales with the
    // corpus); AQE broadcasts it when it is actually small.
    pairs
      .join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("n_sh", "na"), Seq("a_id"))
      .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("n_sh", "nb"), Seq("b_id"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ------------------------------------------------------ MinHash + LSH

  /** MinHash signature k-vector: seed s takes an 8-hex-char slice of
    * md5(prefix || '|' || shingle) where prefix = s/4 — one digest serves
    * four seeds (32 hex chars / 8), quartering the hash work vs one md5
    * per seed. Hex-string min is a portable total order. */
  def minhashSignatures(docs: DataFrame, k: Int = 8, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n)
    val exprs = (0 until k).map { s =>
      val digest = md5(concat(lit((s / 4).toString), lit("|"), col("shingle")))
      min(substring(digest, 1 + 8 * (s % 4), 8)).as(s"mh$s")
    }
    sh.groupBy("id").agg(exprs.head, exprs.tail: _*)
  }

  /** Candidate near-duplicate pairs via LSH banding: `bands` bands of
    * `k/bands` minhash rows; docs sharing any band key become a pair. */
  def minhashLshPairs(docs: DataFrame, k: Int = 8, bands: Int = 4, n: Int = 3): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rowsPerBand = k / bands
    val sig = minhashSignatures(docs, k, n)
    // Same posting-list trick as ngramJaccardPairs: group ids per
    // (band, band_key), explode pairs map-side — no self-join.
    val banded = sig.select(col("id"),
      posexplode(array((0 until bands).map { b =>
        md5(concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
      }: _*)).as(Seq("band", "band_key")))
    banded.groupBy("band", "band_key")
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids")) - i - 1),
          b => struct(a.as("a_id"), b.as("b_id")))))).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .distinct()
  }

  // ------------------------------------------------------------ SimHash

  /** 32-bit SimHash from md5 hex digits of each distinct token: bit b of
    * the fingerprint is the sign of Σ_tokens (2·bit_b(md5(tok)) − 1).
    * Hex digit h (1-based digit position d = b/4 + 1) contributes bit
    * (b mod 4) via floor(h / 2^(b mod 4)) mod 2 — all integer arithmetic,
    * identical in any engine. */
  def simhash(text: Column): Column = {
    // value of one hex digit, 0..15 (oracle mirror: strpos('0123..f',d)-1)
    def hexVal(d: Column): Column = conv(d, 16, 10).cast("long")
    val toks = array_distinct(TextOps.tokens(text))
    val bits = (0 until 32).map { b =>
      val digitPos = b / 4 + 1
      val bitInDigit = b % 4
      val contrib = aggregate(toks, lit(0L), (acc, t) => {
        val h = hexVal(substring(md5(t), digitPos, 1))
        acc + (shiftright(h, bitInDigit) % 2) * 2 - 1
      })
      when(contrib > 0, lit(1L) * (1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Per-doc SimHash fingerprints. */
  def simhashDocs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), simhash(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs: identical fingerprint, or hamming ≤ maxDist
    * within coarse bucket (top 16 bits). */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val s = simhashDocs(docs)
    val a = s.select(col("doc_id").as("a_id"), col("simhash").as("sh_a"),
      shiftright(col("simhash"), 16).as("bucket"))
    val b = s.select(col("doc_id").as("b_id"), col("simhash").as("sh_b"),
      shiftright(col("simhash"), 16).as("bucket"))
    a.join(b, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxDist)
      .select("a_id", "b_id", "hamming")
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate vector pairs: cosine ≥ threshold among same-`blockCol`
    * pairs (blocking keeps the join off the all-pairs cliff; at scale the
    * block key is an LSH/IVF bucket — see [[Similarity]]). */
  def embeddingNearDup(emb: DataFrame, threshold: Double,
      blockCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Precompute norms per vector (same fold → bit-identical cosine);
    // only the dot product remains per-pair work.
    val nDot = Similarity.fastDot(emb)
    val a = emb.select(col(blockCol).as("blk"), col(idCol).as("a_id"),
      col(vecCol).as("va"), sqrt(nDot(col(vecCol), col(vecCol))).as("na"))
    val b = emb.select(col(blockCol).as("blk"), col(idCol).as("b_id"),
      col(vecCol).as("vb"), sqrt(nDot(col(vecCol), col(vecCol))).as("nb"))
    a.join(b, Seq("blk"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cosine",
        nDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  // --------------------------------------------------- duplicate clusters

  /** Connected components over near-dup pair edges — the step that turns
    * pairwise candidates into KEEP-ONE-PER-CLUSTER decisions. Min-label
    * propagation: every node starts labeled by itself and repeatedly
    * adopts the minimum label among itself and its neighbors; at the
    * fixpoint each node carries its component's minimum id (`rep`).
    * Converges in graph-diameter rounds — near-dup graphs are shallow
    * (mostly cliques and short chains), so a handful of shuffle rounds;
    * each round's lineage is truncated (localCheckpoint) so plans stay
    * O(1) across iterations. At extreme diameters switch to the
    * large-star/small-star variant (halves distances per round) — same
    * join-per-round shape. Returns (id, rep). */
  def clusters(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 30): DataFrame = {
    val edges = pairs.select(col(aCol).as("x"), col(bCol).as("y"))
      .unionByName(pairs.select(col(bCol).as("x"), col(aCol).as("y")))
      .distinct().cache()
    var labels = edges.select(col("x").as("id")).distinct()
      .withColumn("rep", col("id")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbr = edges.join(labels.withColumnRenamed("id", "y"), "y")
        .select(col("x").as("id"), col("rep"))
      val next = labels.unionByName(nbr)
        .groupBy("id").agg(min("rep").as("rep"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("rep", "old"), "id")
        .where(col("rep") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    edges.unpersist()
    require(converged, s"clusters did not converge in $maxIter rounds " +
      "(graph diameter too large — use a star-contraction variant)")
    labels
  }
}
