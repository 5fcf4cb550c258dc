package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE right-size cached plans too: a cached 6-row frame must not
      // pin 32 shuffle partitions onto every downstream stage
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // IVM headline: incremental refresh vs full recompute of the same view
    // over the same delta batch (~1% of lineitem), state on the versioned
    // parquet store (the at-scale backend, write costs included). The
    // delta batch is MATERIALIZED once (a real batch arrives as data, not
    // as a predicate to re-scan the base with); both sides read it.
    // Steady-state cost = mean of 3 refreshes after 2 warm-ups (the first
    // iterations pay plan compilation/codegen, which a maintenance loop
    // amortizes away); recompute measured identically.
    val ivmJson = try {
      import graft.ivm._
      import graft.ivm.AggSpec._
      import org.apache.spark.sql.functions._
      val store = new ParquetStore(spark,
        java.nio.file.Files.createTempDirectory("ivm-bench").toString)
      val deltaDir =
        java.nio.file.Files.createTempDirectory("ivm-bench-delta").toString
      Fixtures.deltaLineitem(spark, sfDir).write.mode("overwrite").parquet(deltaDir)
      val deltas: String => Option[DataFrame] = {
        case "lineitem" => Some(spark.read.parquet(deltaDir))
        case _          => None
      }
      val view = Aggregate(Scan("lineitem"), Seq("l_returnflag", "l_linestatus"),
        Seq(Sum(col("l_extendedprice").cast("decimal(18,2)"), "sum_price"),
          Sum(col("l_quantity"), "sum_qty"), CountStar("cnt")))
      val tCreate = time(Ivm.create("bench_v", view,
        Fixtures.base(spark, sfDir), store))
      def refreshOnce() = Ivm.refreshState("bench_v", view,
        Fixtures.base(spark, sfDir), deltas, store)
      // Fair comparison: a non-incremental pipeline must also MATERIALIZE
      // the recomputed view each cycle, so the write is part of its cost.
      def recomputeOnce(tag: String) = store.put(s"bench_full$tag",
        Ivm.recompute(view, Fixtures.base(spark, sfDir), deltas))
      val tRefresh1 = time(refreshOnce())
      time(refreshOnce()) // second warm-up
      val tRefresh = (1 to 3).map(_ => time(refreshOnce())).sum / 3
      val tRecompute1 = time(recomputeOnce("w1"))
      time(recomputeOnce("w2"))
      val tRecompute = (1 to 3).map(i => time(recomputeOnce(s"s$i"))).sum / 3

      // High-cardinality view (~150k groups at sf0.1): the shape where
      // maintained state actually pays — recompute reshuffles every group,
      // refresh touches only the delta's groups.
      val hiView = Aggregate(Scan("lineitem"), Seq("l_orderkey"),
        Seq(Sum(col("l_quantity"), "sum_qty"), CountStar("cnt")))
      Ivm.create("bench_hi", hiView, Fixtures.base(spark, sfDir), store)
      def hiRefresh() = Ivm.refreshState("bench_hi", hiView,
        Fixtures.base(spark, sfDir), deltas, store)
      def hiRecompute(tag: String) = store.put(s"bench_hifull$tag",
        Ivm.recompute(hiView, Fixtures.base(spark, sfDir), deltas))
      hiRefresh(); hiRefresh() // warm-ups
      val tHiRefresh = (1 to 3).map(_ => time(hiRefresh())).sum / 3
      hiRecompute("w1"); hiRecompute("w2")
      val tHiRecompute = (1 to 3).map(i => time(hiRecompute(s"s$i"))).sum / 3

      f"""{"create_sec":$tCreate%.3f,"refresh_first_sec":$tRefresh1%.3f,"refresh_sec":$tRefresh%.3f,"recompute_first_sec":$tRecompute1%.3f,"recompute_sec":$tRecompute%.3f,"speedup":${tRecompute / tRefresh}%.2f,"hicard_refresh_sec":$tHiRefresh%.3f,"hicard_recompute_sec":$tHiRecompute%.3f,"speedup_hicard":${tHiRecompute / tHiRefresh}%.2f}"""
    } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }

    // ANN accuracy/cost: IVF recall@5 against the brute-force baseline at
    // a partial probe budget (the trade-off a 100 TB deployment tunes).
    val annJson = try {
      import org.apache.spark.sql.functions.col
      val emb = Fixtures.tbl(spark, sfDir, "embeddings")
      val queries = emb.where(col("vec_id") < 8)
      val model = ops.Ivf.train(emb, k = 16, iters = 3)
      def pairs(df: DataFrame) = df
        .select(col("q_id").cast("long"), col("n_id").cast("long")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val bf = pairs(ops.Similarity.bruteForceTopK(emb, queries, k = 5))
      val t0 = System.nanoTime()
      val ivf = pairs(ops.Ivf.topK(emb, queries, k = 5, model, nprobe = 4))
      val tIvf = (System.nanoTime() - t0) / 1e9
      val recalls = bf.map { case (q, truth) =>
        ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      val recall = recalls.sum / recalls.size
      f"""{"recall_at5_nprobe4of16":$recall%.3f,"ivf_query_sec":$tIvf%.3f}"""
    } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }

    // Streaming: continuous maintenance of the same view shape through
    // Structured Streaming (file source, one file per micro-batch) with
    // durable ParquetStore state — the engine's north-star deployment mode.
    val streamJson = try {
      import graft.ivm._
      import graft.ivm.AggSpec._
      import org.apache.spark.sql.functions._
      val store = new ParquetStore(spark,
        java.nio.file.Files.createTempDirectory("ivm-sbench").toString)
      val view = Aggregate(Scan("lineitem"), Seq("l_returnflag", "l_linestatus"),
        Seq(Sum(col("l_quantity"), "sum_qty"), CountStar("cnt")))
      Ivm.create("stream_v", view, Fixtures.base(spark, sfDir), store)
      val streamDir =
        java.nio.file.Files.createTempDirectory("ivm-sbench-in").toString
      val nBatches = 4
      val d = Fixtures.deltaLineitem(spark, sfDir).cache()
      (0 until nBatches).foreach { i =>
        d.where(col("l_partkey") % nBatches === i).coalesce(1)
          .write.mode("append").parquet(streamDir)
      }
      val schema = d.schema
      d.unpersist()
      val t0 = System.nanoTime()
      val sq = streaming.IvmStream.maintain(
        "stream_v", view, "lineitem", Fixtures.base(spark, sfDir), store,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir),
        java.nio.file.Files.createTempDirectory("ivm-sbench-ck").toString)
      sq.processAllAvailable()
      sq.stop()
      val total = (System.nanoTime() - t0) / 1e9
      f"""{"batches":$nBatches,"total_sec":$total%.3f,"per_batch_sec":${total / nBatches}%.3f}"""
    } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ivm":$ivmJson,"ann":$annJson,"streaming":$streamJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
