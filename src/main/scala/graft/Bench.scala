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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local mode: broadcast/shuffle bytes never cross a network, so
      // compressing them only burns CPU on the small-action hot path
      // (task-binary gzip showed up in refresh-floor stack samples)
      .config("spark.broadcast.compress", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Warm re-run of every query whose cold (sweep-position) time crossed
    // 1 s: the cold sweep keeps producing 2×+ false regression signals
    // (q94 in r06, q22 in r07 — JVM/JIT/template-cache warmth, not plan
    // changes) that cost an isolation-probe session each round to refute.
    // `queries` stays the historical cold series; `queries_warm` is the
    // number to compare against isolated-probe values.
    val warmResults = results.collect { case (name, cold) if cold >= 1.0 =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qsWarm = warmResults.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Like-for-like cross-round comparison: the gated query set GROWS every
    // round (32 → 76), so the raw total is not comparable to BENCH_r01's.
    // total_core sums exactly the round-1 query set.
    val coreKeys = Set(
      "q01_ivm_select_all", "q02_ivm_project", "q03_ivm_filter",
      "q04_ivm_agg_groupby", "q05_ivm_agg_expr", "q06_ivm_global_agg",
      "q07_ivm_filter_agg", "q08_ivm_apply", "q09_ivm_join_delta", "q10_q13",
      "q11_ivm_minmax_apply", "q12_ivm_distinct_apply",
      "q14_ivm_q13_real_apply", "q15_ivm_count_distinct_apply",
      "q16_ivm_avg_apply", "q20_dedup_exact", "q21_dedup_jaccard",
      "q22_dedup_minhash", "q23_dedup_simhash", "q24_dedup_embedding",
      "q25_ann_topk", "q26_ann_bucketed", "q27_text_analyze",
      "q28_skew_salted_agg", "q29_events_hourly", "q30_events_sessionize",
      "q31_events_json", "q32_rollup", "q33_topk_orders", "q34_cube",
      "q50_multimodal_features", "q51_multimodal_frames")
    val totalCore = results.collect { case (k, v) if coreKeys(k) => v }.sum

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // steady-state measure: median of 5 runs — mean-of-3 swung headline
    // ratios by 2x across identical runs on GC/compaction outliers
    def med5(f: => Unit): Double =
      (1 to 5).map(_ => time(f)).sorted.apply(2)
    // Recomputes that WRITE store each rep under its own key (s1..s5) so
    // every rep measures the same write shape (a fresh materialization,
    // like the warm-ups) — re-putting one key would fold overwrite/segment-
    // delete and manifest-chain growth into reps 2–5.

    // IVM headline: incremental refresh vs full recompute of the same view
    // over the same delta batch (~1% of lineitem), state on the versioned
    // parquet store (the at-scale backend, write costs included). The
    // delta batch is MATERIALIZED once (a real batch arrives as data, not
    // as a predicate to re-scan the base with); both sides read it.
    // Steady-state cost = median of 5 refreshes after 4 warm-ups (the
    // first iterations pay plan compilation/codegen and the trace-record
    // batches, all of which a maintenance loop amortizes away); recompute
    // warmed and measured identically.
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
      (1 to 3).foreach(_ => refreshOnce()) // warm-ups (trace records+stabilizes)
      val tRecompute1 = time(recomputeOnce("w1"))
      (1 to 3).foreach(i => recomputeOnce(s"w${i + 1}"))
      // INTERLEAVED medians (see q13 block): measuring one side's whole
      // window after the other's lets environmental drift (GC, page cache)
      // bias the ratio — alternating pairs expose both sides to the same
      // drift. Observed: non-interleaved windows flipped the hicard ratio
      // 1.3× → 0.9× while isolated probes stayed at 1.3×.
      val vPairs = (1 to 5).map(i =>
        (time(refreshOnce()), time(recomputeOnce(s"s$i"))))
      val tRefresh = vPairs.map(_._1).sorted.apply(2)
      val tRecompute = vPairs.map(_._2).sorted.apply(2)

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
      (1 to 4).foreach(_ => hiRefresh()) // warm-ups
      (1 to 4).foreach(i => hiRecompute(s"w$i"))
      val hiPairs = (1 to 5).map(i =>
        (time(hiRefresh()), time(hiRecompute(s"s$i"))))
      val tHiRefresh = hiPairs.map(_._1).sorted.apply(2)
      val tHiRecompute = hiPairs.map(_._2).sorted.apply(2)

      // Poster Q13 (LEFT OUTER join + two-level aggregation) maintained
      // against the orders delta — the join-view refresh story, not just
      // single-table aggregates.
      val q13 = SparkEntry.q13RealView
      val oDeltaDir =
        java.nio.file.Files.createTempDirectory("ivm-bench-od").toString
      Fixtures.deltaOrders(spark, sfDir).write.mode("overwrite").parquet(oDeltaDir)
      val oDeltas: String => Option[DataFrame] = {
        case "orders" => Some(spark.read.parquet(oDeltaDir))
        case _        => None
      }
      // deltas arrive on orders only — declaring that skips the customer/
      // orders delta-accumulator work a multi-table feed would need
      Ivm.create("bench_q13", q13, Fixtures.base(spark, sfDir), store,
        deltaTables = Set("orders"))
      def q13Refresh() = Ivm.refreshState("bench_q13", q13,
        Fixtures.base(spark, sfDir), oDeltas, store)
      def q13Recompute(tag: String) = store.put(s"bench_q13full$tag",
        Ivm.recompute(q13, Fixtures.base(spark, sfDir), oDeltas))
      (1 to 4).foreach(_ => q13Refresh()) // warm-ups
      (1 to 4).foreach(i => q13Recompute(s"w$i"))
      // INTERLEAVED medians: this view sits at the refresh/recompute
      // crossover at sf0.1, so measuring one side's block after the
      // other's lets environmental drift (GC, page cache) bias the ratio
      // — alternating pairs expose both sides to the same drift
      val q13Pairs = (1 to 5).map(i =>
        (time(q13Refresh()), time(q13Recompute(s"s$i"))))
      val tQ13Refresh = q13Pairs.map(_._1).sorted.apply(2)
      val tQ13Recompute = q13Pairs.map(_._2).sorted.apply(2)
      // The FIXED per-batch floor of the q13 join view: refresh against a
      // 1-row delta. q13_refresh_sec ≈ floor + O(‖Δ‖) marginal work, so
      // floor/refresh close to 1 means the batch cost is Spark job latency,
      // not data volume — the number that explains why recompute can still
      // "win" at toy SFs while refresh is flat from sf0.001 to sf0.1
      // (scaling block) and recompute grows with the base.
      val oneRowDir =
        java.nio.file.Files.createTempDirectory("ivm-bench-o1").toString
      spark.read.parquet(oDeltaDir).limit(1).write
        .mode("overwrite").parquet(oneRowDir)
      val oneDelta: String => Option[DataFrame] = {
        case "orders" => Some(spark.read.parquet(oneRowDir))
        case _        => None
      }
      // floor on a FRESH store: by this point "bench_q13" has absorbed
      // ~14 batches of overlay segments, so measuring there conflates the
      // per-batch floor with chain-read amplification (observed 0.5 s vs
      // 1.0 s run-to-run swings). A fresh create isolates the floor.
      val floorStore = new ParquetStore(spark,
        java.nio.file.Files.createTempDirectory("ivm-bench-floor").toString)
      Ivm.create("bench_q13f", q13, Fixtures.base(spark, sfDir), floorStore,
        deltaTables = Set("orders"))
      def q13Floor() = Ivm.refreshState("bench_q13f", q13,
        Fixtures.base(spark, sfDir), oneDelta, floorStore)
      (1 to 4).foreach(_ => q13Floor()) // warm-ups
      val tQ13Floor = med5(q13Floor())

      // path-engagement proof: the floor work (templates, trace replay,
      // driver-inline exec) only counts if these advance during the run
      val inl = org.apache.spark.sql.GraftTemplates.inlineRuns.get()
      val tplHits = org.apache.spark.sql.GraftTemplates.hits
      val replays = graft.ivm.Ivm.traceReplays
      f"""{"create_sec":$tCreate%.3f,"refresh_first_sec":$tRefresh1%.3f,"refresh_sec":$tRefresh%.3f,"recompute_first_sec":$tRecompute1%.3f,"recompute_sec":$tRecompute%.3f,"speedup":${tRecompute / tRefresh}%.2f,"hicard_refresh_sec":$tHiRefresh%.3f,"hicard_recompute_sec":$tHiRecompute%.3f,"speedup_hicard":${tHiRecompute / tHiRefresh}%.2f,"q13_refresh_sec":$tQ13Refresh%.3f,"q13_recompute_sec":$tQ13Recompute%.3f,"speedup_q13":${tQ13Recompute / tQ13Refresh}%.2f,"q13_floor_sec":$tQ13Floor%.3f,"inline_runs":$inl,"template_hits":$tplHits,"trace_replays":$replays}"""
    } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }

    // Scaling evidence for the Q13 join-view floor claim: refresh cost is
    // O(‖Δ‖ + fixed floor) while recompute is O(base), so across a 10×
    // base-size change (sf0.01 → sf0.1; the delta predicate keeps ‖Δ‖ a
    // constant fraction) refresh time should stay near-flat and recompute
    // should grow — the measured basis of the "crossover near sf0.2"
    // extrapolation in README known limits.
    val scalingJson = try {
      import graft.ivm._
      // synthetic 10× point (key-offset replicas of sfDir, measurement
      // only): the decade ABOVE the driver's sf — makes "refresh flat,
      // recompute grows" a measured trend over 3 decades, not 2
      val tenX =
        try Seq(Fixtures.ensureScaled10x(spark, sfDir))
        catch { case _: Throwable => Seq.empty[String] }
      val pts = (Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", sfDir).distinct
        .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))) ++ tenX)
        .map { d =>
          val store = new ParquetStore(spark,
            java.nio.file.Files.createTempDirectory("ivm-scale").toString)
          val dd = java.nio.file.Files.createTempDirectory("ivm-scale-d").toString
          Fixtures.deltaOrders(spark, d).write.mode("overwrite").parquet(dd)
          val deltas: String => Option[DataFrame] = {
            case "orders" => Some(spark.read.parquet(dd))
            case _        => None
          }
          val q13 = SparkEntry.q13RealView
          Ivm.create("scale_q13", q13, Fixtures.base(spark, d), store,
            deltaTables = Set("orders"))
          def refresh() = Ivm.refreshState("scale_q13", q13,
            Fixtures.base(spark, d), deltas, store)
          def recompute(tag: String) = store.put(s"scale_full$tag",
            Ivm.recompute(q13, Fixtures.base(spark, d), deltas))
          (1 to 3).foreach(_ => refresh()) // warm-ups
          val tR = (1 to 2).map(_ => time(refresh())).sum / 2
          (1 to 3).foreach(i => recompute(s"w$i"))
          val tC = (1 to 2).map(i => time(recompute(s"s$i"))).sum / 2
          // Extremum-view scaling — evidence for the DELTA-BOUND aux
          // refresh: pair counts adjust from the batch alone and the
          // multiset rescan fires only on extremum death, so refresh
          // should stay near-flat across a 100× base growth while
          // recompute re-scans the base. Lineitem delta (a constant
          // fraction), MIN_BY+MAX_BY sharing one aux multiset.
          import org.apache.spark.sql.functions.col
          val ld = java.nio.file.Files.createTempDirectory("ivm-scale-ld").toString
          Fixtures.deltaLineitem(spark, d).write.mode("overwrite").parquet(ld)
          val lDeltas: String => Option[DataFrame] = {
            case "lineitem" => Some(spark.read.parquet(ld))
            case _          => None
          }
          val mmView = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
            Seq(AggSpec.MinBy(col("l_quantity"), col("l_orderkey"), "cheapest"),
              AggSpec.MaxBy(col("l_quantity"), col("l_orderkey"), "biggest"),
              AggSpec.CountStar("cnt")))
          Ivm.create("scale_mm", mmView, Fixtures.base(spark, d), store,
            deltaTables = Set("lineitem"))
          def mmRefresh() = Ivm.refreshState("scale_mm", mmView,
            Fixtures.base(spark, d), lDeltas, store)
          def mmRecompute(tag: String) = store.put(s"scale_mmfull$tag",
            Ivm.recompute(mmView, Fixtures.base(spark, d), lDeltas))
          (1 to 3).foreach(_ => mmRefresh()) // warm-ups
          val tMmR = (1 to 2).map(_ => time(mmRefresh())).sum / 2
          (1 to 3).foreach(i => mmRecompute(s"w$i"))
          val tMmC = (1 to 2).map(i => time(mmRecompute(s"s$i"))).sum / 2
          val sf = if (d.contains("bench-10x")) "10x_synth" else d.split("/").last
          f""""$sf":{"q13_refresh_sec":$tR%.3f,"q13_recompute_sec":$tC%.3f,"minmax_refresh_sec":$tMmR%.3f,"minmax_recompute_sec":$tMmC%.3f}"""
        }
      pts.mkString("{", ",", "}")
    } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }

    // LSM state store: steady-state refresh of a WIDE high-cardinality
    // view (~600k (orderkey, linenumber) groups at sf0.1) on a
    // FORCED-bucketed store — overlay appends (maxChain=8) vs
    // compact-every-merge (maxChain=1, the pre-LSM selective rewrite).
    // write_bytes_per_refresh is the at-scale signal: overlay commits are
    // O(delta) bytes while compaction rewrites the touched buckets, and at
    // 100 TB state the write volume IS the refresh cost. Wall-clock at
    // sf0.1 is job-scheduling-bound (states are MBs), so bytes are
    // reported alongside seconds.
    val lsmJson = try {
      import graft.ivm._
      import graft.ivm.AggSpec._
      import org.apache.spark.sql.functions._
      val dDir = java.nio.file.Files.createTempDirectory("ivm-lsm-d").toString
      Fixtures.deltaLineitem(spark, sfDir).write.mode("overwrite").parquet(dDir)
      val deltas: String => Option[DataFrame] = {
        case "lineitem" => Some(spark.read.parquet(dDir))
        case _          => None
      }
      val wideView = Aggregate(Scan("lineitem"),
        Seq("l_orderkey", "l_linenumber"),
        Seq(Sum(col("l_quantity"), "sum_qty"),
          Sum(col("l_extendedprice").cast("decimal(18,2)"), "sum_price"),
          Sum(col("l_discount").cast("decimal(18,2)"), "sum_disc"),
          CountStar("cnt")))
      def sz(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(sz).sum).getOrElse(0L)
        else f.length
      /** All segment dirs under `root` with their byte sizes. */
      def segSizes(root: String): Map[String, Long] = {
        val out = scala.collection.mutable.Map.empty[String, Long]
        def walk(f: java.io.File): Unit =
          if (f.isDirectory) {
            if (f.getName.startsWith("seg") && f.getName.drop(3).forall(_.isDigit))
              out(f.getPath) = sz(f)
            else Option(f.listFiles).foreach(_.foreach(walk))
          }
        walk(new java.io.File(root))
        out.toMap
      }
      def mk(chain: Int): (() => Unit, String) = {
        val root = java.nio.file.Files.createTempDirectory(s"ivm-lsm$chain").toString
        val st = new ParquetStore(spark, root,
          buckets = 32, smallStateBytes = 0, maxChain = chain,
          keepVersions = 1)
        Ivm.create(s"lsm$chain", wideView, Fixtures.base(spark, sfDir), st)
        (() => Ivm.refreshState(s"lsm$chain", wideView,
          Fixtures.base(spark, sfDir), deltas, st), root)
      }
      val (overlayOnce, rootO) = mk(8)
      val (compactOnce, rootC) = mk(1)
      // warm-ups, alternating — both sides' file listings and codegen warm
      // under the same cache pressure
      overlayOnce(); compactOnce(); overlayOnce(); compactOnce()
      // bytes one refresh writes = size of the segment dirs it creates
      // (old segments may be pruned concurrently; new ones survive).
      // MEASURED HERE, at an APPEND position in the chain: the byte
      // claim is about the steady overlay commit — at refresh number
      // maxChain the touched chains compact (a deliberate, amortized
      // bucket rewrite), and a byte probe landing on that refresh
      // would read 1× instead of the ~33× append-vs-rewrite gap.
      def wroteBytes(root: String)(f: => Unit): Long = {
        val before = segSizes(root).keySet
        f
        segSizes(root).collect { case (p, b) if !before(p) => b }.sum
      }
      val bOverlay = wroteBytes(rootO)(overlayOnce())
      val bCompact = wroteBytes(rootC)(compactOnce())
      // INTERLEAVED medians of 5 (same rationale as the q13/hicard
      // blocks): measuring overlay's whole window before compact's let
      // environmental drift (page cache, GC, JVM state accumulated by
      // the 130-query sweep) land entirely on one side — the r06 driver
      // artifact showed 0.19 for a ratio that probes at ~0.9 in
      // isolation. Alternating pairs expose both sides to the same
      // drift; the median also absorbs the one minor-compaction fold
      // the overlay window contains — honest: steady state includes
      // periodic compaction.
      val lsmPairs = (1 to 5).map(_ => (time(overlayOnce()), time(compactOnce())))
      val tOverlay = lsmPairs.map(_._1).sorted.apply(2)
      val tCompact = lsmPairs.map(_._2).sorted.apply(2)
      f"""{"overlay_refresh_sec":$tOverlay%.3f,"compact_refresh_sec":$tCompact%.3f,"overlay_speedup":${tCompact / tOverlay}%.2f,"overlay_write_bytes":$bOverlay,"compact_write_bytes":$bCompact,"write_reduction":${bCompact.toDouble / math.max(bOverlay, 1)}%.1f}"""
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
      def recallAt(nprobe: Int): (Double, Double) = {
        val t0 = System.nanoTime()
        val ivf = pairs(ops.Ivf.topK(emb, queries, k = 5, model, nprobe))
        val t = (System.nanoTime() - t0) / 1e9
        val recalls = bf.map { case (q, truth) =>
          ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
        }
        (recalls.sum / recalls.size, t)
      }
      // the accuracy/cost trade-off curve a deployment tunes: recall@5 and
      // query latency per probe budget, nprobe=16 being exact by design
      val curve = Seq(1, 2, 4, 8, 16).map { np =>
        val (r, t) = recallAt(np)
        f"""{"nprobe":$np,"recall_at5":$r%.3f,"query_sec":$t%.3f}"""
      }
      val (recall4, tIvf) = recallAt(4)
      // PQ: 8-byte codes, ADC scan + exact re-rank of the shortlist —
      // the memory-side trade-off beside IVF's probe budget. Default
      // rerank (50) with an asserted quality floor: a PQ point below
      // 0.9 recall@5 is not a usable ANN default.
      val pqModel = ops.Pq.train(emb, m = 8, k = 64, iters = 3)
      val pqCodes = ops.Pq.encode(emb, pqModel).cache()
      pqCodes.count()
      val tPq0 = System.nanoTime()
      val pq = pairs(ops.Pq.topKRerank(pqCodes, emb, queries, k = 5, pqModel))
      val tPq = (System.nanoTime() - tPq0) / 1e9
      val pqRecall = bf.map { case (q, truth) =>
        pq.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / bf.size
      pqCodes.unpersist()
      val pqOk = pqRecall >= 0.9
      f"""{"recall_at5_nprobe4of16":$recall4%.3f,"ivf_query_sec":$tIvf%.3f,"pq_rerank_recall_at5":$pqRecall%.3f,"pq_recall_ok":$pqOk,"pq_query_sec":$tPq%.3f,"curve":${curve.mkString("[", ",", "]")}}"""
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

    // View cascade: hourly rollup → per-type summary maintained from the
    // hourly view's OWN output changelog, vs recomputing and
    // materializing BOTH levels flat each cycle (the non-incremental
    // alternative a pipeline without composition pays).
    val cascadeJson = try {
      import graft.ivm._
      import graft.ivm.AggSpec._
      import org.apache.spark.sql.functions._
      val store = new ParquetStore(spark,
        java.nio.file.Files.createTempDirectory("ivm-casc").toString)
      val dDir = java.nio.file.Files.createTempDirectory("ivm-casc-d").toString
      Fixtures.deltaEvents(spark, sfDir).write.mode("overwrite").parquet(dDir)
      val deltas: String => Option[DataFrame] = {
        case "events" => Some(spark.read.parquet(dDir))
        case _        => None
      }
      // Daily granularity: enough delta rows per touched (type, day) group
      // that the post-aggregation changelog (≤ 2 rows per touched group)
      // actually compresses the base delta — the fan-out-saver shape.
      val up = Aggregate(
        Project(Scan("events"), Seq(col("event_type"),
          org.apache.spark.sql.functions.expr("ts DIV 86400000000000").as("day"))),
        Seq("event_type", "day"), Seq(CountStar("hits")))
      val down = Aggregate(Scan("casc_up"), Seq("event_type"),
        Seq(Sum(col("hits"), "total"), Max(col("hits"), "peak"),
          CountStar("days")))
      val c = new Cascade(Seq("casc_up" -> up, "casc_down" -> down),
        Fixtures.base(spark, sfDir), store)
      val tCreate = time(c.create())
      def refreshOnce() = c.refresh(deltas)
      def recomputeOnce(tag: String): Unit = {
        store.put(s"casc_upfull$tag",
          Ivm.recompute(up, Fixtures.base(spark, sfDir), deltas))
        store.put(s"casc_downfull$tag",
          Eval.eval(down, { case "casc_up" => store(s"casc_upfull$tag") }))
      }
      val dRows = spark.read.parquet(dDir).count()
      val upRows = refreshOnce().getOrElse("casc_up", 0L) // warm-up 1
      (1 to 3).foreach(_ => refreshOnce()) // more warm-ups (trace stabilizes)
      (1 to 4).foreach(i => recomputeOnce(s"w$i"))
      // interleaved medians (see q13 block): this ratio sits near 1
      val cPairs = (1 to 5).map(i =>
        (time(refreshOnce()), time(recomputeOnce(s"s$i"))))
      val tR = cPairs.map(_._1).sorted.apply(2)
      val tC = cPairs.map(_._2).sorted.apply(2)
      // delta_rows vs up_changelog_rows is the composability signal: the
      // downstream level processes the POST-AGGREGATION changelog, not the
      // base delta. Wall speedup at toy SF is floor-bound (two per-batch
      // view floors vs a tiny flat recompute) — the scaling block's
      // flat-refresh-vs-growing-recompute argument applies per level.
      f"""{"create_sec":$tCreate%.3f,"chain_refresh_sec":$tR%.3f,"flat_recompute_sec":$tC%.3f,"speedup":${tC / tR}%.2f,"delta_rows":$dRows,"up_changelog_rows":$upRows}"""
    } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }

    // Maintained dedup: steady-state cascade refresh (per-batch signature
    // hash of the delta only + band joins against maintained state) vs the
    // per-release full-pipeline recompute the batch path runs today — the
    // LLM-pipeline op where incrementality changes the deployment model.
    val dedupJson = try {
      import graft.ivm._
      import org.apache.spark.sql.functions._
      val store = new ParquetStore(spark,
        java.nio.file.Files.createTempDirectory("ivm-dedup").toString)
      val dDir = java.nio.file.Files.createTempDirectory("ivm-dedup-d").toString
      Fixtures.deltaDocuments(spark, sfDir).write.mode("overwrite").parquet(dDir)
      val deltas: String => Option[DataFrame] = {
        case "documents" => Some(spark.read.parquet(dDir))
        case _           => None
      }
      val c = new Cascade(
        Seq("sig123" -> SparkEntry.dedupSigView(spark),
          "pairs123" -> SparkEntry.dedupPairsView),
        Fixtures.base(spark, sfDir), store)
      val tCreate = time(c.create())
      def refreshOnce() = c.refresh(deltas)
      // fair recompute: apply the delta, then run the full batch pipeline
      // (exactly what a per-release dedup job does) and materialize it
      val applied = Fixtures.tbl(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")).withColumn("w", lit(1))
        .unionByName(spark.read.parquet(dDir).select(col("doc_id"), col("text"),
          when(col(IvmCore.MULT), 1).otherwise(-1).as("w")))
        .groupBy("doc_id", "text").agg(sum("w").as("w")).where(col("w") > 0)
        .select("doc_id", "text")
      def recomputeOnce(tag: String) = store.put(s"dedup_full$tag",
        ops.Dedup.minhashLshPairs(applied, k = 8, bands = 4))
      val sigRows = refreshOnce().getOrElse("sig123", 0L) // warm-up 1
      (1 to 3).foreach(_ => refreshOnce())
      (1 to 4).foreach(i => recomputeOnce(s"w$i"))
      // interleaved medians (see q13 block): this ratio sits near 1
      val dPairs = (1 to 5).map(i =>
        (time(refreshOnce()), time(recomputeOnce(s"s$i"))))
      val tR = dPairs.map(_._1).sorted.apply(2)
      val tC = dPairs.map(_._2).sorted.apply(2)
      val dRows = spark.read.parquet(dDir).count()
      f"""{"create_sec":$tCreate%.3f,"refresh_sec":$tR%.3f,"full_pipeline_sec":$tC%.3f,"speedup":${tC / tR}%.2f,"delta_rows":$dRows,"sig_changelog_rows":$sigRows}"""
    } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }

    val json = s"""{"metric":"total","value":$total,"unit":"sec","total_core_r1_queryset":$totalCore,"n_queries":${results.size},"queries":$qs,"queries_warm":$qsWarm,"ivm":$ivmJson,"scaling":$scalingJson,"lsm":$lsmJson,"ann":$annJson,"streaming":$streamJson,"cascade":$cascadeJson,"dedup":$dedupJson,"sf":"$sfDir"}"""
    println(json)
    // stdout tail-capture truncated the round-3 headline — always also
    // write the JSON to a file the driver (and humans) can read whole.
    java.nio.file.Files.write(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
