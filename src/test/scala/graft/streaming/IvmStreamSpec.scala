package graft.streaming

import graft.SparkTestBase
import graft.ivm._
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming maintenance: micro-batches of delta rows fold into the
  * materialized view; final state must equal a recompute over all deltas. */
case class D(g: String, v: Int, _duckdb_ivm_multiplicity: Boolean)
case class DL2(g: String, lv: Int, _duckdb_ivm_multiplicity: Boolean)
case class DR2(g: String, rv: Int, _duckdb_ivm_multiplicity: Boolean)

class IvmStreamSpec extends AnyFunSuite with SparkTestBase {

  test("maintain: foreachBatch refresh equals recompute after 3 batches") {
    val s = spark
    import s.implicits._

    val baseRows = Seq(("a", 1), ("a", 2), ("b", 10)).toDF("g", "v")
    val base: String => DataFrame = { case "t" => baseRows }
    val q = Aggregate(Scan("t"), Seq("g"),
      Seq(Sum(col("v"), "sum_v"), CountStar("cnt")))

    val store = new MemStore
    Ivm.create("sv", q, base, store)

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val query = IvmStream.maintain("sv", q, "t", base, store,
      mem.toDF(), Files.createTempDirectory("ivm-ckpt").toString)

    val batches = Seq(
      Seq(D("a", 5, true), D("c", 7, true)),          // insert existing+new group
      Seq(D("a", 1, false), D("b", 10, false)),       // delete rows (b dies)
      Seq(D("c", 7, false), D("c", 3, true)))         // update modeled as del+ins
    batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val got = Ivm.read("sv", q, store)
    // recompute over base ⊎ all deltas
    val allDeltas = batches.flatten.toDS().toDF()
      .withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT)
    val want = Ivm.recompute(q, base, t => if (t == "t") Some(allDeltas) else None)
    assertSameRows(got, want)
    // group b must be gone (count reached 0), group c must exist with v=3
    val m = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!m.contains("b") && m("c") == 3L)
  }

  test("maintain: HLL approx-distinct view streams insert-only batches") {
    val s = spark
    import s.implicits._

    val baseRows = Seq(("a", 1), ("a", 1), ("b", 10)).toDF("g", "v")
    val base: String => DataFrame = { case "t" => baseRows }
    val q = Aggregate(Scan("t"), Seq("g"),
      Seq(AggSpec.ApproxCountDistinct(col("v"), 12, "au"), CountStar("cnt")))

    val store = new MemStore
    Ivm.create("hllv", q, base, store)

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val query = IvmStream.maintain("hllv", q, "t", base, store,
      mem.toDF(), Files.createTempDirectory("ivm-ckpt").toString)
    // append-only stream: each batch unions into the per-group registers
    val batches = Seq(
      Seq(D("a", 2, true), D("c", 7, true)),
      Seq(D("a", 1, true), D("c", 8, true))) // a's 1 is a dup: au stays 2
    batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val got = Ivm.read("hllv", q, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2L, 4L), ("b", 1L, 1L), ("c", 2L, 2L)), got)
  }

  test("maintain: variance + min_by view streams on the LSM parquet store") {
    val s = spark
    import s.implicits._

    val baseRows = Seq(("a", 1), ("a", 4), ("a", 9), ("b", 7)).toDF("g", "v")
    val base: String => DataFrame = { case "t" => baseRows }
    val q = Aggregate(Scan("t"), Seq("g"),
      Seq(VarSamp(col("v"), "vv"), MinBy(col("v"), col("v") * 10, "am"),
        CountStar("cnt")))

    val store = new ParquetStore(s,
      Files.createTempDirectory("ivm-vstream").toString,
      buckets = 4, smallStateBytes = 0, maxChain = 2)
    Ivm.create("vv", q, base, store)

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val query = IvmStream.maintain("vv", q, "t", base, store,
      mem.toDF(), Files.createTempDirectory("ivm-vckpt").toString)

    val batches = Seq(
      Seq(D("a", 9, false), D("b", 7, true)),   // retract a's outlier
      Seq(D("b", 7, false), D("b", 7, false)))  // b dies entirely
    batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val got = Ivm.read("vv", q, store)
    val allDeltas = batches.flatten.toDS().toDF()
      .withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT)
    val want = Ivm.recompute(q, base, t => if (t == "t") Some(allDeltas) else None)
    assertSameRows(got, want)
    val a = got.where(col("g") === "a").collect()(0)
    assert(math.abs(a.getDouble(1) - 4.5) < 1e-12) // var_samp{1,4} = 4.5
    assert(a.getInt(2) == 10)                      // min_by arg = 1*10
  }

  test("maintain: a COMPOSED view (semi join) streams on the LSM parquet store") {
    val s = spark
    import s.implicits._

    val t = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("g", "v")
    val u = Seq(("a", 10), ("a", 11), ("b", 20)).toDF("g", "h")
    val base: String => DataFrame = { case "t" => t; case "u" => u }
    // rows of t whose key is supported by u — streaming deltas arrive on u
    val q = IvmQuery.semiJoin(Scan("t"),
      Project(Scan("u"), Seq(col("g"))), Seq("g"))

    val store = new ParquetStore(s,
      Files.createTempDirectory("ivm-sstream").toString,
      buckets = 4, smallStateBytes = 0, maxChain = 3)
    Ivm.create("ssv", q, base, store)

    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val query = IvmStream.maintain("ssv", q, "u", base, store,
      mem.toDF().withColumnRenamed("v", "h"),
      Files.createTempDirectory("ivm-sckpt").toString)

    val batches = Seq(
      Seq(D("c", 30, true)),                    // c enters the semi set
      Seq(D("a", 10, false), D("a", 11, false)), // a loses ALL support → leaves
      Seq(D("a", 12, true)))                    // a re-enters
    batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
    query.stop()

    val got = Ivm.read("ssv", q, store).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("a", 1), ("b", 2), ("c", 3)))
  }

  test("maintain: TWO streams (one per base table) maintain one join view") {
    val s = spark
    import s.implicits._

    val l = Seq(("a", 1), ("b", 2)).toDF("g", "lv")
    val r = Seq(("a", 10), ("b", 20), ("b", 21)).toDF("g", "rv")
    val base: String => DataFrame = { case "l" => l; case "r" => r }
    val q = Aggregate(Join(Scan("l"), Scan("r"), Seq("g")), Seq("g"),
      Seq(Sum(col("lv") + col("rv"), "sum_lr"), CountStar("cnt")))

    // the transactional parquet store serializes the two queries' commits;
    // per-(view, table) batch markers keep their replay dedupe independent
    val store = new ParquetStore(s,
      Files.createTempDirectory("ivm-2stream").toString,
      buckets = 4, smallStateBytes = 0, maxChain = 2)
    Ivm.create("jv2", q, base, store)

    implicit val sqlCtx = s.sqlContext
    val memL = MemoryStream[DL2]
    val memR = MemoryStream[DR2]
    val qs = IvmStream.maintainMulti("jv2", q, base, store,
      Map("l" -> memL.toDF(), "r" -> memR.toDF()),
      Files.createTempDirectory("ivm-2ckpt").toString)
    val qL = qs("l"); val qR = qs("r")

    val lBatches = Seq(
      Seq(DL2("c", 3, true)),                      // no r match yet
      Seq(DL2("a", 1, false)))                     // group a dies (l side empty)
    val rBatches = Seq(
      Seq(DR2("c", 30, true), DR2("b", 20, false)), // c matches batch-1's l row
      Seq(DR2("c", 31, true)))                      // second c match
    // both streams live at once; cross-batch join correctness needs each
    // stream's later batches to see the other's applied deltas (acc states)
    memL.addData(lBatches(0): _*); memR.addData(rBatches(0): _*)
    qL.processAllAvailable(); qR.processAllAvailable()
    memL.addData(lBatches(1): _*); memR.addData(rBatches(1): _*)
    qR.processAllAvailable(); qL.processAllAvailable()
    qL.stop(); qR.stop()

    val got = Ivm.read("jv2", q, store)
    val dl = lBatches.flatten.toDS().toDF()
      .withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT)
    val dr = rBatches.flatten.toDS().toDF()
      .withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT)
    val want = Ivm.recompute(q, base, {
      case "l" => Some(dl); case "r" => Some(dr); case _ => None
    })
    assertSameRows(got, want)
    // c must reflect the cross-batch join: l(c,3) ⋈ r{(c,30),(c,31)}
    val m = got.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(m("c") == (3 + 30) + (3 + 31) && !m.contains("a"))
  }

  test("statefulAgg: update-mode changelog maintains weighted sums") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val agg = IvmStream.statefulAgg(
      mem.toDF().withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT),
      Seq("g"), Seq(Sum(col("v"), "sum_v"), CountStar("cnt")))
    val query = agg.writeStream.format("memory")
      .queryName("sv_stream").outputMode("update").start()

    mem.addData(D("a", 5, true), D("a", 3, true), D("b", 4, true))
    query.processAllAvailable()
    mem.addData(D("a", 3, false)) // retraction
    query.processAllAvailable()
    query.stop()

    // last emitted update per key = current state
    val updates = s.table("sv_stream").collect()
    val last = updates.zipWithIndex.groupBy(_._1.getString(0))
      .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
    assert(last("a").getLong(1) == 5L && last("a").getLong(2) == 1L)
    assert(last("b").getLong(1) == 4L && last("b").getLong(2) == 1L)
  }

  test("statefulAgg: variance maintains through retraction (moment state)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val agg = IvmStream.statefulAgg(
      mem.toDF().withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT),
      Seq("g"), Seq(VarSamp(col("v"), "vv"), CountStar("cnt")))
    val query = agg.writeStream.format("memory")
      .queryName("var_stream").outputMode("update").start()

    mem.addData(D("a", 2, true), D("a", 4, true), D("a", 9, true))
    query.processAllAvailable()
    mem.addData(D("a", 9, false)) // retract the outlier
    query.processAllAvailable()
    query.stop()

    val updates = s.table("var_stream").collect()
    val last = updates.zipWithIndex.groupBy(_._1.getString(0))
      .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
    // after retraction the group is {2, 4}: var_samp = 2.0
    assert(math.abs(last("a").getDouble(1) - 2.0) < 1e-12)
    assert(last("a").getLong(2) == 2L)
  }

  test("statefulAgg: insert-only sketches (HLL + KLL) keep state in the agg buffer") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val agg = IvmStream.statefulAgg(
      mem.toDF().withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT),
      Seq("g"), Seq(
        ApproxCountDistinct(col("v"), 12, "au"),
        ApproxPercentile(col("v"), 0.5, 200, "p50"),
        ApproxTopK(col("v"), 2, 256, "hh"),
        CountStar("cnt")))
    val query = agg.writeStream.format("memory")
      .queryName("sk_stream").outputMode("update").start()

    mem.addData(D("a", 1, true), D("a", 2, true), D("a", 3, true))
    query.processAllAvailable()
    mem.addData(D("a", 1, true), D("a", 4, true), D("a", 5, true)) // 1 is a dup
    query.processAllAvailable()
    query.stop()

    val updates = s.table("sk_stream").collect()
    val last = updates.zipWithIndex.groupBy(_._1.getString(0))
      .map { case (k, rows) => k -> rows.maxBy(_._2)._1 }
    // registers persisted across batches: au = |{1,2,3,4,5}|; p50 exact at
    // this size (KLL below k retained items) — multiset {1,1,2,3,4,5},
    // smallest value with inclusive rank ≥ 0.5 is 2; top-2 heavy hitters
    // exact below maxMapSize: 1 (count 2) then the item-asc tiebreak;
    // cnt counts dupes too
    assert(last("a").getLong(1) == 5L)
    assert(last("a").getDouble(2) == 2.0)
    assert(last("a").getSeq[String](3) == Seq("1", "2"))
    assert(last("a").getLong(4) == 6L)

    // a retraction row fails the query loudly — registers cannot un-see
    val mem2 = MemoryStream[D]
    val agg2 = IvmStream.statefulAgg(
      mem2.toDF().withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT),
      Seq("g"), Seq(ApproxCountDistinct(col("v"), 12, "au"), CountStar("cnt")))
    val query2 = agg2.writeStream.format("memory")
      .queryName("sk_stream_del").outputMode("update").start()
    mem2.addData(D("a", 1, false))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      query2.processAllAvailable()
    }
    assert(e.getMessage.contains("insert-only"), e.getMessage)
    query2.stop()
  }

  test("statefulMinMax: deleting the current extremum falls back to runner-up") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[D]
    val updates = IvmStream.statefulMinMax(
      mem.toDF().withColumn("v", col("v").cast("double"))
        .withColumnRenamed("_duckdb_ivm_multiplicity", IvmCore.MULT),
      keyCol = "g", valCol = "v")
    val query = updates.toDF().writeStream.format("memory")
      .queryName("mm_stream").outputMode("update").start()

    mem.addData(D("a", 5, true), D("a", 9, true), D("a", 2, true))
    query.processAllAvailable()
    mem.addData(D("a", 2, false)) // delete current MIN
    query.processAllAvailable()
    mem.addData(D("a", 9, false), D("a", 5, false)) // group dies
    query.processAllAvailable()
    query.stop()

    val rows = s.table("mm_stream").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)), r.getLong(3)))
    assert(rows(0) == ("a", Some(2.0), Some(9.0), 3L))
    assert(rows(1) == ("a", Some(5.0), Some(9.0), 2L)) // min fell back to 5
    assert(rows(2) == ("a", None, None, 0L))           // death emitted
  }

  test("windowedAgg: watermarked tumbling window over event stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = IvmStream.windowedAgg(df, "ts", "10 minutes", "1 hour",
      Seq("event_type"),
      Seq(count(lit(1)).as("n"), sum(col("value")).as("sum_v")))
    val query = agg.writeStream.format("memory")
      .queryName("ev_stream").outputMode("update").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    mem.addData((ts(1, 5), "click", 1.0), (ts(1, 40), "click", 2.0), (ts(2, 10), "view", 5.0))
    query.processAllAvailable()
    query.stop()
    val rows = s.table("ev_stream")
      .select(col("window.start").cast("string"), col("event_type"), col("n"), col("sum_v"))
      .collect().map(_.toSeq).toSet
    assert(rows.contains(Seq("2026-01-01 01:00:00", "click", 2L, 3.0)))
    assert(rows.contains(Seq("2026-01-01 02:00:00", "view", 1L, 5.0)))
  }

  test("statefulAggTtl: cold group state is EVICTED past the TTL") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Double, java.sql.Timestamp, Boolean)]
    val df = mem.toDF().toDF("g", "v", "ts", IvmCore.MULT)
    // watermark 5 min behind max event time; state lives 10 min past the
    // group's newest event
    val agg = IvmStream.statefulAggTtl(df, "g", "v", "ts",
      watermarkDelay = "5 minutes", ttlMillis = 10 * 60 * 1000L)
    val query = agg.writeStream.format("memory")
      .queryName("ttl_stream").outputMode("update").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

    // batch 1: a and b at 01:00 (watermark → 00:55)
    mem.addData(("a", 2.0, ts(1, 0), true), ("a", 3.0, ts(1, 0), true),
      ("b", 7.0, ts(1, 0), true))
    query.processAllAvailable()
    // batch 2: only b stays warm at 01:30 (watermark → 01:25 > a's 01:10
    // timeout arm) — a's state must be reclaimed and tombstoned
    mem.addData(("b", 1.0, ts(1, 30), true))
    query.processAllAvailable()
    // batch 3: advance watermark past b's own re-arm AND re-feed a — it
    // must restart FROM ZERO (sum 9, not 5+9): eviction is a real forget
    mem.addData(("a", 9.0, ts(2, 0), true))
    query.processAllAvailable()
    query.stop()

    val updates = s.table("ttl_stream").collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double]),
        r.getLong(2), r.getBoolean(3)))
    // a: initial sum 5, then tombstone, then fresh sum 9 after re-feed
    val aSeq = updates.filter(_._1 == "a").toSeq
    assert(aSeq.contains(("a", Some(5.0), 2L, false)), s"got $aSeq")
    assert(aSeq.contains(("a", None, 0L, true)), s"no tombstone: $aSeq")
    assert(aSeq.contains(("a", Some(9.0), 1L, false)),
      s"state not forgotten: $aSeq")
    // b was re-armed by its 01:30 row, so it survived batch 2's watermark
    // (01:25) and accumulated across both batches
    val bSeq = updates.filter(_._1 == "b").toSeq
    assert(bSeq.contains(("b", Some(8.0), 2L, false)), s"got $bSeq")
  }
}
