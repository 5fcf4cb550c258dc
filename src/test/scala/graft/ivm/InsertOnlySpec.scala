package graft.ivm

import graft.SparkTestBase
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** INSERT-ONLY extremum maintenance (`Ivm.create(insertOnly = true)`):
  * MIN/MAX/MIN_BY/MAX_BY fold each batch's inserted extrema into the
  * stored value with NO auxiliary multiset — total state O(groups), the
  * append-only contract of most training-data feeds. A deletion that
  * touches an extremum spec must fail the refresh loudly (silently
  * keeping a possibly-stale extremum would corrupt the view), exactly
  * like the insert-only sketch aggregates. */
class InsertOnlySpec extends AnyFunSuite with SparkTestBase {

  private val view = Aggregate(Scan("t"), Seq("g"),
    Seq(Min(col("v"), "min_v"), Max(col("v"), "max_v"),
      MaxBy(col("v"), col("h"), "argmax"),
      Sum(col("v"), "sum_v"), CountStar("n")))

  private def base(rows: Seq[Row]): String => DataFrame = {
    case "t" => df("g STRING, v INT, h INT", rows)
  }
  private def delta(rows: Seq[Row]): String => Option[DataFrame] = {
    case "t" => Some(df(s"g STRING, v INT, h INT, ${IvmCore.MULT} BOOLEAN", rows))
    case _   => None
  }

  private val t0 = Seq(Row("a", 5, 1), Row("a", 2, 2), Row("b", 7, 3))

  test("insert-only batches fold extrema == recompute; new groups start clean") {
    val store = new MemStore
    Ivm.create("io", view, base(t0), store, deltaTables = null,
      insertOnly = true)
    // batch 1: improve a's min AND max; batch 2: brand-new group c
    val batches = Seq(
      Seq(Row("a", 1, 4, true), Row("a", 9, 5, true)),
      Seq(Row("c", 3, 6, true), Row("b", 7, 7, true))) // dup (b,7): max_by ties → larger pair
    var all = Seq.empty[Row]
    for (b <- batches) {
      all = all ++ b
      Ivm.refreshState("io", view, base(t0), delta(b), store)
    }
    val got = Ivm.read("io", view, store).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSet
    val want = Ivm.recompute(view, base(t0), delta(all)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got == Set(("a", 1, 9, 5, 17L, 4L), ("b", 7, 7, 7, 14L, 2L),
      ("c", 3, 3, 6, 3L, 1L)))
  }

  test("no aux multiset state exists on disk for an insert-only view") {
    val root = Files.createTempDirectory("ivm-insonly").toString
    val store = new ParquetStore(spark, root, smallStateBytes = 0)
    Ivm.create("io2", view, base(t0), store, deltaTables = null,
      insertOnly = true)
    Ivm.refreshState("io2", view, base(t0),
      delta(Seq(Row("a", 0, 9, true))), store)
    def walk(f: java.io.File): Seq[String] =
      if (!f.isDirectory) Seq.empty
      else f.getName +: Option(f.listFiles).toSeq.flatten.flatMap(walk)
    val aux = walk(new java.io.File(root)).filter(_.contains(".aux."))
    assert(aux.isEmpty, s"insert-only view created aux state: $aux")
    assert(Ivm.read("io2", view, store).where(col("g") === "a")
      .collect().map(_.getInt(1)).toSeq == Seq(0))
  }

  test("a deletion touching an insert-only extremum fails loudly") {
    val store = new MemStore
    Ivm.create("io3", view, base(t0), store, deltaTables = null,
      insertOnly = true)
    val ex = intercept[Exception] {
      Ivm.refreshState("io3", view, base(t0),
        delta(Seq(Row("a", 5, 1, false))), store)
      Ivm.read("io3", view, store).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("INSERT-ONLY")),
      s"unexpected failure: ${msgs(ex).mkString(" | ")}")
  }

  test("streaming statefulAgg supports insert-only extrema") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IvmStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Int, Int, Boolean)]
    val stream = in.toDF().toDF("g", "v", "h", IvmCore.MULT)
    val out = IvmStream.statefulAgg(stream, Seq("g"),
      Seq(Min(col("v"), "min_v"), MaxBy(col("v"), col("h"), "argmax"),
        CountStar("n")))
    val q = out.writeStream.format("memory").queryName("io_stream")
      .outputMode("complete").start()
    try {
      in.addData(("a", 5, 1, true), ("a", 2, 2, true), ("b", 7, 3, true))
      q.processAllAvailable()
      in.addData(("a", 1, 4, true))
      q.processAllAvailable()
      val got = spark.table("io_stream").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
      assert(got == Set(("a", 1, 1, 3L), ("b", 7, 3, 1L))) // argmax: h of max v=5
    } finally q.stop()
  }

  test("a streaming extremum retraction names the EXTREMUM family, not sketches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IvmStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Int, Int, Boolean)]
    val out = IvmStream.statefulAgg(
      in.toDF().toDF("g", "v", "h", IvmCore.MULT), Seq("g"),
      Seq(Min(col("v"), "min_v"), CountStar("n")))
    val q = out.writeStream.format("memory").queryName("io_stream_del")
      .outputMode("complete").start()
    try {
      in.addData(("a", 5, 1, false)) // retraction into an extremum agg
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      // the diagnostic must point at the extremum family and its real
      // alternatives — not at HLL/KLL registers (a sketch-specific
      // message here sent users chasing the wrong aggregate)
      assert(e.getMessage.contains("MIN/MAX"), e.getMessage)
      assert(e.getMessage.contains("statefulMinMax"), e.getMessage)
      assert(!e.getMessage.contains("HLL"), e.getMessage)
    } finally q.stop()
  }
}
