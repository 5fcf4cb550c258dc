package graft.sources

import graft.SparkTestBase
import graft.ivm._
import graft.ivm.AggSpec._
import graft.streaming.IvmStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Debezium-shaped op-log rows for the streaming test. */
case class CdcRow(op: String, before: Option[(String, Int)], after: Option[(String, Int)])

class CdcSpec extends AnyFunSuite with SparkTestBase {

  private val envelopeSchema =
    "op STRING, before STRUCT<g: STRING, v: INT>, after STRUCT<g: STRING, v: INT>"

  test("toDeltas: inserts/updates/deletes map to the reference delta model") {
    val log = df(envelopeSchema, Seq(
      Row("c", null, Row("a", 1)),               // insert
      Row("r", null, Row("b", 10)),              // snapshot read = insert
      Row("u", Row("a", 1), Row("a", 5)),        // update = delete + insert
      Row("d", Row("b", 10), null)))             // delete
    val got = Cdc.toDeltas(log).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(got == Set(
      ("a", 1, true), ("b", 10, true), ("a", 5, true),  // assertions
      ("a", 1, false), ("b", 10, false)))               // retractions
  }

  test("toDeltas feeds refreshState: CDC view == recompute over applied log") {
    val base: String => DataFrame = {
      case "t" => df("g STRING, v INT", Seq(
        Row("a", 1), Row("a", 2), Row("b", 10)))
    }
    val q = Aggregate(Scan("t"), Seq("g"),
      Seq(Sum(col("v"), "sum_v"), CountStar("cnt")))
    val log = df(envelopeSchema, Seq(
      Row("c", null, Row("c", 7)),
      Row("u", Row("a", 2), Row("a", 20)),
      Row("d", Row("b", 10), null)))             // group b dies
    val deltas: String => Option[DataFrame] = {
      case "t" => Some(Cdc.toDeltas(log)); case _ => None
    }
    val store = new MemStore
    Ivm.create("cdcv", q, base, store)
    Ivm.refreshState("cdcv", q, base, deltas, store)
    assertSameRows(Ivm.read("cdcv", q, store), Ivm.recompute(q, base, deltas))
    assertRows(Ivm.read("cdcv", q, store), Set(
      Seq("a", 21L, 2L), Seq("c", 7L, 1L)))      // b gone (count -> 0)
  }

  test("toDeltas: an unrecognized op fails the batch loudly") {
    val log = df(envelopeSchema, Seq(
      Row("c", null, Row("a", 1)),
      Row("x", null, Row("a", 2))))              // junk op
    val e = intercept[Exception] { Cdc.toDeltas(log).collect() }
    assert(e.getMessage != null && e.getMessage.contains("CDC op"),
      s"wrong error: ${e.getMessage}")
  }

  test("toDeltas drives IvmStream.maintain from a CDC stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val base: String => DataFrame = {
      case "t" => Seq(("a", 1), ("b", 10)).toDF("g", "v")
    }
    val q = Aggregate(Scan("t"), Seq("g"),
      Seq(Sum(col("v"), "sum_v"), CountStar("cnt")))
    val store = new MemStore
    Ivm.create("cdcsv", q, base, store)

    val mem = MemoryStream[CdcRow]
    val cdcStream = mem.toDF()
      .select(col("op"),
        col("before").cast("struct<g: string, v: int>").as("before"),
        col("after").cast("struct<g: string, v: int>").as("after"))
    val query = IvmStream.maintain("cdcsv", q, "t", base, store,
      Cdc.toDeltas(cdcStream),
      Files.createTempDirectory("cdc-ckpt").toString)

    mem.addData(
      CdcRow("c", None, Some(("c", 7))),
      CdcRow("u", Some(("a", 1)), Some(("a", 5))))
    query.processAllAvailable()
    mem.addData(CdcRow("d", Some(("b", 10)), None))
    query.processAllAvailable()
    query.stop()

    assertRows(Ivm.read("cdcsv", q, store), Set(
      Seq("a", 5L, 1L), Seq("c", 7L, 1L)))
  }
}
