package graft.ivm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the trace-replay layer ([[Trace]]): from the second identical-shape
  * batch on, a view's refresh replays the recorded walk with fresh leaf
  * rows instead of re-composing it — and the replayed refresh must stay
  * EXACTLY equal to recompute, across inserts, deletes, group births and
  * deaths, on both stores. */
class TraceReplaySpec extends AnyFunSuite with SparkTestBase {

  // two-level view over a LEFT JOIN — the poster's Q13 shape, which
  // exercises match-count state, interior + top aggregates, accumulators
  private val view: IvmQuery = Aggregate(
    Aggregate(
      LeftJoin(
        Project(Scan("cust"), Seq(col("ck"))),
        Project(Scan("ord"), Seq(col("ck"), col("ok"))),
        Seq("ck")),
      Seq("ck"), Seq(AggSpec.Count(col("ok"), "c_count"))),
    Seq("c_count"), Seq(AggSpec.CountStar("custdist")))

  private def custDf: DataFrame =
    df("ck INT", (1 to 40).map(Row(_)))

  private def ordersAt(rows: Seq[(Int, Int)]): DataFrame =
    df("ck INT, ok INT", rows.map { case (c, o) => Row(c, o) })

  // batches of (insert?, ck, ok): some create groups, some kill them
  private val batches: Seq[Seq[(Boolean, Int, Int)]] = Seq(
    Seq((true, 1, 101), (true, 1, 102), (true, 2, 201)),
    Seq((true, 3, 301), (false, 1, 101)),          // delete + insert
    Seq((false, 1, 102), (false, 2, 201)),          // kills groups
    Seq((true, 4, 401), (true, 4, 402), (true, 4, 403)),
    Seq((false, 3, 301), (true, 5, 501)))

  private def deltaDf(b: Seq[(Boolean, Int, Int)]): DataFrame =
    df(s"ck INT, ok INT, `${IvmCore.MULT}` BOOLEAN",
      b.map { case (p, c, o) => Row(c, o, p) })

  private def runBatches(store: IvmStore): Seq[Seq[Row]] = {
    var live = Seq.empty[(Int, Int)]
    val base: String => DataFrame = {
      case "cust" => custDf
      case "ord"  => ordersAt(Seq.empty)
    }
    Ivm.create("v", view, base, store, deltaTables = Set("ord"))
    batches.map { b =>
      val deltas: String => Option[DataFrame] = {
        case "ord" => Some(deltaDf(b))
        case _     => None
      }
      Ivm.refreshState("v", view, base, deltas, store)
      live = live.filter(r => !b.exists(d => !d._1 && (d._2, d._3) == r)) ++
        b.filter(_._1).map(d => (d._2, d._3))
      Ivm.read("v", view, store).orderBy("c_count").collect().toSeq
    }
  }

  private def expected(): Seq[Seq[Row]] = {
    var live = Seq.empty[(Int, Int)]
    batches.map { b =>
      live = live.filter(r => !b.exists(d => !d._1 && (d._2, d._3) == r)) ++
        b.filter(_._1).map(d => (d._2, d._3))
      val base: String => DataFrame = {
        case "cust" => custDf
        case "ord"  => ordersAt(live)
      }
      Eval.eval(view, base).orderBy("c_count").collect().toSeq
    }
  }

  test("replayed refreshes equal recompute across batches (MemStore)") {
    val before = Trace.replays
    val got = runBatches(new MemStore)
    val want = expected()
    assert(got == want)
    assert(Trace.replays > before,
      "trace replay never engaged — the multi-batch path is not covered")
  }

  test("replayed refreshes equal recompute across batches (ParquetStore)") {
    val root = java.nio.file.Files.createTempDirectory("trace-pq").toString
    val got = runBatches(new ParquetStore(spark, root))
    assert(got == expected())
  }

  test("replay disabled gives identical results") {
    sys.props("graft.traceReplay") = "false"
    try {
      val got = runBatches(new MemStore)
      assert(got == expected())
    } finally sys.props.remove("graft.traceReplay")
  }
}
