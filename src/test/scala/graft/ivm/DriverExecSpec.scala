package graft.ivm

import org.apache.spark.sql.{DataFrame, GraftTemplates, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** De-risks the driver-inline execution path
  * ([[org.apache.spark.sql.GraftTemplates]] `driverCollect`): the same
  * multi-batch refresh suite runs twice — once with `graft.driverExec`
  * default-on, once forced off — and every batch's view contents must be
  * identical. The on-mode run must also prove the path ENGAGES
  * (`inlineRuns` advances), otherwise the parity assertion is vacuous.
  *
  * SEQUENTIAL-EXECUTION ASSUMPTION: this test mutates the global
  * `graft.driverExec` sys-prop and asserts on the shared
  * `GraftTemplates.inlineRuns` counter — sound only because the build
  * runs suites sequentially in one forked JVM (`Test / fork := true`,
  * `testForkedParallel := false`, `parallelExecution := false` — all
  * pinned in build.sbt with a pointer back here). A parallel runner
  * would flip the execution path under concurrently running suites and
  * make the counter deltas flaky; revisit the prop/counter handling
  * before enabling one. */
class DriverExecSpec extends AnyFunSuite with SparkTestBase {

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

  private val batches: Seq[Seq[(Boolean, Int, Int)]] = Seq(
    Seq((true, 1, 101), (true, 1, 102), (true, 2, 201)),
    Seq((true, 3, 301), (false, 1, 101)),
    Seq((false, 1, 102), (false, 2, 201)),
    Seq((true, 4, 401), (true, 4, 402), (true, 4, 403)),
    Seq((false, 3, 301), (true, 5, 501)))

  private def deltaDf(b: Seq[(Boolean, Int, Int)]): DataFrame =
    df(s"ck INT, ok INT, `${IvmCore.MULT}` BOOLEAN",
      b.map { case (p, c, o) => Row(c, o, p) })

  private def runBatches(): Seq[Seq[Row]] = {
    val store = new MemStore
    val base: String => DataFrame = {
      case "cust" => custDf
      case "ord"  => df("ck INT, ok INT", Seq.empty)
    }
    Ivm.create("v", view, base, store, deltaTables = Set("ord"))
    batches.map { b =>
      Ivm.refreshState("v", view, base,
        { case "ord" => Some(deltaDf(b)); case _ => None }, store)
      Ivm.read("v", view, store).orderBy("c_count").collect().toSeq
    }
  }

  test("driverExec on/off produce identical view contents; on-mode engages") {
    val before = GraftTemplates.inlineRuns.get()
    val withInline = runBatches()
    assert(GraftTemplates.inlineRuns.get() > before,
      "driver-inline exec never engaged — parity check would be vacuous")
    sys.props("graft.driverExec") = "false"
    try {
      val mid = GraftTemplates.inlineRuns.get()
      val without = runBatches()
      assert(GraftTemplates.inlineRuns.get() == mid,
        "driver-inline exec ran despite graft.driverExec=false")
      assert(withInline == without)
    } finally sys.props.remove("graft.driverExec")
  }
}
