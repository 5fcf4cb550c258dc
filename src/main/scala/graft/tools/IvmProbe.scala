package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.ivm._
import graft.ivm.AggSpec._

import scala.collection.concurrent.TrieMap

/** Diagnoses the BENCH ivm block: times each refresh/recompute cycle and
  * prints every Spark job's wall time + description, so the per-batch cost
  * can be attributed (delta scan vs state pin vs commit write).
  *
  * Usage: runMain graft.tools.IvmProbe <sfDir> [iters]
  */
object IvmProbe {
  def main(args: Array[String]): Unit = {
    if (sys.env.get("SPARK_GRAFT_TIMING").contains("true"))
      sys.props("graft.timing") = "true"
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (sys.props.get("graft.timing").contains("true")) {
          val phases = qe.tracker.phases.map { case (p, s) =>
            f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.3f" }.mkString(" ")
          println(f"    query $funcName exec=${durationNs / 1e9}%.3fs $phases")
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    val jobStart = TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId,
          (System.nanoTime(), Option(js.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, desc) =>
          println(f"    job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $desc")
        }
    })

    def time[A](tag: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      val r = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.sparkContext.setJobDescription(null)
      r
    }

    val store = new ParquetStore(spark,
      java.nio.file.Files.createTempDirectory("ivm-probe").toString,
      buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "16").toInt,
      smallStateBytes =
        sys.env.get("SPARK_GRAFT_SMALLBYTES").map(_.toLong).getOrElse(64L << 20))
    // SPARK_GRAFT_VIEW: "agg" (default, the bench headline view over the
    // lineitem delta), "hi" (the 150k-group high-cardinality view), or
    // "q13" (poster Q13 over the orders delta).
    val (view, deltaTable, deltaDf) =
      sys.env.getOrElse("SPARK_GRAFT_VIEW", "agg") match {
        case "q13" =>
          (graft.SparkEntry.q13RealView, "orders", Fixtures.deltaOrders(spark, sfDir))
        case "hi" =>
          (Aggregate(Scan("lineitem"), Seq("l_orderkey"),
            Seq(Sum(col("l_quantity"), "sum_qty"), CountStar("cnt"))),
            "lineitem", Fixtures.deltaLineitem(spark, sfDir))
        case _ =>
          (Aggregate(Scan("lineitem"), Seq("l_returnflag", "l_linestatus"),
            Seq(Sum(col("l_extendedprice").cast("decimal(18,2)"), "sum_price"),
              Sum(col("l_quantity"), "sum_qty"), CountStar("cnt"))),
            "lineitem", Fixtures.deltaLineitem(spark, sfDir))
      }

    // Materialize the delta batch once, as it would arrive in production —
    // a small file, not a predicate re-scanned over the base every cycle.
    val deltaDir = java.nio.file.Files.createTempDirectory("ivm-probe-delta").toString
    deltaDf.write.mode("overwrite").parquet(deltaDir)
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case `deltaTable` => Some(spark.read.parquet(deltaDir))
      case _            => None
    }
    // SPARK_GRAFT_DECLARE=true declares the single fed table (as the bench
    // does) — skips the delta-accumulator maintenance a multi-table feed
    // would need.
    if (sys.env.get("SPARK_GRAFT_DECLARE").contains("true"))
      time("create")(Ivm.create("bench_v", view,
        Fixtures.base(spark, sfDir), store, deltaTables = Set(deltaTable)))
    else
      time("create")(Ivm.create("bench_v", view,
        Fixtures.base(spark, sfDir), store))
    // SPARK_GRAFT_PIN_DV=true uses refresh() (pins + materializes ΔV
    // before commits) instead of refreshState() — measures whether one
    // up-front materialization beats lazy shared-cache contention.
    val pinDv = sys.env.get("SPARK_GRAFT_PIN_DV").contains("true")
    for (i <- 1 to iters)
      time(s"refresh$i")(
        if (pinDv) Ivm.refresh("bench_v", view,
          Fixtures.base(spark, sfDir), deltas, store).unpersist()
        else Ivm.refreshState("bench_v", view,
          Fixtures.base(spark, sfDir), deltas, store))
    for (i <- 1 to iters)
      time(s"recompute$i")(store.put(s"full$i",
        Ivm.recompute(view, Fixtures.base(spark, sfDir), deltas)))
    spark.stop()
  }
}
