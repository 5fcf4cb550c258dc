package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Profiling aid (not driver-run): times one steady-state refresh of the
  * Q13 join view with per-stage `graft.timing` prints and a job listener,
  * to locate the fixed per-batch floor. Run with:
  *   sbt "runMain graft.BenchProfile /root/testdata/sf0.1"
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    sys.props("graft.timing") = "true"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.constraintPropagation.enabled",
        sys.props.getOrElse("prof.constraints", "true"))
      .config("spark.sql.adaptive.enabled",
        sys.props.getOrElse("prof.aqe", "true"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = TrieMap[Int, (Long, String)]()
    var jobs = Vector.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = (System.nanoTime(),
          Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse(""))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.remove(e.jobId).foreach { case (t0, d) =>
          jobs.synchronized { jobs :+= ((e.jobId, (System.nanoTime() - t0) / 1e9, d)) }
        }
    })

    import graft.ivm._
    val store = new ParquetStore(spark,
      java.nio.file.Files.createTempDirectory("ivm-prof").toString)
    val q13 = SparkEntry.q13RealView
    val oDeltaDir = java.nio.file.Files.createTempDirectory("ivm-prof-od").toString
    Fixtures.deltaOrders(spark, sfDir).write.mode("overwrite").parquet(oDeltaDir)
    val oDeltas: String => Option[DataFrame] = {
      case "orders" => Some(spark.read.parquet(oDeltaDir))
      case _        => None
    }
    Ivm.create("bench_q13", q13, Fixtures.base(spark, sfDir), store,
      deltaTables = Set("orders"))
    def refresh() = Ivm.refreshState("bench_q13", q13,
      Fixtures.base(spark, sfDir), oDeltas, store)
    refresh(); refresh() // warm-ups
    for (i <- 1 to 3) {
      jobs = Vector.empty
      val t0 = System.nanoTime()
      refresh()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== refresh $i wall $wall%.3f s, ${jobs.size} jobs, " +
        f"sum-job ${jobs.map(_._2).sum}%.3f s, tpl hits=" +
        s"${org.apache.spark.sql.GraftTemplates.hits} misses=" +
        s"${org.apache.spark.sql.GraftTemplates.misses}")
      jobs.sortBy(-_._2).take(12).foreach { case (id, s, d) =>
        println(f"   job $id%3d $s%6.3f s  ${d.take(90)}")
      }
    }
    println("== last substituted plan ==")
    println(org.apache.spark.sql.GraftTemplates.lastPlanDump)
    spark.stop()
  }

  private type DataFrame = org.apache.spark.sql.DataFrame
}
