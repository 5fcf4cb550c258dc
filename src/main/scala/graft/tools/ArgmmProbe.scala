package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.ivm._
import graft.ivm.AggSpec._

import scala.collection.concurrent.TrieMap

/** Dev probe (not driver-run): phase-times q56's MIN_BY/MAX_BY view —
  * create vs refreshState vs read — with a per-job wall-time listener, to
  * attribute the q56 bench outlier.
  *   sbt "runMain graft.tools.ArgmmProbe <sfDir>"
  */
object ArgmmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    val v = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
      Seq(MinBy(col("l_quantity"), col("l_orderkey"), "cheapest_order"),
        MaxBy(col("l_quantity"), col("l_orderkey"), "biggest_order"),
        CountStar("cnt")))
    for (rep <- 1 to 2) {
      val store = new MemStore
      time(s"rep$rep.create")(Ivm.create("q56", v, Fixtures.base(spark, sfDir), store))
      time(s"rep$rep.refresh")(Ivm.refreshState("q56", v,
        Fixtures.base(spark, sfDir), Fixtures.deltas(spark, sfDir), store))
      time(s"rep$rep.read")(Ivm.read("q56", v, store).count())
    }
    spark.stop()
  }
}
