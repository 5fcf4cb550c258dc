package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.ivm._
import graft.ivm.AggSpec._

/** Dev probe for the BENCH lsm block (overlay vs compact-every-merge):
  * replicates the block exactly — interleaved warm-ups, byte probes at an
  * append position, interleaved medians of 5 — so the driver-visible
  * `overlay_speedup` can be checked for reproducibility without a full
  * bench run. Usage: runMain graft.tools.LsmProbe <sfDir> [rounds]
  */
object LsmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.broadcast.compress", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val dDir = java.nio.file.Files.createTempDirectory("lsmp-d").toString
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
    for (round <- 1 to rounds) {
      def mk(chain: Int): (() => Unit, String) = {
        val root = java.nio.file.Files
          .createTempDirectory(s"lsmp$chain").toString
        val st = new ParquetStore(spark, root,
          buckets = 32, smallStateBytes = 0, maxChain = chain,
          keepVersions = 1)
        Ivm.create(s"lsm$chain", wideView, Fixtures.base(spark, sfDir), st)
        (() => Ivm.refreshState(s"lsm$chain", wideView,
          Fixtures.base(spark, sfDir), deltas, st), root)
      }
      val (overlayOnce, rootO) = mk(8)
      val (compactOnce, rootC) = mk(1)
      overlayOnce(); compactOnce(); overlayOnce(); compactOnce()
      def wroteBytes(root: String)(f: => Unit): Long = {
        val before = segSizes(root).keySet
        f
        segSizes(root).collect { case (p, b) if !before(p) => b }.sum
      }
      val bO = wroteBytes(rootO)(overlayOnce())
      val bC = wroteBytes(rootC)(compactOnce())
      val pairs = (1 to 5).map(_ => (time(overlayOnce()), time(compactOnce())))
      val tO = pairs.map(_._1).sorted.apply(2)
      val tC = pairs.map(_._2).sorted.apply(2)
      println(f"[lsm] round$round overlay=$tO%.3fs compact=$tC%.3fs " +
        f"speedup=${tC / tO}%.2f writeO=$bO writeC=$bC " +
        f"reduction=${bC.toDouble / math.max(bO, 1)}%.1f pairs=" +
        pairs.map(p => f"(${p._1}%.2f,${p._2}%.2f)").mkString(","))
    }
    spark.stop()
  }
}
