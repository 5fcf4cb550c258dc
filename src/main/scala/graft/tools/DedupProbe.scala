package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: breaks the maintained-dedup cascade (q123) cost into
  * create-sig / freeze / create-pairs / refresh / read slices.
  *   sbt "runMain graft.tools.DedupProbe /root/testdata/sf0.1"
  */
object DedupProbe {
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
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dp] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    import graft.ivm._
    val base = graft.Fixtures.base(spark, sfDir)
    val store = new MemStore
    val c0 = new Cascade(
      Seq("sig123" -> graft.SparkEntry.dedupSigView(spark),
        "pairs123" -> graft.SparkEntry.dedupPairsView), base, store)
    time("create")(c0.create())
    val deltas = graft.Fixtures.deltas(spark, sfDir)
    (1 to 4).foreach(i => time(s"refresh warm$i")(c0.refresh(deltas)))
    (1 to 3).foreach(i => time(s"refresh steady$i")(c0.refresh(deltas)))
    println("replays=" + Ivm.traceReplays +
      " inline=" + org.apache.spark.sql.GraftTemplates.inlineRuns.get())
    time("read")(println("rows=" + c0.read("pairs123").count()))
    spark.stop()
  }
}
