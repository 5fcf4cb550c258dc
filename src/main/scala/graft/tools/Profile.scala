package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling of individual SparkEntry queries: runs each named query
  * `iters` times and prints per-iteration wall times plus the formatted
  * physical plan of the first run.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <iters> <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).filterNot(_.startsWith("--"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      if (args.contains("--explain")) fn(spark, sfDir).explain("formatted")
      for (i <- 1 to iters) {
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        println(f"$n iter$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      }
    }
    spark.stop()
  }
}
