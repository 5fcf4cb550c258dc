package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.ivm._

/** Loops q13 refreshState forever (profiling target for jstack/JFR). */
object RefreshLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = new ParquetStore(spark,
      java.nio.file.Files.createTempDirectory("loop").toString)
    val q13 = graft.SparkEntry.q13RealView
    val dDir = java.nio.file.Files.createTempDirectory("loop-d").toString
    Fixtures.deltaOrders(spark, sfDir).write.mode("overwrite").parquet(dDir)
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "orders" => Some(spark.read.parquet(dDir))
      case _        => None
    }
    Ivm.create("v", q13, Fixtures.base(spark, sfDir), store,
      deltaTables = Set("orders"))
    val n = if (args.length > 1) args(1).toInt else 60
    val t0 = System.nanoTime()
    for (i <- 1 to n) {
      val t = System.nanoTime()
      Ivm.refreshState("v", q13, Fixtures.base(spark, sfDir), deltas, store)
      if (i % 10 == 0)
        println(f"iter $i: ${(System.nanoTime() - t) / 1e9}%.3f s (avg ${(System.nanoTime() - t0) / 1e9 / i}%.3f)")
    }
    spark.stop()
  }
}
