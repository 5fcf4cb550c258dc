package graft
import org.apache.spark.sql.SparkSession
object P67b {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q67_ivm_shared_apply", "q109_tpch_q11", "q101_tpch_q15",
                  "q14_ivm_q13_real_apply", "q113_tpch_q21", "q102_tpch_q2")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"[prof] $q: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
