package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.ivm.Eval.eval(graft.SparkEntry.dedupSigView(spark),
      graft.Fixtures.base(spark, args.headOption.getOrElse("/root/testdata/sf0.01")))
    val plan = df.queryExecution.optimizedPlan.toString
    println("=== md5 count in optimized plan: " +
      "md5".r.findAllIn(plan).length)
    println("=== transform count: " + "transform".r.findAllIn(plan).length)
    println(plan.split("\n").take(25).mkString("\n").take(4000))
    val t0 = System.nanoTime(); df.count()
    println(f"=== eval ${(System.nanoTime()-t0)/1e9}%.2fs")
    spark.stop()
  }
}
