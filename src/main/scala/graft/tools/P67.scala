package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ivm._
import graft.ivm.AggSpec._
import graft.Fixtures._
object P67 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val store = new MemStore
    val interior = Aggregate(
      LeftJoin(
        Project(Scan("customer"), Seq(col("c_custkey").as("custkey"))),
        Project(Scan("orders"), Seq(col("o_custkey").as("custkey"), col("o_orderkey"))),
        Seq("custkey")),
      Seq("custkey"), Seq(Count(col("o_orderkey"), "c_count")))
    val hist = Aggregate(interior, Seq("c_count"), Seq(CountStar("custdist")))
    val tot = Aggregate(interior, Seq.empty, Seq(Sum(col("c_count"), "torders"), CountStar("ncust")))
    val views = Map("hist" -> hist, "tot" -> tot)
    time("createShared")(Ivm.createShared(views, base(spark, dir), store))
    time("refreshShared")(Ivm.refreshShared(views, base(spark, dir), deltas(spark, dir), store))
    time("refreshShared2")(Ivm.refreshShared(views, base(spark, dir), deltas(spark, dir), store))
    time("readShared")(println(Ivm.readShared(hist, store).count()))
    spark.stop()
  }
}
