package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ivm._
import graft.Fixtures
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$tag] ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm the session on a trivial action
    Fixtures.tbl(spark, dir, "customer").count()
    for (round <- 1 to 2) {
      println(s"== q67 round $round ==")
      val store = new MemStore
      val interior = Aggregate(
        LeftJoin(
          Project(Scan("customer"), Seq(col("c_custkey").as("custkey"))),
          Project(Scan("orders"), Seq(col("o_custkey").as("custkey"), col("o_orderkey"))),
          Seq("custkey")),
        Seq("custkey"), Seq(AggSpec.Count(col("o_orderkey"), "c_count")))
      val hist = Aggregate(interior, Seq("c_count"), Seq(AggSpec.CountStar("custdist")))
      val tot = Aggregate(interior, Seq.empty,
        Seq(AggSpec.Sum(col("c_count"), "torders"), AggSpec.CountStar("ncust")))
      val views = Map("hist" -> hist, "tot" -> tot)
      t("createShared")(Ivm.createShared(views, Fixtures.base(spark, dir), store))
      t("refreshShared")(Ivm.refreshShared(views, Fixtures.base(spark, dir),
        Fixtures.deltas(spark, dir), store))
      t("read+count")(Ivm.readShared(hist, store).count())
    }
    spark.stop()
  }
}
