package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the per-action floor of the small-batch local path: times a
  * groupBy-sum-collect over a 15k-row LocalRelation (the `adj`-shaped pin)
  * under different session settings. Usage: runMain graft.tools.MicroPin
  */
object MicroPin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rows = (1 to 15000).map(i => (i % 997, i.toLong, s"val$i"))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)): _*),
      new org.apache.spark.sql.types.StructType()
        .add("k", "int").add("v", "long").add("s", "string"))

    def time(tag: String, n: Int = 10)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9 / n}%.4fs/op")
    }

    for (aqe <- Seq("true", "false"); sp <- Seq("32", "1")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      println(s"aqe=$aqe shuffle=$sp")
      time("groupBy-sum-collect")(
        local.groupBy($"k").agg(sum($"v")).collect())
      time("project-collect (folded)")(
        local.select($"k" + 1).collect())
      time("broadcast-join-parquet-collect") {
        val t = spark.read.parquet("/root/testdata/sf0.1/nation.parquet")
        t.join(broadcast(local), t("n_nationkey") === local("k")).collect()
      }
    }
    spark.stop()
  }
}
