package graft.tools
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[1]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sql <- Seq(
      "SELECT g, h, SUM(v) AS sv FROM t GROUP BY ROLLUP(g, h)",
      "SELECT g, h, SUM(v) AS sv FROM t GROUP BY CUBE(g, h)")) {
      val p = spark.sessionState.sqlParser.parsePlan(sql)
      println("=== " + sql)
      println(p.treeString)
    }
    spark.stop()
  }
}
