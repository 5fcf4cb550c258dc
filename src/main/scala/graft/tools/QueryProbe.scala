package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (not driver-run): times a named subset of SparkEntry queries
  * under the current flag set, to bisect per-query regressions.
  *   sbt "runMain graft.tools.QueryProbe <sfDir> <q1,q2,...> [reps]"
  * Flags of interest: -Dgraft.driverExec=false, -Dgraft.planTemplates=false,
  * -Dgraft.traceReplay=false, -Dgraft.localBatchRows=0.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q56_ivm_argminmax_apply"))
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
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
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[probe] rep$r $n ${(System.nanoTime() - t0) / 1e9}%.3fs " +
        s"inline=${org.apache.spark.sql.GraftTemplates.inlineRuns.get()} " +
        s"tplHits=${org.apache.spark.sql.GraftTemplates.hits}")
    }
    spark.stop()
  }
}
