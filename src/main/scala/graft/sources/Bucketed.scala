package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for co-located joins — the disk-level half of the
  * scale design: two tables bucketed by the same key into the same bucket
  * count join WITHOUT a shuffle (both sides already hash-partitioned on
  * disk), which at 100 TB removes the single most expensive exchange of a
  * fact⋈fact join. Dimension⋈fact joins should broadcast instead.
  *
  * Spark bucketing rides the session catalog (`saveAsTable`); the bucket
  * metadata lives in the metastore, so reads via `spark.table` recover the
  * output partitioning and the planner drops the Exchange.
  */
object Bucketed {

  /** Write `df` as a bucketed (and optionally sorted) catalog table. */
  def write(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Seq.empty,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * test/assert helper for "this join must be co-located". */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
