package org.apache.spark.sql

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType

/** Driver-direct parquet I/O for SMALL state segments — the per-batch
  * floor killer for the IVM maintenance loop.
  *
  * Every store write normally goes through `df.write.parquet`, which costs
  * a full Spark job (driver scheduling + task launch) plus the Hadoop
  * commit protocol (temporary dir, rename dance) — ~150-250 ms of fixed
  * overhead regardless of data size. A maintained view refreshing a small
  * batch commits 3-6 state segments of a few KB each, so the commit
  * overhead alone dominates the refresh. This shim writes those segments
  * FROM THE DRIVER with Spark's own `ParquetWriteSupport` (via
  * `ParquetUtils.prepareWrite`, the exact code path an executor write task
  * runs), so the bytes on disk are indistinguishable from a distributed
  * write — same encodings, same compression, same footer — at ~10 ms.
  *
  * Scale note: this is a SMALL-STATE fast path, gated by the caller on the
  * store's `smallStateBytes` threshold. Large states keep the distributed
  * write (bucketed layout, overlay appends); a state that grows past the
  * threshold falls back automatically. At 100 TB the big states are the
  * data path — but the floor multiplies per VIEW, and hundreds of
  * maintained views each committing tiny aggregate states is exactly where
  * the fleet-wide driver time goes.
  *
  * Lives in org.apache.spark.sql to reach the `private[sql]` writer
  * plumbing; no Spark behavior is patched.
  */
object GraftLocalIO {

  /** `private[sql]` bridge: schema with every field relaxed to nullable —
    * what a parquet read reports, so segments round-trip identically. */
  def nullable(schema: StructType): StructType = schema.asNullable

  /** `AtomicType` is protected outside org.apache.spark.sql.types. */
  def isAtomic(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.isInstanceOf[org.apache.spark.sql.types.AtomicType]

  /** Execute `df`'s plan and return its InternalRows when the result has
    * at most `cap` rows; None when larger (caller falls back to the
    * distributed path, paying one extra partial execution — rare, only
    * when a "known small" state outgrows the threshold in one batch). */
  def tryCollect(df: DataFrame, cap: Int): Option[Array[InternalRow]] = {
    val rows = df.queryExecution.executedPlan.executeTake(cap + 1)
    if (rows.length > cap) None else Some(rows)
  }

  /** Release the block-manager storage behind a `localCheckpoint(eager)`
    * frame whose rows the caller has ALREADY copied out (e.g. into a
    * LocalRelation that replaces it). Without this the checkpoint's blocks
    * live until RDD GC + ContextCleaner get around to them — a permanent
    * footprint for a first-sight small state in a long session. No-op for
    * non-checkpoint plans. */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        // unpersisting a locally-checkpointed RDD logs an expected WARN
        // ("lineage truncated, cannot be recomputed") on EVERY small-state
        // put — intentional here (the rows live on in a LocalRelation), so
        // quiet that logger once rather than spam the driver log per batch
        quietUnpersistWarn
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }
  private lazy val quietUnpersistWarn: Unit =
    try {
      // Scope the mute to the ONE expected message: a message-matching
      // DENY filter on a dedicated LoggerConfig for MapPartitionsRDD.
      // (A blanket setLevel(ERROR) would mute every other WARN from that
      // class JVM-wide for the rest of the session.)
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      val cfg = ctx.getConfiguration
      val parent = cfg.getLoggerConfig(name) // nearest ancestor config
      val lc =
        if (parent.getName == name) parent
        else {
          // fresh additive config: no appenders of its own, events still
          // flow to the ancestor's appenders — only the filter is new
          val fresh = new org.apache.logging.log4j.core.config.LoggerConfig(
            name, parent.getLevel, true)
          cfg.addLogger(name, fresh)
          fresh
        }
      lc.addFilter(new org.apache.logging.log4j.core.filter.AbstractFilter {
        override def filter(event: org.apache.logging.log4j.core.LogEvent)
            : org.apache.logging.log4j.core.Filter.Result =
          if (event.getLevel == org.apache.logging.log4j.Level.WARN &&
              event.getMessage != null &&
              String.valueOf(event.getMessage.getFormattedMessage)
                .contains("cannot be recomputed after unpersisting"))
            org.apache.logging.log4j.core.Filter.Result.DENY
          else org.apache.logging.log4j.core.Filter.Result.NEUTRAL
      })
      ctx.updateLoggers()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** LocalRelation-backed frame over InternalRows (zero-copy: the rows are
    * the UnsafeRow copies executeTake already made). Schema nullability is
    * taken as given — pass the same schema a parquet read would report so
    * downstream plans see identical types either way. */
  def localDf(spark: SparkSession, schema: StructType,
      rows: Seq[InternalRow]): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      LocalRelation(DataTypeUtils.toAttributes(schema), rows))

  /** Write `rows` as ONE parquet file at `file` (an absolute path inside a
    * segment directory the caller owns), using Spark's ParquetWriteSupport
    * with the session's parquet write configuration. Returns bytes
    * written. No job, no commit protocol — the caller's manifest flip is
    * the atomicity boundary, exactly as for distributed segment writes. */
  def writeParquet(spark: SparkSession, schema: StructType,
      rows: Iterable[InternalRow], file: String): Long = {
    val sqlConf = spark.asInstanceOf[classic.SparkSession].sessionState.conf
    val hadoopConf =
      spark.asInstanceOf[classic.SparkSession].sessionState.newHadoopConf()
    val job = Job.getInstance(hadoopConf)
    val factory = ParquetUtils.prepareWrite(sqlConf, job, schema,
      new ParquetOptions(Map.empty[String, String], sqlConf))
    val tac = new TaskAttemptContextImpl(job.getConfiguration,
      new TaskAttemptID(new TaskID(new JobID("graft-local", 0),
        TaskType.MAP, 0), 0))
    val writer = factory.newInstance(file, schema, tac)
    try rows.foreach(writer.write)
    finally writer.close()
    new java.io.File(file).length()
  }
}
