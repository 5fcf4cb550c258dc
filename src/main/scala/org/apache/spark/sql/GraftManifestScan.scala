package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Manifest-backed parquet scans: build a file-source relation from a
  * KNOWN list of (file, length) pairs — zero filesystem listing, zero
  * footer reads at plan time.
  *
  * The versioned state store ([[graft.ivm.ParquetStore]]) records, in the
  * same manifest line that publishes a segment, the files the write
  * produced. Every state read already knows its schema (manifest DDL) and
  * now its exact leaf files — so constructing the scan costs nothing but
  * object allocation. Without this, `spark.read.parquet(dirs)` re-lists
  * every chain directory per state read; at ~2 ms of fs metadata per
  * directory an 8-deep × 32-bucket overlay chain pays ~0.5 s of DRIVER
  * time per refresh — and on an object store (the 100 TB deployment,
  * where LIST is a throttled network round-trip) the same design is the
  * difference between O(1) planning and O(segments) listing per query.
  * This is the table-format move (Delta/Iceberg/Hudi all plan from
  * manifests, never LIST) applied to the IVM state store.
  *
  * Lives in org.apache.spark.sql to reach the `private[sql]`
  * LogicalRelation/HadoopFsRelation constructors; no behavior is patched.
  */
object GraftManifestScan {

  private final class KnownFiles(
      files: Seq[(String, Long)]) extends FileIndex {
    private val statuses: Seq[FileStatus] = files.map { case (p, len) =>
      // modtime 0 is safe: nothing on the read path keys off it (no
      // file-status cache is in play — that is the point of this class)
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
    }
    override val rootPaths: Seq[Path] = statuses.map(_.getPath)
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
    override def inputFiles: Array[String] = files.map(_._1).toArray
    override def refresh(): Unit = ()
    override val sizeInBytes: Long = files.map(_._2).sum
    override def partitionSchema: StructType = StructType(Nil)
  }

  /** Parquet scan over exactly `files` ((absolute path, byte length)),
    * with the given data schema. No fs calls now or at planning. */
  def parquetByFiles(spark: SparkSession, schema: StructType,
      files: Seq[(String, Long)]): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val rel = HadoopFsRelation(
      new KnownFiles(files),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(session)
    classic.Dataset.ofRows(session, LogicalRelation(rel, isStreaming = false))
  }
}
