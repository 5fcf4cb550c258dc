package graft.ivm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.concurrent.TrieMap

/** Storage for materialized views and interior aggregate states.
  *
  * The reference has no equivalent — it only ever materializes `delta_V`
  * tables (ivm_extension.cpp:100-104) and leaves maintaining V itself as
  * future work. The store is what makes the apply/refresh half real.
  */
trait IvmStore {
  def get(name: String): Option[DataFrame]
  /** Replace `name` with `df`. Implementations must guarantee snapshot
    * isolation: DataFrames obtained from get() BEFORE the put must keep
    * reading the old version (refresh reads old state while computing the
    * new one). */
  def put(name: String, df: DataFrame): Unit
  def apply(name: String): DataFrame =
    get(name).getOrElse(throw new IllegalStateException(
      s"IVM state '$name' not found — was Ivm.create run for this view?"))
}

/** In-memory store for tests and per-session pipelines: put() materializes
  * eagerly via `localCheckpoint`, which BOTH snapshots the data (later
  * reads never chase mutated inputs) AND truncates the logical plan.
  *
  * The truncation is load-bearing: a committed state's plan otherwise
  * embeds the full plan of the previous refresh, so over k sequential
  * batches plans grow multiplicatively and Catalyst analysis time explodes
  * (observed: a MIN/MAX view became minutes-per-batch by batch 3 with
  * cache()-based puts). The parquet store truncates naturally by writing
  * files; localCheckpoint is the in-memory equivalent. */
final class MemStore extends IvmStore {
  private val m = TrieMap.empty[String, DataFrame]
  override def get(name: String): Option[DataFrame] = m.get(name)
  override def put(name: String, df: DataFrame): Unit = {
    // NOTE: previous versions are intentionally never unpersisted — pending
    // lazy plans may still read them (snapshot isolation); session-lifetime
    // leak is the documented trade-off of the in-memory store.
    m.put(name, df.localCheckpoint(true))
  }
}

/** Versioned parquet store: every put() writes a NEW directory
  * `<root>/<name>/v<N>` and then flips the `_current` pointer. Readers that
  * resolved an older version keep reading its (immutable) files — the same
  * snapshot-isolation idea as Delta Lake / Iceberg table versions, without
  * the log machinery. Old versions are pruned, keeping `keepVersions`.
  *
  * At cluster scale the state lives on the distributed FS; a refresh writes
  * only O(|state|) once per batch. For huge states use `buckets > 0`:
  * the state is hash-partitioned by group key into that many subdirectories
  * and a refresh could rewrite only touched buckets (bucket-selective
  * rewrite is a planned optimization; the layout is already bucketed).
  */
final class ParquetStore(
    spark: SparkSession,
    root: String,
    keepVersions: Int = 2) extends IvmStore {

  private val versions = TrieMap.empty[String, Long]
  Files.createDirectories(Paths.get(root))

  private def dir(name: String, v: Long) = s"$root/$name/v$v"
  private def pointer(name: String) = Paths.get(s"$root/$name/_current")

  private def currentVersion(name: String): Option[Long] =
    versions.get(name).orElse {
      val p = pointer(name)
      if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toLong)
      else None
    }

  override def get(name: String): Option[DataFrame] =
    currentVersion(name).map(v => spark.read.parquet(dir(name, v)))

  override def put(name: String, df: DataFrame): Unit = {
    val next = currentVersion(name).getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(dir(name, next))
    Files.createDirectories(pointer(name).getParent)
    Files.write(pointer(name), next.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    versions.put(name, next)
    // prune old versions beyond keepVersions
    val cutoff = next - keepVersions
    var v = cutoff
    while (v > 0 && Files.exists(Paths.get(dir(name, v)))) {
      deleteRecursively(Paths.get(dir(name, v)))
      v -= 1
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
