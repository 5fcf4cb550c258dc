package graft.ivm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Storage for materialized views and interior aggregate states.
  *
  * The reference has no equivalent — it only ever materializes `delta_V`
  * tables (ivm_extension.cpp:100-104) and leaves maintaining V itself as
  * future work. The store is what makes the apply/refresh half real.
  *
  * The API is shaped by the two operations a 100 TB refresh loop needs to
  * be O(‖Δ‖), not O(state):
  *
  *   - [[slice]]: read ONLY the state rows for a (small) set of touched
  *     keys — backends that bucket state by key prune the read to touched
  *     buckets instead of scanning the full state;
  *   - [[merge]]: fold per-key replacement rows in, rewriting only the
  *     buckets containing touched keys instead of the whole state.
  */
trait IvmStore {
  def get(name: String): Option[DataFrame]

  /** Replace `name` with `df`. Implementations must guarantee snapshot
    * isolation: DataFrames obtained from get() BEFORE the put must keep
    * reading the old version (refresh reads old state while computing the
    * new one). */
  def put(name: String, df: DataFrame): Unit

  /** put() with declared bucketing keys. Backends that hash-partition
    * state by key ([[ParquetStore]]) lay the data out so later [[merge]]/
    * [[slice]] calls touch only the buckets a delta hits; the default
    * ignores the hint. */
  def putKeyed(name: String, df: DataFrame, bucketKeys: Seq[String]): Unit =
    put(name, df)

  /** Rows of state `name` whose `sliceKeys` appear in `keyDf` (null-safe —
    * SQL GROUP BY treats NULL as a group). `keyDf` is assumed SMALL (it is
    * broadcast); the default scans the full state with a broadcast
    * semi-join, bucketed backends first prune to the buckets `keyDf`
    * hashes into. NOTE: bucketed backends evaluate `keyDf` EAGERLY (to
    * learn the touched buckets), so pass a cached frame when it is reused. */
  def slice(name: String, keyDf: DataFrame, sliceKeys: Seq[String]): DataFrame =
    StoreOps.semiByKeys(apply(name), keyDf, sliceKeys)

  /** Fold a batch of per-key replacements into state `name`:
    *
    *   new = (old ∖ mergeKeys(updated)) ∪ aliveFilter(updated)
    *
    * `updated` holds the complete post-batch row for EVERY touched key
    * (dead rows included — `aliveFilter` drops them). Key matching is
    * null-safe. `bucketKeys` (defaults to `mergeKeys`) must equal the
    * state's layout keys and be a prefix-subset of `mergeKeys` — e.g. a
    * MIN/MAX aux state merges on (group, value) but buckets on group only.
    * `keyHint`, when given, is a SMALL cached frame whose bucket-key rows
    * form a superset of `updated`'s — bucketed backends derive the touched
    * buckets from it instead of re-executing `updated`'s (often expensive)
    * plan. The default implementation rewrites the whole state;
    * [[ParquetStore]] rewrites only touched buckets — O(‖Δ‖ + touched
    * buckets), the property that keeps refresh ≪ recompute at 100 TB
    * state sizes. */
  def merge(
      name: String,
      updated: DataFrame,
      mergeKeys: Seq[String],
      aliveFilter: DataFrame => DataFrame,
      bucketKeys: Seq[String] = Seq.empty,
      keyHint: DataFrame = null): Unit = {
    val old = apply(name)
    val untouched = StoreOps.antiByKeys(old, updated, mergeKeys)
    putKeyed(name, untouched.unionByName(
      aliveFilter(updated).select(old.columns.map(col): _*)),
      if (bucketKeys.nonEmpty) bucketKeys else mergeKeys)
  }

  /** Run `body` atomically: either every put/merge/setTag issued inside
    * becomes visible together, or (on crash) none do. The default gives NO
    * atomicity (each op commits individually) — acceptable for the
    * in-memory store whose lifetime is the process anyway. */
  def transaction[A](body: => A): A = body

  /** Small durable key→value metadata (e.g. the last applied streaming
    * batch id). In [[ParquetStore]] tags ride the same manifest as state
    * pointers, so a tag set inside [[transaction]] commits atomically with
    * the state flips — the crash-consistency anchor for exactly-once
    * streaming replay. */
  def setTag(key: String, value: String): Unit
  def getTag(key: String): Option[String]

  def apply(name: String): DataFrame =
    get(name).getOrElse(throw new IllegalStateException(
      s"IVM state '$name' not found — was Ivm.create run for this view?"))
}

private[ivm] object StoreOps {
  private def nullSafe(l: DataFrame, r: DataFrame, keys: Seq[String]) =
    keys.map(k => l(k) <=> r(k)).reduce(_ && _)

  /** old ∖ keys(updated), null-safe, broadcasting the (small) key set. */
  def antiByKeys(old: DataFrame, updated: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.isEmpty) old.limit(0)
    else {
      val ks = broadcast(updated.select(keys.map(col): _*))
      old.join(ks, nullSafe(old, ks, keys), "left_anti")
    }

  /** state rows whose keys appear in keyDf, null-safe, keyDf broadcast. */
  def semiByKeys(state: DataFrame, keyDf: DataFrame, keys: Seq[String]): DataFrame = {
    val ks = broadcast(keyDf.select(keys.map(col): _*))
    state.join(ks, nullSafe(state, ks, keys), "left_semi")
  }
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
  private val tags = TrieMap.empty[String, String]
  override def get(name: String): Option[DataFrame] = m.get(name)
  override def put(name: String, df: DataFrame): Unit = {
    // NOTE: previous versions are intentionally never unpersisted — pending
    // lazy plans may still read them (snapshot isolation); session-lifetime
    // leak is the documented trade-off of the in-memory store.
    m.put(name, df.localCheckpoint(true))
  }
  override def setTag(key: String, value: String): Unit = tags.put(key, value)
  override def getTag(key: String): Option[String] = tags.get(key)
}

/** Bucketed, manifest-versioned parquet store — the at-scale state backend.
  *
  * Layout under `root`:
  * {{{
  *   _v<N>            manifest N (TSV): per state, bucket → segment path
  *                    and the state's bucketing keys, plus tags
  *   _current         file containing the committed manifest version N
  *   <name>/seg<N>/   segment written by version N's put/merge for <name>;
  *                    keyed segments split into __ivm_bucket=<k>/ subdirs
  * }}}
  *
  * Properties:
  *
  *   - '''Snapshot isolation''': segments are immutable; a DataFrame
  *     resolved from manifest N keeps reading N's files while N+1 commits.
  *   - '''Bucket-pruned reads''' ([[slice]]): a refresh resolves which
  *     buckets its touched keys hash to and reads ONLY those directories —
  *     the state side of a refresh is O(touched buckets), never a full
  *     scan.
  *   - '''Bucket-selective writes''' ([[merge]]): only buckets containing
  *     touched keys are rewritten — per-batch write ≈ ‖Δ‖ · state/buckets,
  *     not O(state). At cluster scale `buckets` is sized so one bucket is
  *     one executor's comfortable unit (4096 buckets over a 1 TB state ≈
  *     250 MB per touched bucket).
  *   - '''Atomic multi-state commit''' ([[transaction]]): every put/merge/
  *     setTag inside publishes with ONE atomic manifest rename — a crash
  *     mid-refresh leaves the previous manifest current and no partial
  *     state visible (the streaming batch-id tag commits with the data it
  *     describes).
  *
  * Old manifests and unreferenced segments are pruned, keeping
  * `keepVersions` manifests.
  */
final class ParquetStore(
    spark: SparkSession,
    root: String,
    keepVersions: Int = 2,
    buckets: Int = 16,
    /** States smaller than this take the single-segment path: a merge is
      * ONE whole-rewrite query (no bucket bookkeeping), which beats
      * selective rewrite until the state outgrows a single task's
      * comfortable write. Layout adapts per state as it grows/shrinks
      * across versions — size-tiered, like any LSM/lakehouse store. */
    smallStateBytes: Long = 64L << 20) extends IvmStore {

  require(buckets >= 1, "buckets must be >= 1")
  private val B = "__ivm_bucket"

  /** One state's pointer set: bucket id → segment-relative path (the key
    * [[Whole]] marks a single un-bucketed segment), plus layout keys and
    * the byte size observed when written (drives the adaptive layout). */
  private case class Entry(dirs: Map[Int, String], bucketKeys: Seq[String],
      bytes: Long)
  private val Whole = -1

  @volatile private var version: Long = 0L
  @volatile private var entries: Map[String, Entry] = Map.empty
  @volatile private var tagMap: Map[String, String] = Map.empty

  // Staged (uncommitted) edits of the open transaction. Store-level (not
  // thread-local): a refresh stages puts from its parallel state-commit
  // worker threads, and all of them must land in ONE manifest flip. One
  // open transaction per store at a time (the engine refreshes serially).
  private val txnLock = new Object
  @volatile private var txnDepth = 0
  @volatile private var txnEntries: TrieMap[String, Entry] = _
  @volatile private var txnTags: TrieMap[String, String] = _

  Files.createDirectories(Paths.get(root))
  loadCurrent()

  // ------------------------------------------------------------ manifest IO

  private def manifestPath(v: Long) = Paths.get(s"$root/_v$v")
  private def currentPath = Paths.get(s"$root/_current")

  private def loadCurrent(): Unit =
    if (Files.exists(currentPath)) {
      val v = new String(Files.readAllBytes(currentPath)).trim.toLong
      val (e, t) = readManifest(v)
      version = v; entries = e; tagMap = t
    }

  private def readManifest(v: Long): (Map[String, Entry], Map[String, String]) = {
    val dirs = TrieMap.empty[String, Map[Int, String]]
    val keys = TrieMap.empty[String, (Seq[String], Long)]
    val ts = TrieMap.empty[String, String]
    Files.readAllLines(manifestPath(v)).asScala.foreach { line =>
      line.split('\t') match {
        case Array("E", name, bucket, path) =>
          dirs.put(name, dirs.getOrElse(name, Map.empty) + (bucket.toInt -> path))
        case Array("K", name, ks, bytes) =>
          keys.put(name,
            (if (ks.isEmpty) Seq.empty else ks.split(',').toSeq, bytes.toLong))
        case Array("K", name, ks) =>
          keys.put(name, (if (ks.isEmpty) Seq.empty else ks.split(',').toSeq, 0L))
        case Array("K", name) => keys.put(name, (Seq.empty, 0L))
        case Array("T", k, value) => ts.put(k, value)
        case _                    => // blank/unknown line — ignore
      }
    }
    val es = dirs.map { case (n, d) =>
      val (ks, bytes) = keys.getOrElse(n, (Seq.empty[String], 0L))
      n -> Entry(d, ks, bytes)
    }
    (es.toMap, ts.toMap)
  }

  /** Serialize + atomically publish manifest `v`. */
  private def writeManifest(
      v: Long, es: Map[String, Entry], ts: Map[String, String]): Unit = {
    val sb = new StringBuilder
    es.foreach { case (name, e) =>
      sb.append(s"K\t$name\t${e.bucketKeys.mkString(",")}\t${e.bytes}\n")
      e.dirs.foreach { case (b, p) => sb.append(s"E\t$name\t$b\t$p\n") }
    }
    ts.foreach { case (k, value) => sb.append(s"T\t$k\t$value\n") }
    Files.write(manifestPath(v), sb.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    val tmp = Paths.get(s"$root/_current.tmp")
    Files.write(tmp, v.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // --------------------------------------------------------------- reading

  private def lookup(name: String): Option[Entry] = {
    val st = txnEntries
    val s = if (txnDepth > 0 && st != null) st.get(name) else None
    s.orElse(entries.get(name))
  }

  // Segments are immutable once published, so the resolved DataFrame for a
  // path set can be reused: skips re-listing files and re-reading parquet
  // footers on every state access (a measurable fixed cost per refresh).
  private val readMemo = TrieMap.empty[Seq[String], DataFrame]
  private def readPaths(rels: Seq[String]): DataFrame = {
    val key = rels.distinct.sorted
    readMemo.getOrElseUpdate(key,
      spark.read.parquet(key.map(rel => s"$root/$rel"): _*))
  }

  override def get(name: String): Option[DataFrame] =
    lookup(name).map(e => readPaths(e.dirs.values.toSeq))

  override def getTag(key: String): Option[String] = {
    val st = txnTags
    val s = if (txnDepth > 0 && st != null) st.get(key) else None
    s.orElse(tagMap.get(key))
  }

  private def bucketOf(keys: Seq[String]) =
    pmod(hash(keys.map(col): _*), lit(buckets))

  /** Bucket-pruned slice: hash `keyDf`'s bucket-key columns to find the
    * touched buckets, read only those directories, then semi-join on the
    * full slice keys. Falls back to a full-scan semi-join for un-bucketed
    * states or when the layout keys aren't a subset of `sliceKeys`. */
  override def slice(
      name: String, keyDf: DataFrame, sliceKeys: Seq[String]): DataFrame = {
    val e = lookup(name).getOrElse(throw new IllegalStateException(
      s"IVM state '$name' not found — was Ivm.create run for this view?"))
    val prunable = e.bucketKeys.nonEmpty && !e.dirs.contains(Whole) &&
      e.bucketKeys.forall(sliceKeys.contains)
    if (!prunable) StoreOps.semiByKeys(readPaths(e.dirs.values.toSeq), keyDf, sliceKeys)
    else {
      // dedupe driver-side: keyDf is small by contract, and skipping the
      // distinct saves a shuffle round per slice
      val touched = keyDf.select(bucketOf(e.bucketKeys).as(B))
        .collect().map(_.getInt(0)).toSet
      val paths = e.dirs.view.filterKeys(touched).values.toSeq
      if (paths.isEmpty) readPaths(e.dirs.values.toSeq).limit(0) // schema only
      else StoreOps.semiByKeys(readPaths(paths), keyDf, sliceKeys)
    }
  }

  // --------------------------------------------------------------- writing

  private def nextSegVersion(): Long = synchronized { version += 1; version }

  /** Record one state's new entry — staged if a txn is open, else
    * committed immediately as a single-op transaction. */
  private def publish(name: String, e: Entry): Unit = {
    val st = txnEntries
    if (txnDepth > 0 && st != null) st.put(name, e)
    else commit(Map(name -> e), Map.empty)
  }

  override def setTag(key: String, value: String): Unit = {
    val st = txnTags
    if (txnDepth > 0 && st != null) st.put(key, value)
    else commit(Map.empty, Map(key -> value))
  }

  private def commit(es: Map[String, Entry], ts: Map[String, String]): Unit =
    synchronized {
      version += 1
      entries = entries ++ es
      tagMap = tagMap ++ ts
      writeManifest(version, entries, tagMap)
      prune()
    }

  /** Reentrant: a transaction opened inside another stages into the outer
    * one, so `applyBatch { refresh { … }; setTag }` flips once. */
  override def transaction[A](body: => A): A = {
    val isOuter = txnLock.synchronized {
      if (txnDepth == 0) { txnEntries = TrieMap.empty; txnTags = TrieMap.empty }
      txnDepth += 1
      txnDepth == 1
    }
    try {
      val r = body
      if (isOuter) commit(txnEntries.toMap, txnTags.toMap)
      r
    } finally txnLock.synchronized {
      txnDepth -= 1
      if (txnDepth == 0) { txnEntries = null; txnTags = null }
    }
  }

  private def segDir(name: String, v: Long) = s"$name/seg$v"

  /** Bytes under a written segment (drives the adaptive layout choice). */
  private def dirBytes(rel: String): Long = {
    def sz(p: Path): Long =
      if (Files.isDirectory(p)) listDir(p).map(sz).sum
      else Files.size(p)
    sz(Paths.get(s"$root/$rel"))
  }

  private def putPlain(name: String, df: DataFrame, keys: Seq[String]): Unit = {
    val rel = segDir(name, nextSegVersion())
    df.write.mode("overwrite").parquet(s"$root/$rel")
    publish(name, Entry(Map(Whole -> rel), keys, dirBytes(rel)))
  }

  override def put(name: String, df: DataFrame): Unit =
    putPlain(name, df, Seq.empty)

  override def putKeyed(name: String, df: DataFrame, bucketKeys: Seq[String]): Unit =
    if (bucketKeys.isEmpty || buckets == 1) putPlain(name, df, bucketKeys)
    else lookup(name) match {
      case Some(e) if e.bytes < smallStateBytes =>
        // known-small state: single segment, merges take the 1-query path
        putPlain(name, df, bucketKeys)
      case _ =>
        // unknown (first create) or large: bucketed layout for selective
        // merges and pruned slices
        val rel = segDir(name, nextSegVersion())
        df.withColumn(B, bucketOf(bucketKeys))
          .write.partitionBy(B).mode("overwrite").parquet(s"$root/$rel")
        val found = discoverBuckets(rel)
        // a zero-row state writes no bucket dirs; fall back to a plain
        // empty segment so the schema stays readable
        if (found.isEmpty) putPlain(name, df.limit(0), bucketKeys)
        else publish(name, Entry(found, bucketKeys, dirBytes(rel)))
    }

  /** Bucket subdirectories actually written by a partitionBy job (empty
    * buckets produce no directory). */
  private def discoverBuckets(rel: String): Map[Int, String] = {
    listDir(Paths.get(s"$root/$rel"))
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$B="))
      .map { p =>
        p.getFileName.toString.stripPrefix(s"$B=").toInt -> s"$rel/${p.getFileName}"
      }.toMap
  }

  /** Bucket-selective merge: rewrites only buckets containing touched keys.
    * States not yet bucketed (or merged without keys) fall back to the
    * whole-state rewrite, which re-lays them out bucketed for next time. */
  override def merge(
      name: String,
      updated: DataFrame,
      mergeKeys: Seq[String],
      aliveFilter: DataFrame => DataFrame,
      bucketKeys: Seq[String] = Seq.empty,
      keyHint: DataFrame = null): Unit = {
    val bKeys = if (bucketKeys.nonEmpty) bucketKeys else mergeKeys
    val e = lookup(name).getOrElse(throw new IllegalStateException(
      s"IVM state '$name' not found — was Ivm.create run for this view?"))
    if (mergeKeys.isEmpty || buckets == 1 || e.bytes < smallStateBytes ||
        e.dirs.contains(Whole) || e.bucketKeys != bKeys) {
      // small state (or layout mismatch): ONE whole-rewrite query; putKeyed
      // re-decides the layout, so a state that grows past the threshold
      // converts to bucketed on its next write
      super.merge(name, updated, mergeKeys, aliveFilter, bKeys, keyHint)
    } else {
      // Touched buckets from the cheap keyHint when provided (a cached
      // superset of updated's keys — a superset only costs rewriting an
      // extra bucket unchanged, never correctness); otherwise pin
      // `updated` and derive them from it.
      val (touched, pinned) = Ivm.timed(s"m.touched $name") {
        if (keyHint != null)
          (keyHint.select(bucketOf(bKeys).as(B)).collect().map(_.getInt(0)).toSet,
            None)
        else {
          val up = updated.withColumn(B, bucketOf(bKeys)).cache()
          (up.select(B).collect().map(_.getInt(0)).toSet, Some(up))
        }
      }
      try {
        if (touched.isEmpty) return // empty batch — state unchanged
        val src = pinned.map(_.drop(B)).getOrElse(updated)
        val oldPaths = e.dirs.view.filterKeys(touched).values.toSeq
        val newRows = {
          val alive = aliveFilter(src)
          if (oldPaths.isEmpty) alive
          else {
            val old = Ivm.timed(s"m.read $name")(readPaths(oldPaths))
            StoreOps.antiByKeys(old, src, mergeKeys)
              .unionByName(alive.select(old.columns.map(col): _*))
          }
        }
        val rel = segDir(name, nextSegVersion())
        Ivm.timed(s"m.write $name")(newRows.withColumn(B, bucketOf(bKeys))
          .write.partitionBy(B).mode("overwrite").parquet(s"$root/$rel"))
        val written = discoverBuckets(rel)
        // touched buckets move to the new segment (or vanish if now empty);
        // untouched buckets keep their old paths
        val merged = (e.dirs -- touched) ++
          touched.flatMap(b => written.get(b).map(b -> _))
        if (merged.isEmpty) putPlain(name, newRows.limit(0), bKeys)
        else publish(name,
          Entry(merged, bKeys, merged.values.toSeq.distinct.map(dirBytes).sum))
      } finally pinned.foreach(_.unpersist())
    }
  }

  // --------------------------------------------------------------- pruning

  /** Delete manifests older than the keepVersions window and segments no
    * retained manifest references. Called under `synchronized`. */
  private def prune(): Unit = {
    val keepFrom = version - keepVersions + 1
    val kept = (keepFrom to version).filter(v => Files.exists(manifestPath(v)))
    val referenced: Set[String] = kept.flatMap { v =>
      val es = if (v == version) entries else readManifest(v)._1
      es.values.flatMap(_.dirs.values).map(segRoot)
    }.toSet
    // drop old manifest files
    listDir(Paths.get(root)).foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("_v") && n.drop(2).forall(_.isDigit) && n.drop(2).toLong < keepFrom)
        Files.deleteIfExists(p)
    }
    // drop unreferenced segment dirs (state names may nest: "view/r.aux.x")
    def walk(dir: Path, rel: String): Unit =
      listDir(dir).filter(Files.isDirectory(_)).foreach { child =>
        val n = child.getFileName.toString
        val childRel = if (rel.isEmpty) n else s"$rel/$n"
        if (n.startsWith("seg") && n.drop(3).forall(_.isDigit)) {
          if (!referenced.contains(childRel)) deleteRecursively(child)
        } else walk(child, childRel)
      }
    walk(Paths.get(root), "")
    readMemo.filterInPlace((k, _) => k.forall(rel => referenced.contains(segRoot(rel))))
  }

  private def segRoot(rel: String): String = {
    val i = rel.indexOf(s"/$B=")
    if (i >= 0) rel.substring(0, i) else rel
  }

  private def listDir(p: Path): Seq[Path] = {
    if (!Files.isDirectory(p)) return Seq.empty
    val s = Files.list(p)
    try s.iterator.asScala.toList finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
