package graft.ivm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap
import scala.util.Try

/** Public API of the IVM engine — the Spark-native analogue of the
  * reference's three entry points (SURVEY.md §3):
  *
  *   - [[upsert]]      ≙ `PRAGMA ivm_upsert(cat, schema, view)`
  *                       (ivm_extension.cpp:95-110): compute delta_V,
  *                       append it to the `delta_<view>` table, return it.
  *   - [[delta]]       ≙ `SELECT * FROM DoIVM(...)` (ivm_extension.cpp:45-93):
  *                       just the rewritten delta query.
  *   - [[createView]]  ≙ `CREATE IMMV AS <select>` (ivm_parser.cpp:14-84),
  *                       which the reference recognizes but never finishes —
  *                       here it actually registers the view.
  *
  * Plus the half the reference leaves as future work (poster "upsert ΔV"
  * bullets): [[create]] materializes a view and its interior aggregate
  * states into an [[IvmStore]], and [[refresh]] merges a batch of base-table
  * deltas into them incrementally — O(‖Δ‖) work, never rescanning bases
  * except for the delta-join terms that stream them with pushdown.
  */
object Ivm {
  import IvmCore._

  // State materializations (create seeds, refresh pins/commits) are
  // independent per state path; running them as concurrent Spark jobs
  // hides per-job scheduling latency — a view with MIN/MAX aux states
  // otherwise serializes ~4x more tiny jobs per refresh.
  private implicit val statePool: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(8, r => {
        val t = new Thread(r, "ivm-state"); t.setDaemon(true); t
      }))

  private def inParallel[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
  }

  // ------------------------------------------------------------ catalog

  private val views = TrieMap.empty[String, IvmQuery]

  /** Register a view definition (EP3 intent — ivm_parser.cpp:49-51). */
  def createView(name: String, q: IvmQuery): Unit = views.put(name, q)

  def viewDef(name: String): IvmQuery =
    views.getOrElse(name, throw new IllegalArgumentException(
      s"IVM: view '$name' is not registered"))

  // --------------------------------------------- reference-parity surface

  /** Resolve base tables from the session catalog (temp views / tables). */
  private def sessionBase(spark: SparkSession): String => DataFrame =
    t => spark.table(t)

  /** Resolve `delta_<t>` from the session catalog if present. */
  private def sessionDelta(spark: SparkSession): String => Option[DataFrame] =
    t => Try(spark.table(deltaTableName(t))).toOption

  /** EP2 parity: the delta query of a registered view, reference boolean
    * multiplicity semantics (one row per (group, ±), never merged). */
  def delta(spark: SparkSession, view: String): DataFrame =
    ParityDelta.delta(viewDef(view), sessionDelta(spark))

  /** EP1 parity: compute delta_V and register it as the temp view
    * `delta_<view>` (the reference materializes a table,
    * ivm_extension.cpp:100-104; in Spark a temp view keeps the pipeline
    * write-free — callers persist where they choose). Returns delta_V. */
  def upsert(spark: SparkSession, view: String): DataFrame = {
    val dv = delta(spark, view)
    dv.createOrReplaceTempView(deltaTableName(view))
    dv
  }

  // ----------------------------------------- materialize + refresh (ours)

  /** State name for an aggregate node path within a view. */
  private def stateName(view: String, path: String) = s"$view/$path"
  private val TOP = "top"

  /** Materialize the view: every interior Aggregate state (bottom-up) plus
    * the view's own rows. For a view whose top is an Aggregate the top
    * state doubles as the view (with hidden bookkeeping columns stripped on
    * read); otherwise the view rows are stored as a weighted multiset. */
  def create(
      view: String,
      q: IvmQuery,
      base: String => DataFrame,
      store: IvmStore): DataFrame = {
    // Materialize every aggregate node's state. Seeds at one level are
    // independent → parallel puts; levels still commit bottom-up (a level's
    // eval only READS base tables, so even that ordering is conservative).
    def walk(node: IvmQuery, path: String): Seq[(String, () => DataFrame)] = node match {
      case a @ Aggregate(c, _, _) =>
        walk(c, path + ".0") ++
          Seq((stateName(view, path), () => Eval.evalState(a, base))) ++
          a.aggs.filter(AggSpec.needsAux).map { spec =>
            (stateName(view, s"$path.aux.${spec.name}"),
              () => Eval.evalAuxState(a, spec, base))
          }
      case Filter(c, _)  => walk(c, path + ".0")
      case Project(c, _) => walk(c, path + ".0")
      case Join(l, r, _) => walk(l, path + ".0") ++ walk(r, path + ".1")
      case lj @ LeftJoin(l, r, keys) =>
        walk(l, path + ".0") ++ walk(r, path + ".1") :+
          ((stateName(view, s"$path.rcnt"), () =>
            Eval.eval(r, base).groupBy(keys.map(col): _*)
              .agg(count(lit(1)).as(HCOUNT))))
      case Scan(_)       => Seq.empty
    }
    inParallel(walk(q, "r")) { case (name, mk) => store.put(name, mk()) }
    q match {
      case _: Aggregate => () // top state IS the view
      case _ =>
        // SPJ view: store rows + multiset count (Z-set canonical form).
        val rows = Eval.eval(q, base)
        store.put(stateName(view, TOP),
          rows.groupBy(rows.columns.map(col): _*).agg(count(lit(1)).as(HCOUNT)))
    }
    read(view, q, store)
  }

  /** Current contents of a materialized view. */
  def read(view: String, q: IvmQuery, store: IvmStore): DataFrame = q match {
    case Aggregate(_, keys, aggs) =>
      store(stateName(view, "r"))
        .select((keys.map(col) ++ aggs.map(Eval.stateOutput)): _*)
    case _ =>
      val st = store(stateName(view, TOP))
      expandMultiset(st, HCOUNT)
  }

  /** Expand (row, count) back into `count` copies of `row`. */
  private def expandMultiset(df: DataFrame, countCol: String): DataFrame = {
    val cols = df.columns.filterNot(_ == countCol).toSeq
    df.withColumn("__ivm_dup",
        explode(array_repeat(lit(1), col(countCol).cast("int"))))
      .select(cols.map(col): _*)
  }

  /** Incrementally fold one batch of base-table deltas into the
    * materialized view. Returns ΔV with the signed WEIGHT column.
    *
    * Pipeline: compute ΔV (queuing interior state updates) → materialize
    * every update eagerly (all reads of old state happen before any write;
    * [[IvmStore.put]] additionally guarantees snapshot isolation) → commit
    * updates bottom-up → merge the top multiset for SPJ views. */
  def refresh(
      view: String,
      q: IvmQuery,
      base: String => DataFrame,
      deltas: String => Option[DataFrame],
      store: IvmStore,
      broadcastDeltas: Boolean = true): DataFrame =
    doRefresh(view, q, base, deltas, store, broadcastDeltas, needDelta = true)

  /** [[refresh]] without materializing ΔV — for callers that only read the
    * maintained view afterwards (the common steady-state loop). For an
    * Aggregate-top view the output changelog is pure derivation from the
    * cached state join, so skipping it saves the largest job per batch.
    * SPJ-top views still need ΔV (it IS the state merge input). */
  def refreshState(
      view: String,
      q: IvmQuery,
      base: String => DataFrame,
      deltas: String => Option[DataFrame],
      store: IvmStore,
      broadcastDeltas: Boolean = true): Unit = {
    doRefresh(view, q, base, deltas, store, broadcastDeltas,
      needDelta = !q.isInstanceOf[Aggregate])
    ()
  }

  private def doRefresh(
      view: String,
      q: IvmQuery,
      base: String => DataFrame,
      deltas: String => Option[DataFrame],
      store: IvmStore,
      broadcastDeltas: Boolean,
      needDelta: Boolean): DataFrame = {
    val ctx = ZDelta.Ctx(base, deltas, p => store(stateName(view, p)),
      broadcastDeltas)
    val dv0 = ZDelta.delta(q, ctx)
    val dv = if (needDelta) {
      val c = dv0.cache(); c.count(); c // pin ΔV before any state mutates
    } else dv0 // interior state updates are pinned below; ΔV never forced

    // Pin EVERY pending state update before committing ANY: all reads of
    // old state must happen before the first write replaces it. Pins are
    // independent (distinct state paths) → concurrent jobs; ditto commits.
    val pinned = inParallel(ctx.updates.toSeq) { u =>
      val c = u.updated.cache(); c.count(); u.copy(updated = c)
    }
    inParallel(pinned) { u =>
      val old = store(stateName(view, u.path))
      val untouched =
        if (u.keys.isEmpty) old.limit(0)
        else ZDelta.filterByKeys(old, u.updated, u.keys,
          anti = true, hint = broadcast) // null-safe: NULL group keys must match their state row
      val alive =
        if (u.keys.isEmpty) u.updated // global agg state always 1 row
        else u.updated.where(col(HCOUNT) > 0)
      store.put(stateName(view, u.path),
        untouched.unionByName(alive.select(old.columns.map(col): _*)))
    }

    // SPJ views: fold ΔV into the stored multiset.
    q match {
      case _: Aggregate => ()
      case _ =>
        val st = store(stateName(view, TOP))
        val cols = st.columns.filterNot(_ == HCOUNT).toSeq
        val merged = st
          .unionByName(dv.withColumnRenamed(WEIGHT, HCOUNT))
          .groupBy(cols.map(col): _*)
          .agg(sum(HCOUNT).as(HCOUNT))
          .where(col(HCOUNT) > 0)
        store.put(stateName(view, TOP), merged)
    }
    pinned.foreach(_.updated.unpersist())
    ctx.pins.foreach(_.unpersist())
    dv
  }

  /** Full-recompute equivalent of the maintained view — used by tests and
    * the self-check oracle: refresh(...) must leave read(...) equal to
    * eval over (base ⊎ delta). */
  def recompute(
      q: IvmQuery,
      base: String => DataFrame,
      deltas: String => Option[DataFrame]): DataFrame = {
    val merged: String => DataFrame = t => deltas(t) match {
      case None => base(t)
      case Some(d) =>
        // multiset apply at the scan: base ⊎ inserts ∖ deletes
        val b = base(t)
        val withW = ZDelta.weighted(d)
        val all = b.withColumn(WEIGHT, lit(1)).unionByName(withW)
        val cols = b.columns.toSeq
        val counted = all.groupBy(cols.map(col): _*)
          .agg(sum(WEIGHT).as(WEIGHT)).where(col(WEIGHT) > 0)
        expandMultiset(counted, WEIGHT)
    }
    Eval.eval(q, merged)
  }
}
