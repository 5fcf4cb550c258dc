package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ivm._

/** Continuous view maintenance on Structured Streaming — the Spark-native
  * generalization of the reference's poll-driven `PRAGMA ivm_upsert` loop
  * (reference ivm_extension.cpp:95-110 recomputes delta_V on demand; here
  * every arriving micro-batch of delta rows folds into the materialized
  * view automatically).
  *
  * Two modes:
  *
  *  1. [[maintain]] — foreachBatch + [[Ivm.refresh]]: each micro-batch is
  *     treated as one delta table (schema = base schema + boolean
  *     `_duckdb_ivm_multiplicity`), so the FULL engine surface (joins,
  *     multi-level aggregates, the store) works unchanged. State lives in
  *     the [[IvmStore]] (versioned parquet at scale). Checkpoint replay is
  *     deduplicated: the last applied batch id is recorded in the store,
  *     so a re-delivered micro-batch is skipped (effectively-once).
  *
  *  2. [[statefulAgg]] — pure Structured Streaming stateful aggregation
  *     for single-level Aggregate(Scan) views: `groupBy(keys).agg(sum(e*w))`
  *     with update output mode. Spark's own state store IS the maintained
  *     view; each micro-batch emits exactly the changed view rows (ΔV
  *     assertions) — the shape named in the project baseline
  *     ("Structured Streaming + stateful aggregation"). Watermarking on an
  *     event-time column bounds state for windowed variants.
  */
object IvmStream {
  import IvmCore._

  /** Fold a stream of delta rows for base table `table` into the
    * materialized view `view` (created beforehand via [[Ivm.create]]).
    *
    * @param deltaStream streaming DataFrame: base columns + MULT boolean.
    */
  def maintain(
      view: String,
      q: IvmQuery,
      table: String,
      base: String => DataFrame,
      store: IvmStore,
      deltaStream: DataFrame,
      checkpoint: String): StreamingQuery =
    deltaStream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch(applyBatch(view, q, table, base, store) _)
      .start()

  /** Multi-stream maintenance: one [[maintain]] query per fed base table,
    * all folding into the same view on the same store. Requires a
    * TRANSACTIONAL store ([[ParquetStore]]): whole-refresh transactions
    * serialize the concurrent commits, per-(view, table) markers keep
    * replay dedupe independent, and the per-table delta accumulators make
    * each stream's batches visible to the others' join terms. Create the
    * view with `deltaTables = streams.keySet` first. Returns one query
    * per table; stop them all to stop maintenance. */
  def maintainMulti(
      view: String,
      q: IvmQuery,
      base: String => DataFrame,
      store: IvmStore,
      streams: Map[String, DataFrame],
      checkpointRoot: String): Map[String, StreamingQuery] =
    streams.map { case (table, deltaStream) =>
      table -> maintain(view, q, table, base, store, deltaStream,
        s"$checkpointRoot/$table")
    }

  /** One micro-batch application with replay dedupe — foreachBatch is
    * at-least-once under failure/restart; the store remembers the last
    * applied id so a re-delivered batch is a no-op. Public so replay
    * behavior is testable without engineering a mid-batch crash.
    *
    * Crash consistency: the batch-id marker is a store TAG set inside the
    * same [[IvmStore.transaction]] as the refresh, so on [[ParquetStore]]
    * the marker and every state flip publish in ONE atomic manifest
    * rename. A crash mid-refresh leaves the previous manifest current —
    * the replayed batch re-applies onto untouched state, never onto a
    * partial commit. */
  def applyBatch(
      view: String,
      q: IvmQuery,
      table: String,
      base: String => DataFrame,
      store: IvmStore)(batch: DataFrame, batchId: Long): Unit = {
    // Marker is per (view, base table): several streams may maintain the
    // same view — one per delta'd base table — and each streaming query
    // numbers its own batches independently.
    val marker = s"$view/_last_batch/$table"
    val last = store.getTag(marker).map(_.toLong).getOrElse(-1L)
    if (batchId > last && !batch.isEmpty) {
      val deltas: String => Option[DataFrame] =
        t => if (t == table) Some(batch) else None
      store.transaction {
        Ivm.refreshState(view, q, base, deltas, store)
        store.setTag(marker, batchId.toString)
      }
    }
  }

  /** Weighted stateful streaming aggregation: the update-mode changelog of
    * the maintained view for a single-level aggregate over one stream.
    * SUM/COUNT become `sum(e·w)` / `sum(w)` with w = ±1 — deletions just
    * work; Spark keeps the running state per group. */
  def statefulAgg(
      deltaStream: DataFrame,
      keys: Seq[String],
      aggs: Seq[AggSpec]): DataFrame = {
    val w = when(col(MULT), lit(1)).otherwise(lit(-1))
    val exprs = aggs.map {
      case AggSpec.Sum(e, n)    => sum(e * w).as(n)
      case AggSpec.Count(e, n)  => sum(when(e.isNotNull, w).otherwise(lit(0))).cast("long").as(n)
      case AggSpec.CountStar(n) => sum(w).cast("long").as(n)
      case AggSpec.Avg(e, n)    => (sum(e * w) / sum(when(e.isNotNull, w).otherwise(lit(0)))).as(n)
      // Variance family: moments are linear in w, so the running state is
      // three weighted sums — retraction-safe without multiset state.
      case a if AggSpec.isMoment2(a) =>
        val e = AggSpec.expr(a).get.cast("double")
        graft.ivm.Eval.momentOutput(a, sum(e * w), sum(e * e * w),
          sum(when(e.isNotNull, w).otherwise(lit(0)))).as(a.name)
      case a if AggSpec.isMomentXY(a) =>
        val (gx, gy) = AggSpec.xyGuarded(a)
        graft.ivm.Eval.momentXYOutput(a, sum(gx * w), sum(gy * w),
          sum(gx * gy * w), sum(gx * gx * w), sum(gy * gy * w),
          sum(when(gx.isNotNull, w).otherwise(lit(0)))).as(a.name)
      // BOOL_AND/OR: both counts are linear in w — same two-signed-count
      // formula as the batch engine (Eval): and = (trueCnt == nn).
      case AggSpec.BoolAnd(e, n) =>
        val tc = sum(when(e === true, w).otherwise(lit(0)))
        val nn = sum(when(e.isNotNull, w).otherwise(lit(0)))
        when(nn > 0, tc === nn).as(n)
      case AggSpec.BoolOr(e, n) =>
        val tc = sum(when(e === true, w).otherwise(lit(0)))
        val nn = sum(when(e.isNotNull, w).otherwise(lit(0)))
        when(nn > 0, tc > 0).as(n)
      // Insert-only sketch aggregates: Spark's streaming state carries the
      // aggregation buffer (HLL registers / KLL compactors) across batches,
      // so the sketch itself IS the running state. Registers cannot un-see
      // a value — a retraction row fails the query loudly (assert_true)
      // instead of silently under-counting, the same contract as the batch
      // refresh path.
      case AggSpec.ApproxCountDistinct(e, lgK, n) =>
        hll_sketch_estimate(hll_sketch_agg(insertOnly(e), lgK)).as(n)
      case AggSpec.ApproxPercentile(e, p, k, n) =>
        graft.functions.Kll.quantile(
          graft.functions.Kll.agg(insertOnly(e.cast("double")), k), p).as(n)
      case AggSpec.ApproxTopK(e, k, m, n) =>
        graft.functions.Freq.topK(
          graft.functions.Freq.agg(insertOnly(e.cast("string")), m), k).as(n)
      // INSERT-ONLY extremum: the running min/max IS the agg buffer — no
      // multiset state, same append-only contract as the sketches above.
      // A retraction row raises (extrema cannot un-see a value); feeds
      // that retract use statefulMinMax or foreachBatch maintain().
      case a if AggSpec.isExtremum(a) =>
        val e = insertOnly(AggSpec.expr(a).get,
          "streaming MIN/MAX/MIN_BY/MAX_BY are insert-only — an extremum " +
            "cannot un-see a retracted value without multiset state; use " +
            "statefulMinMax or the foreachBatch maintain() mode when the " +
            "feed retracts")
        val ext = if (AggSpec.isLowEnd(a)) min(e) else max(e)
        (a match {
          case _: AggSpec.MinBy | _: AggSpec.MaxBy =>
            ext.getField(AggSpec.PairA)
          case _ => ext
        }).as(a.name)
      case AggSpec.CountDistinct(_, _) | AggSpec.SumDistinct(_, _) =>
        throw new UnsupportedOperationException(
          "DISTINCT aggregates need multiset state (and Spark disallows " +
            "them in streaming aggregations); use the foreachBatch " +
            "maintain() mode, which supports them under retraction too")
    }
    if (keys.isEmpty) deltaStream.agg(exprs.head, exprs.tail: _*)
    else deltaStream.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** `e` where the row is an insert; raises `what` on a retraction row
    * without needing to know `e`'s type (assert_true is NULL on pass, so
    * the guard branch keeps the value branch's type). The message is
    * per-aggregate-family so a MIN/MAX failure points at statefulMinMax,
    * not at the sketches. */
  private def insertOnly(
      e: org.apache.spark.sql.Column,
      what: String =
        "streaming sketch aggregates are insert-only — a retraction " +
          "cannot fold into HLL/KLL registers; use the foreachBatch " +
          "maintain() mode with exact aggregates when the feed retracts") =
    when(assert_true(col(MULT), lit(what)).isNull, e)

  /** Per-group output of [[statefulMinMax]]. */
  final case class MinMaxUpdate(
      key: String, min: Option[Double], max: Option[Double], count: Long)

  /** Streaming MIN/MAX under retraction — the case [[statefulAgg]] cannot
    * express with weighted sums: deleting the current extremum must fall
    * back to the runner-up, which needs a value multiset per group. Uses
    * `flatMapGroupsWithState` with a (value → count) map as custom state —
    * the batch engine keeps this multiset in the [[graft.ivm.IvmStore]]
    * (ZDelta aux state); here Spark's state store keeps it per group.
    *
    * Input schema: key STRING, v DOUBLE, `_duckdb_ivm_multiplicity` BOOL.
    * Emits one [[MinMaxUpdate]] per touched group per micro-batch
    * (count == 0 ⇒ the group died). Update output mode.
    */
  def statefulMinMax(deltaStream: DataFrame, keyCol: String, valCol: String): org.apache.spark.sql.Dataset[MinMaxUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = deltaStream.sparkSession
    import spark.implicits._
    val rows = deltaStream.select(
      col(keyCol).cast("string"), col(valCol).cast("double"), col(MULT))
      .as[(String, Double, Boolean)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Double, Long], MinMaxUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, batch, state: GroupState[Map[Double, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Double, Long])
          batch.foreach { case (_, v, isInsert) =>
            val d = if (isInsert) 1L else -1L
            val n = m.getOrElse(v, 0L) + d
            m = if (n == 0L) m - v else m.updated(v, n)
          }
          if (m.isEmpty) state.remove() else state.update(m)
          val alive = m.filter(_._2 > 0L)
          Iterator.single(MinMaxUpdate(key,
            alive.keys.minOption, alive.keys.maxOption, alive.values.sum))
      }
  }

  /** Per-group output of [[statefulAggTtl]]: the running (sum, count) of
    * the group, or its tombstone (`expired = true`, count 0) when the TTL
    * reclaimed the state. */
  final case class TtlAggUpdate(
      key: String, sum: Option[Double], count: Long, expired: Boolean)

  /** Weighted running aggregate with EVENT-TIME TTL state eviction — the
    * 100 TB knob for UNBOUNDED key domains that [[statefulAgg]] (a plain
    * streaming groupBy, whose state store grows with every distinct key
    * forever) and [[windowedAgg]] (watermark eviction, but only for
    * window-keyed groups) cannot cover: session/user/document keys that
    * keep arriving but individually go cold.
    *
    * State per group is the linear (Σv·w, non-null count, Σw) triple;
    * each batch folds its weighted rows and re-arms an event-time timeout
    * at (group's max observed event time + ttl). Once the stream's
    * watermark passes that, Spark reclaims the state and one tombstone row
    * (`expired = true`) is emitted — downstream sinks can drop the group.
    * A key recurring AFTER expiry restarts from zero: eviction is a
    * deliberate forget, the same contract as any TTL'd state store.
    *
    * Input schema: key STRING, v DOUBLE, ts TIMESTAMP, MULT BOOLEAN.
    * Update output mode; requires the returned query's sink to accept
    * updates. */
  def statefulAggTtl(
      deltaStream: DataFrame,
      keyCol: String,
      valCol: String,
      tsCol: String,
      watermarkDelay: String,
      ttlMillis: Long): org.apache.spark.sql.Dataset[TtlAggUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = deltaStream.sparkSession
    import spark.implicits._
    // cast BEFORE the watermark: re-projecting the event-time column after
    // withWatermark strips the watermark tag and fails analysis
    val rows = deltaStream
      .select(col(keyCol).cast("string"), col(valCol).cast("double"),
        col(tsCol).cast("timestamp").as(tsCol), col(MULT))
      .withWatermark(tsCol, watermarkDelay)
      .as[(String, Option[Double], java.sql.Timestamp, Boolean)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Long, Long), TtlAggUpdate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, batch, state: GroupState[(Double, Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single(TtlAggUpdate(key, None, 0L, expired = true))
          } else {
            var (sum, nn, n) = state.getOption.getOrElse((0d, 0L, 0L))
            var maxTs = Long.MinValue
            batch.foreach { case (_, v, ts, isInsert) =>
              val w = if (isInsert) 1L else -1L
              v.foreach { x => sum += x * w; nn += w }
              n += w
              if (ts != null) maxTs = math.max(maxTs, ts.getTime)
            }
            state.update((sum, nn, n))
            // re-arm: the group lives ttl past its newest event. Timeout
            // timestamps must stay ahead of the current watermark — clamp
            // to watermark + 1ms for a batch of only-late rows.
            val arm = math.max(
              if (maxTs == Long.MinValue) 0L else maxTs + ttlMillis,
              state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(arm)
            Iterator.single(TtlAggUpdate(key,
              if (nn > 0) Some(sum) else None, n, expired = false))
          }
      }
  }

  /** Event-time tumbling-window aggregation with watermark-bounded state —
    * the streaming form of the `q29_events_hourly` batch query. Late rows
    * beyond `watermarkDelay` are dropped and their state reclaimed: the
    * 100 TB knob that keeps unbounded streams bounded. */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowLen: String,
      keys: Seq[String],
      aggExprs: Seq[org.apache.spark.sql.Column]): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowLen) +: keys.map(col)): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
}
