package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference engine family lists as classic
  * analytics surface (SURVEY.md §2.2 joins row: range/as-of/interval) but
  * implements nowhere — expressed Spark-first so they scale:
  *
  *   - [[asOfJoin]]: MERGE the two inputs and resolve "latest right row at
  *     or before each left row" with ONE window pass per key — a single
  *     shuffle on the key columns, no join explosion, no per-row probe.
  *   - [[rangeJoin]]: point-in-interval via TIME CHUNKING — intervals
  *     explode to the (bounded) set of chunks they overlap, points
  *     equi-join their single chunk, and the exact band predicate filters
  *     inside the join. The theta-join becomes an equi-join, so Spark
  *     shuffles on (keys, chunk) instead of building a cartesian product.
  *
  * 100 TB notes: both ops shuffle once on high-cardinality keys (as-of:
  * the join keys; range: keys × time-chunk, which spreads even a keyless
  * band join across the cluster). Chunk size should be ≥ the max interval
  * length so each interval lands in ≤ 2 chunks; skewed hot chunks are
  * handled by AQE skew-join splitting since the band filter lives in the
  * join condition.
  */
object Temporal {

  private val SIDE = "__asof_side"
  private val TS = "__asof_ts"

  /** As-of join: for each left row, attach per `keys`:
    *
    *   - `<prefix>ts`: the greatest `rightTs` ≤ the left row's `leftTs`
    *     (null when no right row precedes it),
    *   - `<prefix>n`: how many right rows are at or before it,
    *   - `<prefix><p>` for each payload column `p`: the value carried by
    *     the latest preceding right row (rows tied on timestamp resolve
    *     by payload order, so the result is deterministic).
    *
    * Inclusive semantics (`rightTs <= leftTs`), matching SQL ASOF JOIN
    * with `ON l.k = r.k AND r.ts <= l.ts`. */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String] = Seq.empty,
      prefix: String = "asof_"): DataFrame = {
    val leftRest = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val rSchema = right.schema
    val lSchema = left.schema
    def nullAs(df: String => org.apache.spark.sql.types.DataType, c: String) =
      lit(null).cast(df(c))
    val l = left.select(
      (keys.map(col) :+ col(leftTs).cast("long").as(TS) :+ lit(1).as(SIDE)) ++
        leftRest.map(col) ++
        payload.map(p => nullAs(n => rSchema(n).dataType, p).as(p)): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).cast("long").as(TS) :+ lit(0).as(SIDE)) ++
        leftRest.map(c => nullAs(n => lSchema(n).dataType, c).as(c)) ++
        payload.map(col): _*)
    // right rows sort BEFORE left rows at equal timestamps → inclusive;
    // payload columns break remaining ties deterministically
    val order = (col(TS).asc +: col(SIDE).asc +: payload.map(col(_).asc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isR = col(SIDE) === 0
    val out = l.unionByName(r)
      .withColumn(s"${prefix}ts", max(when(isR, col(TS))).over(w))
      .withColumn(s"${prefix}n", count(when(isR, lit(1))).over(w))
    val withPayload = payload.foldLeft(out)((df, p) =>
      df.withColumn(s"$prefix$p", last(when(isR, col(p)), ignoreNulls = true).over(w)))
    withPayload.where(col(SIDE) === 1)
      .select((keys.map(col) :+ col(TS).as(leftTs)) ++ leftRest.map(col) ++
        (Seq(s"${prefix}ts", s"${prefix}n") ++ payload.map(p => s"$prefix$p"))
          .map(col): _*)
  }

  private val CHUNK = "__rj_chunk"

  /** Point-in-interval (range/interval/band) join: rows of `points` paired
    * with every `intervals` row whose `[startCol, endCol]` contains the
    * point's `pointTs` (inclusive), matching on `keys` null-safely when
    * given. Interval columns come back prefixed with `prefix` (key columns
    * dropped), so self-joins stay unambiguous.
    *
    * `chunk` is the time-chunk width in the timestamp's own unit; choose
    * it ≥ the longest interval so each interval explodes to ≤ 2 chunks.
    * Chunk ids use integer division — nanosecond timestamps exceed a
    * double's 2^53 mantissa, so no floating-point arithmetic here. */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startCol: String,
      endCol: String,
      chunk: Long,
      keys: Seq[String] = Seq.empty,
      joinType: String = "inner",
      prefix: String = "r_"): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    val p = points.withColumn(CHUNK, expr(s"`$pointTs` DIV ${chunk}L"))
    val iv = intervals.select(intervals.columns.map(c => col(c).as(s"$prefix$c")): _*)
      .withColumn(s"$prefix$CHUNK",
        explode(sequence(expr(s"`$prefix$startCol` DIV ${chunk}L"),
          expr(s"`$prefix$endCol` DIV ${chunk}L"))))
    val cond = (keys.map(k => col(k) <=> col(s"$prefix$k")) :+
      (col(CHUNK) === col(s"$prefix$CHUNK")) :+
      (col(pointTs) >= col(s"$prefix$startCol")) :+
      (col(pointTs) <= col(s"$prefix$endCol"))).reduce(_ && _)
    p.join(iv, cond, joinType)
      .drop(CHUNK, s"$prefix$CHUNK")
      .drop(keys.map(k => s"$prefix$k"): _*)
  }
}
