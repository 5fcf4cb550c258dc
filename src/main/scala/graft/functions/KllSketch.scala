package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** KLL quantile-sketch functions (Apache DataSketches — the same library
  * backing Spark's built-in `hll_sketch_agg` family, which has no quantile
  * counterpart). They give maintained APPROX_PERCENTILE its state:
  *
  *  - [[KllSketchAgg]] `graft_kll_agg(e, k)` — aggregates doubles into a
  *    serialized KLL sketch (~`k` retained items regardless of input size);
  *  - [[KllMerge]] `graft_kll_merge(a, b)` — merges two serialized
  *    sketches (how a batch's sketch folds into the stored state);
  *  - [[KllQuantile]] `graft_kll_quantile(s, p)` — reads the p-quantile
  *    estimate out of a serialized sketch (INCLUSIVE search criteria).
  *
  * Mergeability is the 100 TB point: `merge(sketch(A), sketch(B)) ≈
  * sketch(A ⊎ B)` within the sketch's rank-error bound (~1.65% at the
  * default k=200), so per-group state stays O(k) while exact percentiles
  * would keep the whole value multiset. KLL compaction is randomized —
  * estimates are reproducible only within the rank-error bound, which is
  * why gated outputs derived from it must assert an error window rather
  * than a value hash (see q117).
  *
  * The scalar expressions are CodegenFallback: they run once per touched
  * GROUP per refresh (never per input row — that is the aggregate's
  * codegen'd update loop), so interpreter dispatch is noise.
  */
case class KllSketchAgg(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child, weight)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType &&
        weight.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double value, long weight) arguments, got " +
        s"(${child.dataType.simpleString}, ${weight.dataType.simpleString})")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  /** A row inserts its value `weight` times (a delta row from a join can
    * carry multiplicity > 1 — inserting once would under-count its rank
    * mass). KLL has no weighted update, so this loops — weights are join
    * multiplicities (small); a runaway weight fails loudly rather than
    * spinning. NULL value, NULL weight, or weight <= 0 contribute
    * nothing (the delta rules null the value out for retractions and
    * guard them separately). */
  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) {
        val n = w.asInstanceOf[Long]
        if (n > (1L << 24)) throw new IllegalStateException(
          s"graft_kll_agg: row weight $n too large to expand into a KLL sketch")
        var i = 0L
        while (i < n) { buffer.update(v.asInstanceOf[Double]); i += 1 }
      }
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}

/** Merge two serialized KLL sketches; NULL on either side passes the other
  * through (a group new to the state / a batch slice with no values). */
case class KllMerge(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary sketch arguments")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val a = KllDoublesSketch.heapify(Memory.wrap(l.asInstanceOf[Array[Byte]]))
      a.merge(KllDoublesSketch.heapify(Memory.wrap(r.asInstanceOf[Array[Byte]])))
      a.toByteArray
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllMerge =
    copy(left = newLeft, right = newRight)
}

/** p-quantile estimate from a serialized KLL sketch (INCLUSIVE criteria —
  * the estimate is a value actually observed in the stream). */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary sketch, double fraction) arguments")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketch: Any, p: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getQuantile(p.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

object Kll {
  private val AggName = "graft_kll_agg"
  private val MergeName = "graft_kll_merge"
  private val QuantileName = "graft_kll_quantile"

  private def kLiteral(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, t)
        if Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(t) =>
      v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$AggName: k must be an integer literal, got ${other.sql}")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // 2-arg form: unit weight; 3-arg form: (value, weight, k)
    AggName -> (exprs =>
      if (exprs.length == 2)
        KllSketchAgg(exprs(0),
          org.apache.spark.sql.catalyst.expressions.Literal(1L), kLiteral(exprs(1)))
      else KllSketchAgg(exprs(0), exprs(1), kLiteral(exprs(2)))),
    MergeName -> (exprs => KllMerge(exprs(0), exprs(1))),
    QuantileName -> (exprs => KllQuantile(exprs(0), exprs(1))))

  /** Description triples for SparkSessionExtensions.injectFunction. */
  def functionDescriptions: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          getClass.getCanonicalName, name), b)
    }

  /** Idempotently register the three functions on `spark`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Registration point for Column builders used inside Eval/ZDelta, which
    * have no session parameter: the active session is the one about to
    * analyze the returned Column. */
  private def active(): Unit = register(SparkSession.active)

  import org.apache.spark.sql.functions.{call_function, lit}

  /** Sketch-aggregate of a double column (unit weight per row). */
  def agg(e: Column, k: Int): Column = {
    active(); call_function(AggName, e, lit(k))
  }

  /** Weighted sketch-aggregate: each row inserts its value `w` times — the
    * form the delta rules use so join-delta rows with multiplicity > 1
    * carry their full rank mass. */
  def aggW(e: Column, w: Column, k: Int): Column = {
    active(); call_function(AggName, e, w.cast("long"), lit(k))
  }

  /** Merge two serialized sketches (NULL passes the other through). */
  def merge(a: Column, b: Column): Column = {
    active(); call_function(MergeName, a, b)
  }

  /** p-quantile estimate from a serialized sketch. */
  def quantile(s: Column, p: Double): Column = {
    active(); call_function(QuantileName, s, lit(p))
  }
}
