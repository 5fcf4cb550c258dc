package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items ("heavy hitters") sketch functions — Apache DataSketches
  * `ItemsSketch[String]`, the third member of the maintained sketch family
  * next to HLL (distinct counts) and KLL (quantiles):
  *
  *  - [[FreqItemsAgg]] `graft_freq_agg(e, maxMapSize)` — aggregates strings
  *    into a serialized sketch of ≤ `maxMapSize` tracked counters;
  *  - [[FreqMerge]] `graft_freq_merge(a, b)` — merges two serialized
  *    sketches (how a batch's sketch folds into the stored state);
  *  - [[FreqTopK]] `graft_freq_topk(s, k)` — top-k candidate items out of
  *    a serialized sketch, ordered (estimate DESC, item ASC).
  *
  * The 100 TB story mirrors HLL: per-group state is O(maxMapSize)
  * regardless of group size, and `merge(sketch(A), sketch(B))` equals
  * `sketch(A ⊎ B)` up to the count-error bound ε·n (ε ≈ 3.5/maxMapSize).
  * Items with true frequency above ε·n are NEVER missed
  * (NO_FALSE_NEGATIVES); below maxMapSize distinct items the counters —
  * and therefore the top-k order — are exact. Estimates beyond that bound
  * depend on merge order, so gated outputs assert containment of a known
  * heavy hitter rather than hashing the list.
  */
case class FreqItemsAgg(
    child: Expression,
    weight: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = Seq(child, weight)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType &&
        weight.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string item, long weight) arguments, got " +
        s"(${child.dataType.simpleString}, ${weight.dataType.simpleString})")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  /** A row counts its item `weight` times (join-delta multiplicity;
    * ItemsSketch has a native weighted update). NULL value/weight or
    * weight <= 0 contribute nothing. */
  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null && w.asInstanceOf[Long] > 0)
        buffer.update(v.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    if (buffer.isEmpty) null else buffer.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}

/** Merge two serialized frequent-items sketches; NULL passes the other
  * side through (a group new to the state / a batch slice with no values). */
case class FreqMerge(left: Expression, right: Expression)
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
      val serde = new ArrayOfStringsSerDe()
      val a = ItemsSketch.getInstance(
        Memory.wrap(l.asInstanceOf[Array[Byte]]), serde)
      a.merge(ItemsSketch.getInstance(
        Memory.wrap(r.asInstanceOf[Array[Byte]]), serde))
      a.toByteArray(serde)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqMerge =
    copy(left = newLeft, right = newRight)
}

/** Top-k candidate items from a serialized sketch: frequent items under
  * NO_FALSE_NEGATIVES (nothing above the error bound is missed), ordered
  * (estimate DESC, item ASC) for determinism, truncated to k. */
case class FreqTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType.isInstanceOf[org.apache.spark.sql.types.IntegerType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary sketch, int k) arguments")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketch: Any, k: Any): Any = {
    val s = ItemsSketch.getInstance(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe())
    if (s.isEmpty) null
    else {
      val rows = s.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      val top = rows.sortBy(r => (-r.getEstimate, r.getItem))
        .take(k.asInstanceOf[Int])
        .map(r => UTF8String.fromString(r.getItem): Any)
      new GenericArrayData(top)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopK =
    copy(left = newLeft, right = newRight)
}

object Freq {
  private val AggName = "graft_freq_agg"
  private val MergeName = "graft_freq_merge"
  private val TopKName = "graft_freq_topk"

  private def intLiteral(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, t)
        if Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(t) =>
      v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$name: argument must be an integer literal, got ${other.sql}")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // 2-arg form: unit weight; 3-arg form: (item, weight, maxMapSize)
    AggName -> (exprs =>
      if (exprs.length == 2)
        FreqItemsAgg(exprs(0),
          org.apache.spark.sql.catalyst.expressions.Literal(1L),
          intLiteral(AggName, exprs(1)))
      else FreqItemsAgg(exprs(0), exprs(1), intLiteral(AggName, exprs(2)))),
    MergeName -> (exprs => FreqMerge(exprs(0), exprs(1))),
    TopKName -> (exprs => FreqTopK(exprs(0), exprs(1))))

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

  private def active(): Unit = register(SparkSession.active)

  import org.apache.spark.sql.functions.{call_function, lit}

  /** Sketch-aggregate of a string column into ≤ maxMapSize counters
    * (unit weight per row). */
  def agg(e: Column, maxMapSize: Int): Column = {
    active(); call_function(AggName, e, lit(maxMapSize))
  }

  /** Weighted sketch-aggregate: each row counts its item `w` times — the
    * form the delta rules use so join-delta rows with multiplicity > 1
    * carry their full count. */
  def aggW(e: Column, w: Column, maxMapSize: Int): Column = {
    active(); call_function(AggName, e, w.cast("long"), lit(maxMapSize))
  }

  /** Merge two serialized sketches (NULL passes the other through). */
  def merge(a: Column, b: Column): Column = {
    active(); call_function(MergeName, a, b)
  }

  /** Top-k candidate items from a serialized sketch. */
  def topK(s: Column, k: Int): Column = {
    active(); call_function(TopKName, s, lit(k))
  }
}
