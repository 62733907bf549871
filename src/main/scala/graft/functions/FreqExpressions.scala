package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items ("heavy hitters") sketch — the frequency
  * leg of the sketch-artifact family (HLL distincts are Spark
  * built-ins, KLL quantiles are `KllExpressions`; Spark SQL has no
  * frequency sketch at all).
  *
  * The exact top-token query (x24/x58) shuffles every distinct
  * (group, token) pair; the sketch aggregation carries AT MOST
  * `maxMapSize` entries per group through partials, merges, and the
  * published artifact — bounded state no matter how wide the
  * vocabulary. The price is the Misra-Gries error bound: estimates are
  * within `getMaximumError` (≤ 3.5·N/maxMapSize) of truth, and every
  * item above that error is guaranteed present
  * (ErrorType.NO_FALSE_NEGATIVES) — SketchSpec pins both, plus
  * exactness while a group's vocabulary fits the map (the sketch only
  * approximates once it must evict).
  */
case class FreqSketchAgg(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.itemInputCheck(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(FreqExpressions.itemOf(v))
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(n: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** Union of serialized frequency sketches (read-side merge for
  * published sketch tables). Frequency estimates are additive across
  * disjoint slices, so slice-merged results equal a whole-corpus
  * sketch while under capacity and keep the error bound beyond it.
  */
case class FreqMergeAgg(child: Expression,
    maxMapSize: Int = FreqExpressions.DefaultMapSize,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_merge"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.sketchInputCheck(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // the merge TARGET's map size governs the merged accuracy
  // (ItemsSketch.merge feeds entries into this sketch; it never grows
  // past its own capacity) — callers merging sketches built with a
  // non-default size must pass the same size here, which SketchStore
  // does for both sides
  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe))
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(n: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** Top-k extraction from a serialized frequency sketch:
  * `array<struct<item, est, lb, ub>>` ordered by estimate DESC then
  * item ASC (x24's tiebreak), empty array for an empty sketch. Only
  * items the NO_FALSE_NEGATIVES guarantee surfaces are candidates —
  * every true heavy hitter is present, estimates carry their bounds.
  * CodegenFallback for the same reason as KllQuantile: runs on
  * kilobyte sketch rows, never a per-document hot path.
  */
case class FreqTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_freq_top_k"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.sketchInputCheck(left, prettyName)
  override def dataType: DataType = ArrayType(FreqTopK.HitType, containsNull = false)
  // BinaryExpression.eval null-propagates a null sketch or k (an
  // outer-joined sketch row), so the output is nullable exactly when
  // an input is — claiming false there would let NullPropagation
  // rewrite IS NULL / coalesce over this expression incorrectly
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(sketch: Any, k: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe)
    val n = k.asInstanceOf[Number].intValue()
    val hits = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(n)
      .map(r => new GenericInternalRow(Array[Any](
        UTF8String.fromString(r.getItem), r.getEstimate,
        r.getLowerBound, r.getUpperBound)): Any)
    new GenericArrayData(hits)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FreqTopK = copy(left = l, right = r)
}

object FreqTopK {
  val HitType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))
}

/** Column-API entry points (SQL names injected by GraftExtensions /
  * GraftFunctions, mirroring the KLL trio).
  */
object FreqExpressions {

  /** Analysis-time input check shared by the sketch scalar/merge
    * expressions: a serialized sketch is a binary column, and a
    * wrong-typed SQL call should fail planning with the function's
    * name, not die mid-task with a ClassCastException on an executor
    * (BloomMightContain set the precedent).
    */
  private[functions] def sketchInputCheck(e: org.apache.spark.sql.catalyst.expressions.Expression,
      name: String): TypeCheckResult =
    e.dataType match {
      case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects a serialized sketch (binary), got ${other.simpleString}")
    }
  /** Analysis-time ITEM check for the build-side sketch aggs
    * (ThetaSketchAgg, FreqSketchAgg): items hash by string/binary
    * CONTENT. Numeric children are rejected rather than coerced —
    * long 5 and double 5.0 stringify to distinct items ("5" vs
    * "5.0"), so two sketches built over differently-typed columns of
    * numerically equal values would silently report zero overlap.
    * The caller casts explicitly (SketchStore does), making the item
    * domain visible in the plan.
    */
  private[functions] def itemInputCheck(e: org.apache.spark.sql.catalyst.expressions.Expression,
      name: String): TypeCheckResult =
    e.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects a string or binary item column (cast numerics " +
          s"explicitly — typed coercion would make long 5 and double 5.0 " +
          s"distinct items), got ${other.simpleString}")
    }

  /** Power of 2 (ItemsSketch requirement); error ≤ 3.5·N/maxMapSize. */
  val DefaultMapSize = 128

  def freq_agg(c: Column, maxMapSize: Int = DefaultMapSize): Column =
    ColumnShim.column(
      FreqSketchAgg(ColumnShim.expression(c), maxMapSize).toAggregateExpression())

  def freq_merge_agg(c: Column, maxMapSize: Int = DefaultMapSize): Column =
    ColumnShim.column(
      FreqMergeAgg(ColumnShim.expression(c), maxMapSize).toAggregateExpression())

  def freq_top_k(sketch: Column, k: Column): Column =
    ColumnShim.column(
      FreqTopK(ColumnShim.expression(sketch), ColumnShim.expression(k)))

  def freq_top_k(sketch: Column, k: Int): Column = freq_top_k(sketch, lit(k))

  /** SQL builder shared by the two registration paths. */
  def freqAggBuilder(exprs: Seq[Expression]): Expression =
    FreqSketchAgg(exprs(0), intLiteral(exprs(1), "graft_freq_agg maxMapSize"))

  /** SQL builder for the merge side: the optional second argument is
    * the merge TARGET's map size, which governs merged accuracy — a
    * caller who built with a non-default size must pass the same size
    * here (the Column API and SketchStore thread it the same way).
    */
  def freqMergeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1 || exprs.length == 2,
      s"graft_freq_merge expects 1 or 2 argument(s), got ${exprs.length}")
    val size = if (exprs.length == 2)
      intLiteral(exprs(1), "graft_freq_merge maxMapSize") else DefaultMapSize
    FreqMergeAgg(exprs.head, size)
  }

  /** Shared by the KLL/freq/theta SQL builders — one canonical place
    * to widen (e.g. accept Long literals) if the SQL surface grows.
    */
  private[functions] def intLiteral(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(m: Int, _) => m
    case other => throw new IllegalArgumentException(
      s"$what must be an int literal, got $other")
  }

  /** Canonical item binding for String-typed sketches: a binary value
    * must hash its CONTENT — Array[Byte].toString is JVM identity, so
    * every row would count as a distinct item and two sketches of
    * identical bytes would report zero overlap. ISO-8859-1 is a
    * bijective byte↔char mapping, so distinct byte strings stay
    * distinct and equal ones collide, at zero re-encoding cost.
    */
  private[graft] def itemOf(v: Any): String = v match {
    case bytes: Array[Byte] => new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    case other => other.toString
  }
}
