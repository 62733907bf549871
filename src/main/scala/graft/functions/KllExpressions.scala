package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketch aggregation, on the Apache DataSketches
  * library Spark itself bundles for its SQL HLL functions.
  *
  * Spark 4 ships mergeable DISTINCT-COUNT sketches in SQL
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) but no
  * mergeable QUANTILE sketch — `approx_percentile` aggregates straight
  * to a number, leaving nothing a later reader can combine. These
  * expressions close that gap so corpus statistics can be published as
  * per-slice sketch TABLES (see `sources.SketchStore`): at 100 TB a new
  * ingest batch sketches only its own rows, and a stats reader unions
  * kilobyte sketches instead of rescanning every row.
  *
  * The aggregation follows the TypedImperativeAggregate pattern of
  * Spark's own HllSketchAgg: the buffer is a live heap sketch within a
  * partition (no per-row serialize), serialized only at shuffle
  * boundaries, so the agg is map-side combinable — the property that
  * makes the sketch table one narrow shuffle at any scale.
  */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_agg"
  // analysis-time: a non-numeric child (e.g. a string column through
  // SQL graft_kll_agg) must fail planning with the function's name,
  // not die mid-job in toDouble on an executor — same contract as
  // BloomFilterAgg and the merge side's sketchInputCheck
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a numeric input, got ${other.simpleString}")
    }
  override def dataType: DataType = BinaryType
  // an empty group evaluates to a serialized EMPTY sketch, not null —
  // empties must merge transparently on the read side
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(KllExpressions.toDouble(v, prettyName))
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Union of serialized KLL sketches — the read-side half of the
  * artifact pattern (`hll_union_agg`'s quantile sibling). Input rows
  * are binary sketches from [[KllSketchAgg]]; the result is one merged
  * sketch with the same rank-error bound as its inputs' k.
  */
case class KllMergeAgg(child: Expression,
    k: Int = KllExpressions.DefaultK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_merge"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.sketchInputCheck(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // DataSketches merge adopts the SMALLEST k involved — including
  // the TARGET's — so the merge buffer must be created at (at least)
  // the inputs' build k or it silently degrades their accuracy to
  // its own. Same rule as the theta/freq merge targets: the caller
  // threads the k the slices were built with (SketchStore.merge).
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Quantile extraction from a serialized KLL sketch (INCLUSIVE search,
  * the DataSketches default). NULL for an empty sketch (an empty
  * corpus slice has no quantiles). CodegenFallback is deliberate: this
  * runs on sketch TABLES — one kilobyte row per corpus slice, after
  * all aggregation — never on a per-document hot path.
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_kll_quantile"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.sketchInputCheck(left, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess
        if !right.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName rank must be numeric, got ${right.dataType.simpleString}")
      case r => r
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(sketch: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(KllExpressions.toDouble(rank, prettyName),
      QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
}

/** Column-API entry points (the SQL names are injected by
  * `plans.GraftExtensions`).
  */
object KllExpressions {
  /** DataSketches' default k: ~1.65% normalized rank error. */
  val DefaultK = 200

  /** Numeric coercion at eval time — Catalyst's ImplicitCastInputTypes
    * machinery is not public outside the sql package, so like the
    * repo's other native expressions these accept any numeric input
    * and coerce here (callers in SketchStore cast explicitly anyway).
    */
  private[functions] def toDouble(v: Any, fn: String): Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case n: java.lang.Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a numeric input, got ${other.getClass.getName}")
  }

  def kll_agg(c: Column, k: Int = DefaultK): Column =
    ColumnShim.column(
      KllSketchAgg(ColumnShim.expression(c), k).toAggregateExpression())

  def kll_merge_agg(c: Column, k: Int = DefaultK): Column =
    ColumnShim.column(
      KllMergeAgg(ColumnShim.expression(c), k).toAggregateExpression())

  def kll_quantile(sketch: Column, rank: Column): Column =
    ColumnShim.column(
      KllQuantile(ColumnShim.expression(sketch), ColumnShim.expression(rank)))

  def kll_quantile(sketch: Column, rank: Double): Column =
    kll_quantile(sketch, lit(rank))

  /** SQL builder shared by GraftExtensions (config-time) and
    * GraftFunctions.register (runtime): k arrives as a foldable int
    * literal, mirroring how Spark's hll_sketch_agg takes lgConfigK.
    */
  def kllAggBuilder(exprs: Seq[Expression]): Expression =
    KllSketchAgg(exprs(0),
      FreqExpressions.intLiteral(exprs(1), "graft_kll_agg k"))

  /** SQL builder for the merge side: the optional second argument is
    * the merge TARGET's k — DataSketches' merge adopts the smallest k
    * involved, so SQL users merging slices built with k > 200 must be
    * able to pass that k or the merge silently degrades to default
    * rank error (graft_theta_union and graft_freq_merge already take
    * the size argument for the same reason).
    */
  def kllMergeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1 || exprs.length == 2,
      s"graft_kll_merge expects 1 or 2 argument(s), got ${exprs.length}")
    val k = if (exprs.length == 2)
      FreqExpressions.intLiteral(exprs(1), "graft_kll_merge k")
    else DefaultK
    KllMergeAgg(exprs.head, k)
  }
}
