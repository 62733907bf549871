package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{AnotB, Intersection, SetOperation, Sketch, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Mergeable theta sketches — distinct counting with SET OPERATIONS,
  * the capability neither HLL (union-only) nor the other sketch legs
  * have: intersection and difference estimates between sketches that
  * were built independently.
  *
  * The training-data question this answers at 100 TB: "how much does
  * release v=N overlap release v=N-1?" / "how many of this source's
  * documents are already in the corpus?" — WITHOUT joining the two
  * document sets. Each release/slice aggregates its content hashes
  * into a kilobyte theta sketch once (publishable via SketchStore like
  * the other legs); overlap, delta, and union sizes then come from
  * set algebra over the sketches. Error is the theta bound (~1/sqrt(k)
  * RSE for union; intersection error scales with the inverse overlap
  * fraction); below k retained entries the sketch is exact, which is
  * what SketchSpec pins against exact set algebra.
  *
  * Same TypedImperativeAggregate pattern as the KLL/frequency legs;
  * the buffer is a live theta Union (which accepts both raw updates
  * and sketch merges), serialized as its compact result — union of
  * compacts is the same set state, so partial/final merges compose.
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.itemInputCheck(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      // bytes hash their CONTENT (toString on Array[Byte] is JVM
      // identity — every row would look distinct); theta updates
      // byte[] natively. itemInputCheck restricts children to
      // string/binary at analysis, so the toString arm only ever sees
      // UTF8String.
      case bytes: Array[Byte] => buf.update(bytes); ()
      case other => buf.update(other.toString); ()
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union of serialized theta sketches (read-side merge, like
  * `hll_union_agg`). lgK bounds the merge target's retained entries.
  */
case class ThetaUnionAgg(child: Expression,
    lgK: Int = ThetaExpressions.DefaultLgK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_union"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.sketchInputCheck(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Distinct estimate of one serialized theta sketch. CodegenFallback
  * like the other sketch scalars: runs on kilobyte sketch rows.
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.sketchInputCheck(child, prettyName)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(sketch: Any): Any =
    Sketch.wrap(Memory.wrap(sketch.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Set-operation estimates over two serialized theta sketches:
  * op ∈ intersect | diff (A\B) | union.
  */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  require(ThetaSetEstimate.Ops.contains(op),
    s"theta set op must be one of ${ThetaSetEstimate.Ops}, got $op")

  override def prettyName: String = s"graft_theta_$op"
  override def checkInputDataTypes(): TypeCheckResult =
    FreqExpressions.sketchInputCheck(left, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess =>
        FreqExpressions.sketchInputCheck(right, prettyName)
      case r => r
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    op match {
      case "intersect" =>
        SetOperation.builder().buildIntersection().intersect(sa, sb).getEstimate
      case "diff" =>
        SetOperation.builder().buildANotB().aNotB(sa, sb).getEstimate
      case "union" =>
        // the union TARGET's nominal entries also cap the result;
        // build it at the library maximum so accuracy is governed by
        // the INPUT sketches alone (exact inputs → exact union) — the
        // hash table grows lazily, a large cap costs nothing up front
        SetOperation.builder()
          .setLogNominalEntries(ThetaExpressions.UnionTargetLgK)
          .buildUnion().union(sa, sb).getEstimate
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaSetEstimate =
    copy(left = l, right = r)
}

object ThetaSetEstimate {
  val Ops: Set[String] = Set("intersect", "diff", "union")
}

object ThetaExpressions {
  /** 2^12 nominal entries: ~1.6% union RSE, exact below 4096. */
  val DefaultLgK = 12

  /** DataSketches' maximum lg nominal entries — used for scalar union
    * targets so pairwise-union accuracy is bounded by the inputs.
    */
  val UnionTargetLgK = 26

  def theta_agg(c: Column, lgK: Int = DefaultLgK): Column =
    ColumnShim.column(
      ThetaSketchAgg(ColumnShim.expression(c), lgK).toAggregateExpression())

  def theta_union_agg(c: Column, lgK: Int = DefaultLgK): Column =
    ColumnShim.column(
      ThetaUnionAgg(ColumnShim.expression(c), lgK).toAggregateExpression())

  def theta_estimate(c: Column): Column =
    ColumnShim.column(ThetaEstimate(ColumnShim.expression(c)))

  def theta_intersect_estimate(a: Column, b: Column): Column =
    ColumnShim.column(ThetaSetEstimate(
      ColumnShim.expression(a), ColumnShim.expression(b), "intersect"))

  def theta_diff_estimate(a: Column, b: Column): Column =
    ColumnShim.column(ThetaSetEstimate(
      ColumnShim.expression(a), ColumnShim.expression(b), "diff"))

  def theta_union_estimate(a: Column, b: Column): Column =
    ColumnShim.column(ThetaSetEstimate(
      ColumnShim.expression(a), ColumnShim.expression(b), "union"))

  /** SQL builders shared by GraftExtensions and GraftFunctions. */
  def thetaAggBuilder(exprs: Seq[Expression]): Expression =
    ThetaSketchAgg(exprs(0),
      FreqExpressions.intLiteral(exprs(1), "graft_theta_agg lgK"))

  /** Optional second argument = the union target's lgK, which caps
    * merged accuracy (same contract as graft_freq_merge's map size).
    */
  def thetaUnionBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1 || exprs.length == 2,
      s"graft_theta_union expects 1 or 2 argument(s), got ${exprs.length}")
    val lgK = if (exprs.length == 2)
      FreqExpressions.intLiteral(exprs(1), "graft_theta_union lgK")
    else DefaultLgK
    ThetaUnionAgg(exprs.head, lgK)
  }

  def setEstimateBuilder(op: String)(exprs: Seq[Expression]): Expression =
    ThetaSetEstimate(exprs(0), exprs(1), op)
}
