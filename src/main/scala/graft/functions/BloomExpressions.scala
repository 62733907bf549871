package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable bloom filters — the JOIN-side sketch the other legs
  * (theta = distinct, KLL = quantiles, frequent-items = top-k) don't
  * cover: set MEMBERSHIP at ~10 bits/key.
  *
  * The 100 TB problem this solves: a semi-join against a dimension
  * that no longer fits a broadcast hash relation. A hash relation
  * costs ~50+ bytes/entry (key bytes + hashmap overhead) and is
  * rebuilt per executor; the bloom filter over the same keys at 1%
  * false positives is ~9.6 bits/entry — 40×+ smaller — and the probe
  * is two hash functions per row inside whole-stage codegen. False
  * positives mean a bloom probe can only PRE-filter: survivors still
  * pay the exact join, but at fpp 0.01 the exact join's probe side has
  * already shed ~99% of its non-matching rows, so the join that
  * remains is shuffle-cheap. [[graft.queries.ExtensionQueries
  * .contaminationBloomOf]] is the shipped composition (x67).
  *
  * Build is DISTRIBUTED: [[BloomFilterAgg]] rides normal aggregate
  * execution (map-side partial filters, OR-merge — commutative and
  * associative, so the merged bits are byte-identical under any
  * partitioning; BloomSpec pins that). The driver only ever holds the
  * single merged filter, which the caller broadcasts and probes via
  * [[BloomMightContain]].
  *
  * Hash-input contract: strings are hashed as their UTF-8 bytes
  * (`putBinary`/`mightContainBinary` — `UTF8String.getBytes` on the
  * probe side is the same byte sequence, no String allocation per
  * row); integral types widen to long. Build and probe MUST go through
  * this file so the two sides can never disagree on the hashed bytes.
  */
case class BloomFilterAgg(child: Expression, expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {
  require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")

  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType | LongType | IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName hashes string/binary/long/int, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    child.eval(input) match {
      case null => ()
      case s: UTF8String => buf.putBinary(s.getBytes)
      case b: Array[Byte] => buf.putBinary(b)
      case l: Long => buf.putLong(l)
      case i: Int => buf.putLong(i.toLong)
      case other => throw new IllegalStateException(
        s"$prettyName: unsupported runtime type ${other.getClass.getName}")
    }
    buf
  }

  // partial filters share (expectedItems, fpp) => identical geometry;
  // mergeInPlace ORs the bitsets
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def eval(buf: BloomFilter): Any = serialize(buf)
  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(bytes)

  override def withNewMutableAggBufferOffset(n: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomFilterAgg =
    copy(child = c)
}

/** Membership probe against a BROADCAST filter, inside whole-stage
  * codegen. The filter rides a `Broadcast` handle — one deserialized
  * copy per executor via the block manager — rather than a plan
  * literal, which would re-ship and re-embed the (potentially
  * hundreds of MB) bits in every serialized plan fragment.
  */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType | LongType | IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName probes string/binary/long/int, got ${other.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => bloom.value.mightContainBinary(s.getBytes)
    case b: Array[Byte] => bloom.value.mightContainBinary(b)
    case l: Long => bloom.value.mightContainLong(l)
    case i: Int => bloom.value.mightContainLong(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the broadcast HANDLE (tiny, serializable); .value()
    // resolves to the executor-local filter at first use
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val bf = "((org.apache.spark.util.sketch.BloomFilter)" + s"$bc.value())"
    val probe = child.dataType match {
      case StringType => (c: String) => s"$bf.mightContainBinary($c.getBytes())"
      case BinaryType => (c: String) => s"$bf.mightContainBinary($c)"
      case _ => (c: String) => s"$bf.mightContainLong((long)$c)"
    }
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${probe(c)};")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomExpressions {

  def bloom_agg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    ColumnShim.column(
      BloomFilterAgg(ColumnShim.expression(c), expectedItems, fpp)
        .toAggregateExpression())

  def bloom_might_contain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnShim.column(BloomMightContain(ColumnShim.expression(c), bloom))

  /** Deserialize a filter produced by [[bloom_agg]] (driver side,
    * before broadcasting).
    */
  def read(bytes: Array[Byte]): BloomFilter = BloomFilter.readFrom(bytes)

  /** SQL builder for `graft_bloom_agg(col, expectedItems, fpp)`. The
    * probe has no SQL form — it needs a Broadcast handle, which SQL
    * can't express; SQL users materialize the filter bytes and probe
    * through the Column API.
    */
  def bloomAggBuilder(exprs: Seq[Expression]): Expression = {
    val items = exprs(1) match {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg expectedItems must be an integral literal, got $other")
    }
    val fpp = exprs(2) match {
      case Literal(v: Double, DoubleType) => v
      case Literal(v: Decimal, _: DecimalType) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg fpp must be a numeric literal, got $other")
    }
    BloomFilterAgg(exprs.head, items, fpp)
  }
}
