package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** float32[] <-> little-endian binary codec (SURVEY.md F11).
  *
  * The reference stores document/word vectors as raw 1200-byte float32
  * blobs (`worker.py:64,90` np.frombuffer/tobytes, `enter_wordvecs.py:42`).
  * The engine's native type is `array<float>`; this codec exists only at
  * the storage boundary. Implemented as native Catalyst expressions with
  * `doGenCode` so the conversion stays inside whole-stage codegen.
  */
object VecCodec {
  def floats_to_binary(c: Column): Column =
    ColumnShim.column(FloatsToBinary(ColumnShim.expression(c)))
  def binary_to_floats(c: Column): Column =
    ColumnShim.column(BinaryToFloats(ColumnShim.expression(c)))

  def encode(a: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(a.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < a.length) { bb.putFloat(a(i)); i += 1 }
    bb.array()
  }

  def decode(b: Array[Byte]): Array[Float] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](b.length / 4)
    var i = 0
    while (i < out.length) { out(i) = bb.getFloat(); i += 1 }
    out
  }
}

case class FloatsToBinary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    VecCodec.encode(arr.toFloatArray())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecCodec.encode($c.toFloatArray());")
  override protected def withNewChildInternal(c: Expression): FloatsToBinary =
    copy(child = c)
  override def prettyName: String = "floats_to_binary"
}

case class BinaryToFloats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VecCodec.decode(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecCodec.decode($c));")
  override protected def withNewChildInternal(c: Expression): BinaryToFloats =
    copy(child = c)
  override def prettyName: String = "binary_to_floats"
}
