package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecCodec

class VecCodecSpec extends AnyFunSuite with SparkSpec {

  test("encode is little-endian IEEE754 float32 (reference blob layout)") {
    // 1.0f LE = 00 00 80 3f (worker.py:64 np.frombuffer dtype=float32)
    assert(VecCodec.encode(Array(1.0f)).toSeq ===
      Seq[Byte](0x00, 0x00, 0x80.toByte, 0x3f))
    assert(VecCodec.decode(Array[Byte](0x00, 0x00, 0x80.toByte, 0x3f)).toSeq
      === Seq(1.0f))
  }

  test("round-trip identity for arbitrary floats incl. NaN/Inf bit patterns") {
    val rnd = new scala.util.Random(42)
    val specials = Array(Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, 0.0f, -0.0f, Float.MinPositiveValue,
      Float.MaxValue, Float.MinValue)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40)
      val a = Array.fill(n) {
        if (rnd.nextBoolean()) specials(rnd.nextInt(specials.length))
        else java.lang.Float.intBitsToFloat(rnd.nextInt())
      }
      val back = VecCodec.decode(VecCodec.encode(a))
      // compare raw bits so NaN == NaN and -0.0 != 0.0
      assert(a.map(java.lang.Float.floatToRawIntBits).toSeq ===
        back.map(java.lang.Float.floatToRawIntBits).toSeq)
    }
  }

  test("Catalyst expressions round-trip in a plan (codegen path)") {
    val df = Tables.embeddings(spark, sf).limit(50)
    val bad = df
      .withColumn("rt",
        VecCodec.binary_to_floats(VecCodec.floats_to_binary(col("embedding"))))
      .filter(not(col("rt") === col("embedding")))
    assert(bad.count() === 0)
  }

  test("SQL registration works") {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_t")
    val n = spark.sql(
      "SELECT vec_id FROM emb_t WHERE binary_to_floats(floats_to_binary(embedding)) = embedding")
      .count()
    assert(n === 5)
  }
}
