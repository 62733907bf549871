package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FloatsToBinary, VecCodec}
import graft.plans.{CodecRoundTripElimination, GraftExtensions}

class ExtensionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("GraftExtensions installs into a SparkSessionExtensions instance") {
    // Config-time path: must wire up without throwing (full-session
    // verification would need a fresh JVM; the rule and functions are
    // covered directly below and by GraftFunctions' SQL tests).
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("codec round-trip is eliminated from the optimized plan") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CodecRoundTripElimination
    try {
      val df = Seq(Array(1.0f, 2.5f), Array(-0.5f, 3.25f)).toDF("v")
        .select(VecCodec.binary_to_floats(
          VecCodec.floats_to_binary(col("v"))).as("w"))
      val optimized = df.queryExecution.optimizedPlan
      val survivors = optimized.expressions.flatMap(_.collect {
        case f: FloatsToBinary => f
      })
      assert(survivors.isEmpty, s"codec not eliminated:\n$optimized")
      // and the result is still the input, bit-exactly
      assert(df.as[Array[Float]].collect().toSeq.map(_.toSeq) ===
        Seq(Seq(1.0f, 2.5f), Seq(-0.5f, 3.25f)))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == CodecRoundTripElimination)
    }
  }

  test("rule leaves the unsafe reverse direction intact") {
    val b = VecCodec.encode(Array(1.5f)) ++ Array[Byte](7) // length % 4 != 0
    val df = Seq(b).toDF("b")
      .select(VecCodec.floats_to_binary(
        VecCodec.binary_to_floats(col("b"))).as("rt"))
    val rewritten = CodecRoundTripElimination(df.queryExecution.analyzed)
    val codecs = rewritten.expressions.flatMap(_.collect {
      case f: FloatsToBinary => f
    })
    assert(codecs.nonEmpty, "reverse round-trip must NOT be eliminated")
  }
}
