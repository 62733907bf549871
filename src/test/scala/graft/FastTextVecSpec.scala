package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FastTextVec

class FastTextVecSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test(".vec round-trip: header dropped, garbage gate applied, values exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec").toString + "/m.vec"
    val words = Seq(
      ("hello", Seq(0.1f, -0.25f, 3.5f)),
      ("mundo", Seq(1.0f, 2.0f, -0.5f)),
      ("x" * 120, Seq(9f, 9f, 9f))) // >= 100 chars: the reference's garbage gate
      .toDF("word", "vec")
    FastTextVec.write(words, dir)

    val got = FastTextVec.read(spark, dir)
      .orderBy("word").as[(String, Seq[Float])].collect().toSeq
    assert(got === Seq(
      ("hello", Seq(0.1f, -0.25f, 3.5f)),
      ("mundo", Seq(1.0f, 2.0f, -0.5f))))
    // parse is pure codegen'd expressions — no UDF node
    val plan = FastTextVec.read(spark, dir).queryExecution.sparkPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), s"UDF in plan:\n$plan")
  }

  test("reads a hand-written file with a real header line") {
    val d = java.nio.file.Files.createTempDirectory("graft_vec2")
    val f = d.resolve("tiny.vec")
    java.nio.file.Files.writeString(f,
      "2 4\nword1 0.5 0.25 -1.0 2.0\nword2 1.5 0 0 -0.125\n")
    val got = FastTextVec.read(spark, f.toString)
      .orderBy("word").as[(String, Seq[Float])].collect().toSeq
    assert(got === Seq(
      ("word1", Seq(0.5f, 0.25f, -1.0f, 2.0f)),
      ("word2", Seq(1.5f, 0f, 0f, -0.125f))))
  }
}
