package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Tokenize, TokenCount}

class TokenCountSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("property: TokenCount(text) == size(tokens(text)) incl. unicode") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // includes the adversarial code points whose LOWERCASE maps into
    // ASCII (KELVIN SIGN 'K' -> k, 'İ' -> i + combining dot): the
    // Column form lowers first, so these must still agree
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', ',', '.', '!', '\n', '\t', '-'),
      1 -> Gen.oneOf('é', 'ß', '中', 'Ñ', 'K', 'İ'))).map(_.mkString)
    val prop = forAll(gen) { s =>
      val r = Seq(s).toDF("text")
        .select(TokenCount(col("text")).as("fast"),
          size(Tokenize.tokens(col("text"))).as("slow"))
        .head()
      r.getInt(0) == r.getInt(1)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(result.passed, result.status.toString)
  }

  test("known values and the codegen path over a real table") {
    val df = Seq("Hello, World! x2", "", "...", "añb", "a中b")
      .toDF("text").select(TokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq === Seq(3, 0, 0, 2, 2))
    // runs over the documents scan without falling back to interpreted
    val docs = Tables.documents(spark, sf)
      .select(TokenCount(col("text")).as("n"))
    docs.collect()
    val p = docs.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"no codegen span in:\n$p")
  }
}
