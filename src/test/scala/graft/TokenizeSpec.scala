package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Tokenize

class TokenizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("text").select(Tokenize.tokens(col("text")).as("t"))
      .as[Seq[String]].head()

  test("lowercase alnum runs, punctuation split, empties dropped") {
    assert(tok("Hello, World! x2") === Seq("hello", "world", "x2"))
    assert(tok("  leading trailing  ") === Seq("leading", "trailing"))
    assert(tok("...") === Seq.empty)
    assert(tok("") === Seq.empty)
  }

  test("property: tokens are nonempty [a-z0-9]+ runs equal to the UDF form") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // non-ASCII chars kept to lowercase-stable ones: locale-sensitive
    // case mappings (e.g. Turkish İ) legitimately differ between JVM
    // String.toLowerCase and Spark's UTF8String lower — the engine
    // tokenizes [a-z0-9] runs, so such chars are separators either way,
    // but the REFERENCE string comparison here would disagree
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', ',', '.', '!', '\n', '\t'),
      1 -> Gen.oneOf('é', 'ß', '中'))).map(_.mkString)
    val prop = forAll(gen) { s =>
      val t = tok(s)
      val reference = s.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      t.forall(_.matches("[a-z0-9]+")) && t == reference
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(result.passed, result.status.toString)
  }

  test("shingles: n-grams in order; short docs yield empty") {
    def sh(words: Seq[String], n: Int): Seq[String] =
      Seq(Tuple1(words)).toDF("toks")
        .select(Tokenize.shingles(col("toks"), n).as("s"))
        .as[Seq[String]].head()
    assert(sh(Seq("a", "b", "c", "d"), 3) === Seq("a b c", "b c d"))
    assert(sh(Seq("a", "b"), 3) === Seq.empty)
    assert(sh(Seq("a", "b", "c"), 3) === Seq("a b c"))
  }
}
