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
