package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** Rule-semantics fixtures for the C4 line-cleaning battery (round-12
  * verdict ask #5 — the GopherRulesSpec pattern): x142 is
  * corpus-hash-checked against DuckDB, but only through the
  * synthesized-suffix line convention the flat corpus forces. This
  * spec pins each rule on hand-built documents with REAL '\n'
  * structure through [[ExtensionQueries.c4LineRulesOf]], which shares
  * x142's keep predicate verbatim, so the rules provably fire on real
  * line shapes independently of the fixture convention.
  */
class C4RulesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val goodLine = "this sentence has comfortably more than five words."

  private def rules(docs: Seq[(Long, String)]): Map[Long, Row] =
    ExtensionQueries.c4LineRulesOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("each line rule fires on a line violating exactly it") {
    val doc = Seq(
      goodLine,                                          // kept
      "lorem ipsum dolor sit amet consectetur elit.",    // lorem ipsum
      "a config block opens here { with five words.",    // '{'
      "only four words here.",                           // < 5 words
      "this line never terminates with punctuation",     // no [.!?]
      "enable JavaScript to view the full content.",     // javascript (case)
      goodLine + " again?",                              // kept ('?' terminal)
      goodLine + " once more!"                           // kept ('!' terminal)
    ).mkString("\n")
    val r = rules(Seq((1L, doc)))(1L)
    assert(r.getAs[Long]("n_lines") === 8L)
    assert(r.getAs[Long]("n_kept") === 3L,
      s"expected exactly the three well-formed lines kept: $r")
    val clean = r.getAs[String]("clean_text").split("\n").toSeq
    assert(clean === Seq(goodLine, goodLine + " again?",
      goodLine + " once more!"),
      "kept lines must survive verbatim, in order")
    assert(!r.getAs[Boolean]("page_kept"),
      "the lorem-ipsum and brace lines kill the PAGE even though " +
        "three lines survive (Raffel §2.2's page-level discards)")
  }

  test("page rule: exactly 2 survivors drops the page, exactly 3 keeps it") {
    val twoSurvive = Seq(goodLine, goodLine + " twice.",
      "no terminal punctuation on this one").mkString("\n")
    val threeSurvive = Seq(goodLine, goodLine + " twice.",
      goodLine + " thrice.", "short line.").mkString("\n")
    val r = rules(Seq((1L, twoSurvive), (2L, threeSurvive)))
    assert(r(1L).getAs[Long]("n_kept") === 2L &&
      !r(1L).getAs[Boolean]("page_kept"),
      "a 2-survivor page must be dropped")
    assert(r(2L).getAs[Long]("n_kept") === 3L &&
      r(2L).getAs[Boolean]("page_kept"),
      "a 3-survivor page must be kept")
  }

  test("blank and whitespace-only lines never count toward the page") {
    val doc = Seq(goodLine, "", "   ", "\t", goodLine + " twice.",
      goodLine + " thrice.").mkString("\n")
    val r = rules(Seq((1L, doc)))(1L)
    assert(r.getAs[Long]("n_lines") === 3L,
      "blank lines must not inflate n_lines")
    assert(r.getAs[Long]("n_kept") === 3L && r.getAs[Boolean]("page_kept"))
  }

  test("page rules: lorem ipsum or a brace anywhere drops the whole page") {
    // Raffel et al. 2020 §2.2 discards the PAGE containing 'lorem
    // ipsum' or '{' — not just the line (round-13 advice: the
    // line-level c4Keep alone shipped a softer operating point). A
    // page with three healthy survivors still dies when a DROPPED
    // line carried the marker.
    val threeGood = Seq(goodLine, goodLine + " twice.", goodLine + " thrice.")
    val withLorem = (threeGood :+ "Lorem Ipsum dolor sit amet today.")
      .mkString("\n")
    val withBrace = (threeGood :+ "a config block opens { here now")
      .mkString("\n")
    val clean = threeGood.mkString("\n")
    val r = rules(Seq((1L, withLorem), (2L, withBrace), (3L, clean)))
    assert(r(1L).getAs[Long]("n_kept") === 3L &&
      !r(1L).getAs[Boolean]("page_kept"),
      "a lorem-ipsum mention anywhere must drop the page (case-blind)")
    assert(r(2L).getAs[Long]("n_kept") === 3L &&
      !r(2L).getAs[Boolean]("page_kept"),
      "a brace anywhere must drop the page")
    assert(r(3L).getAs[Boolean]("page_kept"),
      "the marker-free twin of the same page must survive")
  }

  test("trailing whitespace cannot hide terminal punctuation") {
    val doc = Seq(goodLine + "   ", goodLine + " twice.\t",
      goodLine + " thrice. ").mkString("\n")
    val r = rules(Seq((1L, doc)))(1L)
    assert(r.getAs[Long]("n_kept") === 3L,
      "lines are trimmed before the terminal-punctuation rule")
  }
}
