package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** Rule-semantics fixtures for the Gopher quality battery (x141 is
  * corpus-hash-checked against DuckDB; this spec pins that each rule
  * FIRES on a document built to violate exactly it, and that a
  * well-formed document passes the full conjunction — the oracle
  * can't show that, because the synthetic corpus never passes the
  * 50-word floor).
  */
class GopherRulesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 60 plain words (~5 chars mean), two required stops, no symbols
  private val goodText = (1 to 30)
    .map(i => s"the quick engine batch$i processes data with care")
    .take(7).mkString(". ") + ". " +
    "and that have of be to with the final words land here nicely " +
    "more plain filler words keep the count over the fifty floor now"

  private def rules(docs: Seq[(Long, String)]): Map[Long, Row] =
    ExtensionQueries.gopherRulesOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a well-formed document passes the full conjunction") {
    val r = rules(Seq((1L, goodText)))(1L)
    assert(r.getAs[Long]("n_words") >= 50)
    assert(r.getAs[Boolean]("gopher_pass"),
      s"good doc failed: $r")
  }

  test("each rule fires on a document violating exactly it") {
    val bulletWall = (1 to 60).map(i => s"- bullet item $i").mkString("\n")
    val symbolWall = goodText.split(" ").map(w => s"#$w").mkString(" ")
    val ellipsisWall = (1 to 60).map(i => s"line $i trails off...").mkString("\n")
    val numberWall = (1 to 60).map(_.toString).mkString(" ")
    val noStops = (1 to 60).map(i => s"plain word$i filler").mkString(" ")
    val longWords = (1 to 60).map(i => s"supercalifragilistic$i").mkString(" ")
    val r = rules(Seq(
      (1L, goodText), (2L, bulletWall), (3L, symbolWall),
      (4L, ellipsisWall), (5L, numberWall), (6L, noStops),
      (7L, "too few words"), (8L, longWords)))
    assert(r(2L).getAs[Double]("bullet_line_ratio") >= 0.9 &&
      !r(2L).getAs[Boolean]("gopher_pass"), "bullet wall not caught")
    assert(r(3L).getAs[Double]("symbol_ratio") >= 0.1 &&
      !r(3L).getAs[Boolean]("gopher_pass"), "symbol wall not caught")
    assert(r(4L).getAs[Double]("ellipsis_line_ratio") >= 0.3 &&
      !r(4L).getAs[Boolean]("gopher_pass"), "ellipsis wall not caught")
    assert(r(5L).getAs[Double]("alpha_word_ratio") <= 0.8 &&
      !r(5L).getAs[Boolean]("gopher_pass"), "all-numeric doc not caught")
    assert(r(6L).getAs[Long]("n_req_stop") < 2 &&
      !r(6L).getAs[Boolean]("gopher_pass"), "stopword-free doc not caught")
    assert(r(7L).getAs[Long]("n_words") < 50 &&
      !r(7L).getAs[Boolean]("gopher_pass"), "short doc not caught")
    assert(r(8L).getAs[Double]("mean_word_len") > 10.0 &&
      !r(8L).getAs[Boolean]("gopher_pass"), "long-word doc not caught")
  }

  test("empty and null-ish documents produce zeroed, non-passing rows") {
    val r = rules(Seq((1L, ""), (2L, "   \n  \n ")))
    for (id <- Seq(1L, 2L)) {
      assert(r(id).getAs[Long]("n_words") === 0L)
      assert(!r(id).getAs[Boolean]("gopher_pass"))
    }
  }

  test("per-rule flags: every failing doc carries at least one failing flag") {
    // round-13 advice: the Pipeline card used to count failures on the
    // ROUNDED display columns while gopher_pass conjoins the unrounded
    // values, so a doc failing a bound by < 5e-7 could drop with zero
    // per-rule attribution. gopherFlagsOf ties attribution to the
    // verdict structurally: gopher_pass IS the conjunction of the
    // flags, so a failing doc always names its rule(s).
    val bulletWall = (1 to 60).map(i => s"- bullet item $i").mkString("\n")
    val noStops = (1 to 60).map(i => s"plain word$i filler").mkString(" ")
    val flagged = ExtensionQueries.gopherFlagsOf(
      Seq((1L, goodText), (2L, bulletWall), (3L, noStops), (4L, ""))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(ExtensionQueries.GopherRuleFlags.forall(
      f => flagged(1L).schema.fieldNames.contains(f)))
    flagged.values.foreach { r =>
      val flags = ExtensionQueries.GopherRuleFlags.map(r.getAs[Boolean])
      assert(r.getAs[Boolean]("gopher_pass") === flags.forall(identity),
        s"gopher_pass must be exactly the flag conjunction: $r")
    }
    assert(!flagged(2L).getAs[Boolean]("pass_bullet_lines"))
    assert(!flagged(3L).getAs[Boolean]("pass_required_stops"))
    // and the public x141 surface is unchanged: no flag columns leak
    val pub = ExtensionQueries.gopherRulesOf(
      Seq((1L, goodText)).toDF("doc_id", "text")).schema.fieldNames.toSet
    assert(ExtensionQueries.GopherRuleFlags.forall(f => !pub.contains(f)))
  }
}
