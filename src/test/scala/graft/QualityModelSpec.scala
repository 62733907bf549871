package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.QualityModel

/** Accuracy contract for the rows-only x82 (the IvfRecallSpec
  * discipline for ML legs: pin ranking behavior, not coefficient
  * bytes): the distant-supervision classifier must rank planted
  * garbage below planted clean text, separate its own seed classes,
  * and emit calibrated-range scores for the whole corpus.
  */
class QualityModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("features are the documented closed forms on a handcrafted doc") {
    val docs = Seq((1L, "the the cat cat cat runs", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = QualityModel.features(docs).collect()(0)
    assert(f.getAs[Double]("n_tokens") === 6.0)
    // tokens: the(3) x2, cat(3) x3, runs(4) -> mean (3*5+4)/6
    assert(math.abs(f.getAs[Double]("mean_tok_len") - 19.0 / 6) < 1e-12)
    assert(math.abs(f.getAs[Double]("distinct_ratio") - 3.0 / 6) < 1e-12)
    assert(math.abs(f.getAs[Double]("top_share") - 3.0 / 6) < 1e-12)
    assert(math.abs(f.getAs[Double]("stopword_ratio") - 2.0 / 6) < 1e-12)
  }

  test("planted garbage scores below planted clean text on the corpus model") {
    // score the real corpus plus two planted docs: a degenerate
    // single-token repetition (garbage: hapax-free, zero diversity)
    // and a mid-entropy mixed doc built from corpus-typical vocabulary
    val real = Tables.documents(spark, sf)
    val clean = (0 until 40).map(i =>
      Seq("table", "query", "row", "data", "batch", "window")(i % 6) +
        s" ${Seq("scan", "merge", "sort", "group")(i % 4)}").mkString(" ")
    val planted = Seq(
      (900001L, Array.fill(60)("zzz").mkString(" "), "en", "s", 0L),
      (900002L, clean, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scored = QualityModel.score(real.unionByName(planted))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.values.forall(p => p >= 0.0 && p <= 1.0))
    assert(scored(900001L) < scored(900002L),
      s"garbage ${scored(900001L)} must rank below clean ${scored(900002L)}")
    // and below the corpus median: the model must consider a pure
    // repetition doc worse than typical text
    val median = scored.filterKeys(_ < 900000L).values.toSeq.sorted
      .apply(scored.size / 2 - 1)
    assert(scored(900001L) < median)
  }

  test("seed classes separate: mid-entropy seeds outscore tail seeds on average") {
    val scored = graft.ml.QualityModel.score(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val feat = QualityModel.features(Tables.documents(spark, sf))
      .select("doc_id", "xent").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val xs = feat.values.toSeq.sorted
    val (lo, hi) = (xs((xs.size * 0.1).toInt), xs((xs.size * 0.9).toInt - 1))
    val tails = feat.collect { case (id, x) if x <= lo || x >= hi => scored(id) }
    val mids = feat.collect {
      case (id, x) if x > lo + (hi - lo) / 4 && x < hi - (hi - lo) / 4 => scored(id)
    }
    assert(tails.nonEmpty && mids.nonEmpty)
    assert(mids.sum / mids.size > tails.sum / tails.size,
      "mid-entropy docs must outscore the suspect tails on average")
  }

  test("x82 query surface: one row per token-bearing doc, deterministic") {
    val a = graft.queries.ExtensionQueries.queries("x82_quality_model")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val b = graft.queries.ExtensionQueries.queries("x82_quality_model")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }
}
