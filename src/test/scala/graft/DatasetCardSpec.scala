package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AnalyticsQueries, ExtensionQueries}

/** The dataset card's release-gating columns must agree with the stage
  * queries they summarize (round-7 verdict #4): near-dup membership
  * with x02's pairs, contamination with x51's flags, PII with x48's
  * counters — each regrouped by language here in plain Scala, against
  * the card's one-plan answer. (The card's value-level truth is the
  * DuckDB oracle hash; this pins the cross-query CONSISTENCY.)
  */
class DatasetCardSpec extends AnyFunSuite with SparkSpec {

  test("card near-dup/contamination/PII columns reconcile with x02/x51/x48") {
    val langOf = Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val nearDupByLang = ExtensionQueries.x02_dedup_minhash(spark, sf)
      .select("d1", "d2").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      .groupBy(langOf).view.mapValues(_.size.toLong).toMap

    val contamByLang = ExtensionQueries.x51_contamination(spark, sf)
      .filter(col("flagged")).select("doc_id").collect()
      .map(_.getLong(0))
      .groupBy(langOf).view.mapValues(_.size.toLong).toMap

    val piiByLang = AnalyticsQueries.x48_pii_mask(spark, sf)
      .filter(col("n_emails") + col("n_urls") + col("n_longnums") > 0)
      .select("doc_id").collect().map(_.getLong(0))
      .groupBy(langOf).view.mapValues(_.size.toLong).toMap

    val card = ExtensionQueries.x62_dataset_card(spark, sf)
      .select("lang", "n_near_dup_docs", "n_contaminated_docs", "n_pii_docs")
      .collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(1) === nearDupByLang.getOrElse(lang, 0L),
        s"n_near_dup_docs($lang) != x02 membership")
      assert(r.getLong(2) === contamByLang.getOrElse(lang, 0L),
        s"n_contaminated_docs($lang) != x51 flags")
      assert(r.getLong(3) === piiByLang.getOrElse(lang, 0L),
        s"n_pii_docs($lang) != x48 counters")
    }
    // the summary is not vacuous on the testdata: near-dups exist
    assert(card.map(_.getLong(1)).sum > 0)
  }

  test("source-mix card (x84) reconciles with x80 weights and x83 overlaps") {
    val mix = ExtensionQueries.x80_mixture_weights(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val ov = ExtensionQueries.x83_source_overlap(spark, sf)
      .select("s1", "s2", "jaccard").collect()
      .flatMap { r =>
        val (s1, s2, j) = (r.getString(0), r.getString(1), r.getDouble(2))
        Seq(s1 -> ((s2, j)), s2 -> ((s1, j)))
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }

    val card = ExtensionQueries.x84_card_sources(spark, sf).collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val s = r.getString(0)
      val (nDocs, nTok, wRaw, wTemp, boost) = mix(s)
      assert(r.getLong(1) === nDocs && r.getLong(2) === nTok,
        s"x84($s) volume != x80")
      assert(r.getDouble(3) === wRaw && r.getDouble(4) === wTemp &&
        r.getDouble(5) === boost, s"x84($s) weights != x80")
      val partners = ov.getOrElse(s, Seq.empty)
      assert(r.getLong(6) === partners.size.toLong,
        s"x84($s) n_overlapping != x83 partner count")
      val maxJ = if (partners.isEmpty) 0.0 else partners.map(_._2).max
      assert(r.getDouble(7) === maxJ, s"x84($s) max_jaccard != x83 max")
      // struct-max semantics: highest jaccard, then MAX partner name
      val top = if (partners.isEmpty) ""
        else partners.maxBy { case (o, j) => (j, o) }._1
      assert(r.getString(8) === top, s"x84($s) top_overlap_source mismatch")
    }
    // the overlap columns are not vacuous on the testdata
    assert(card.map(_.getLong(6)).sum > 0)
  }
}
