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
}
