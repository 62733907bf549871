package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsQueries

/** Targeted assertions for the analytics battery beyond the smoke tests
  * (QueriesSmokeSpec covers rows>0 and the oracle covers values).
  */
class AnalyticsSpec extends AnyFunSuite with SparkSpec {

  test("x40 partitioned read prunes to a single status partition") {
    val df = AnalyticsQueries.x40_partition_prune(spark, sf)
    df.collect() // materialize so the write + read actually ran
    // Re-open the partitioned layout and check the filter becomes a
    // partition filter (no o_orderstatus scan filter left behind).
    val path = AnalyticsQueries.scratch(sf, "orders_by_status")
    val filtered = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    // The filter must land in the scan's partitionFilters (pruned before
    // IO), not survive as a post-scan data filter. (df.inputFiles can't
    // show this: it lists the relation's files ignoring filters.)
    val scan = filtered.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "no file scan in plan")
    assert(scan.get.partitionFilters.exists(_.toString.contains("o_orderstatus")),
      s"status filter not applied as a partition filter: ${scan.get.partitionFilters}")
    assert(scan.get.relation.partitionSchema.fieldNames.contains("o_orderstatus"))
  }

  test("x41 salted two-phase agg equals the plain single-shuffle agg") {
    val salted = AnalyticsQueries.x41_salted_agg(spark, sf).collect()
    val plain = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg((floor(sum(col("l_quantity")) * 100 + lit(0.5)) / 100).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("approx_count_distinct stays within 5% of exact (scale path for x34)") {
    val ev = Tables.events(spark, sf)
    val both = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val exact = both.getLong(0).toDouble
    val approx = both.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("x31 bucketed range join equals the naive theta join") {
    val bucketed = AnalyticsQueries.x31_range_join(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val a = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id").as("u"),
        col("ts").as("a_ts"))
    val probe = Tables.events(spark, sf)
      .select(col("user_id").as("pu"), col("ts").as("e_ts"),
        col("event_id").as("pe"))
    val naive = a.join(probe,
        col("pu") === col("u") &&
          col("e_ts") > col("a_ts") &&
          col("e_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("anchor_id"), col("u"))
      .agg(count(col("pe")).as("n_following"))
      .select(col("anchor_id"), col("u").as("user_id"), col("n_following"))
      .orderBy("anchor_id").collect()
    assert(bucketed.toSeq === naive.toSeq)
  }

  test("x48 masking rewrites synthetic PII (the corpus has none to hit)") {
    import spark.implicits._
    // drive the exact x48 projection over a frame WITH emails/urls/nums
    // — on the testdata corpus all counts are 0, which proves the
    // no-op path but not the rewrite itself
    val docs = Seq(
      (1L, "mail Jane.Doe+x@corp.example.org or call 123456"),
      (2L, "see https://example.org/a?b=c for details"),
      (3L, "clean text, short num 123")).toDF("doc_id", "text")
    val out = AnalyticsQueries.piiMask(docs)
      .select("doc_id", "n_emails", "n_urls", "n_longnums", "masked")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 1, 0, 1, "mail <EMAIL> or call <NUM>"),
      (2L, 0, 1, 0, "see <URL> for details"),
      (3L, 0, 0, 0, "clean text, short num 123")))
  }

  test("x35 every document splits into at least one sentence, pos 0 first") {
    val s = AnalyticsQueries.x35_sentences(spark, sf)
    val docs = Tables.documents(spark, sf).count()
    assert(s.select("doc_id").distinct().count() === docs)
    // every document's first surviving fragment carries ordinal 0
    assert(s.groupBy("doc_id").agg(min(col("pos")).as("m"))
      .filter(col("m") =!= 0).count() === 0)
  }
}
