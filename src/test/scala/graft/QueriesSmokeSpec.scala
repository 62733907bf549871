package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001; core queries must be
  * non-empty (the candidate-pair dedup queries may legitimately be
  * empty at tiny scale, so they only assert execution).
  */
class QueriesSmokeSpec extends AnyFunSuite with SparkSpec {

  private val mayBeEmpty = Set("x02_dedup_minhash", "x04_ngram_jaccard",
    "x14_embedding_dup", "x46_ml_lsh_dedup", "x60_incremental_dedup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001" +
      (if (mayBeEmpty(name)) "" else " with rows > 0")) {
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry smoke: flagship pipeline rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every rows-only query carries a written COVERAGE.md justification") {
    // the round-11 verdict's standing rule: a query declared without
    // oracleSql downgrades the driver's check to rows-only, so each
    // one must name itself in COVERAGE.md next to its justification
    // and spec — a new rows-only query that skips the paperwork fails
    // here instead of shipping as silent weak coverage
    val coverage = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = rowsOnly.filterNot(coverage.contains)
    assert(undocumented.isEmpty,
      s"rows-only queries missing a COVERAGE.md entry: $undocumented")
  }
}
