package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, ExtensionQueries, ReferenceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (the reference's E1 doc-vector pipeline,
    * `worker.py:69-94`) on /root/testdata/sf0.001; driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.q12_doc_vectors(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ ExtensionQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every `round(expr, d)` is rewritten to
    * `floor((expr) * 10^d + 0.5) / 10^d` so the oracle rounds with the
    * SAME formula as the Spark plans (see ReferenceQueries.round):
    * DuckDB's native round() disagrees with Spark's on exact-half
    * decimal boundaries.
    */
  def oracleSql: Map[String, String] =
    (ReferenceQueries.oracleSql ++ ExtensionQueries.oracleSql ++ AnalyticsQueries.oracleSql)
      .map { case (k, v) => k -> rewriteRound(v) }

  /** Replace round(inner, d) calls (paren-aware, recursive) with the
    * deterministic floor formulation.
    */
  private[graft] def rewriteRound(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val atWordStart = i == 0 || {
        val c = sql.charAt(i - 1); !Character.isLetterOrDigit(c) && c != '_'
      }
      if (atWordStart && sql.regionMatches(true, i, "round(", 0, 6)) {
        var depth = 1
        var j = i + 6
        var lastComma = -1
        while (depth > 0) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => lastComma = j
            case _ =>
          }
          j += 1
        }
        require(lastComma > 0, s"round() without digits arg in: $sql")
        val inner = rewriteRound(sql.substring(i + 6, lastComma))
        val digits = sql.substring(lastComma + 1, j - 1).trim.toInt
        val p = BigInt(10).pow(digits)
        out.append(s"(floor(($inner) * $p + 0.5) / $p)")
        i = j
      } else {
        out.append(sql.charAt(i))
        i += 1
      }
    }
    out.toString
  }
}
