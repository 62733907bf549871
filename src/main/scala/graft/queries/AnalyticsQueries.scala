package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Upsert

/** Generic warehouse / pipeline analytics beyond ReferenceQueries (the
  * reference surface) and ExtensionQueries (the LLM-data north star):
  * the SQL entry point, multi-dimensional aggregation, non-equi (range)
  * joins, time-series gap filling, the full analytic-frame battery,
  * multi-distinct planning, lateral explosion, map columns, regex
  * functions, CSV/JSON source round-trips, partition pruning, salted
  * (skew-resistant) two-phase aggregation, and batch MERGE/upsert.
  *
  * Same contract as the sibling objects: every query is deterministic
  * (total ORDER BY, floor-formula rounding on floats), every computed
  * column is aliased identically in the Spark plan and the DuckDB
  * oracle, and a scale note explains why the plan survives 100 TB.
  */
object AnalyticsQueries {

  import ReferenceQueries.SqlTok

  /** Deterministic cross-engine rounding — see ReferenceQueries.round. */
  private def round(c: org.apache.spark.sql.Column, d: Int): org.apache.spark.sql.Column = {
    val p = math.pow(10, d)
    floor(c * p + lit(0.5)) / p
  }

  // ======================================================================
  // q28: the SQL entry point — the engine is usable through spark.sql
  // over registered views, not only the DataFrame API. TPC-H Q3 shape:
  // 3-way join, filtered fact + dimension, grouped revenue, top-k.
  // Catalyst plans the same broadcast/shuffle joins as the DataFrame
  // variants; revenue is rounded with the shared floor formula INSIDE
  // the SQL text so the ORDER BY revenue is identical in both engines.
  private val Q3Text =
    """SELECT o_orderkey, CAST(o_orderdate AS STRING) AS orderdate, o_orderpriority,
      |  floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1998-01-01'
      |  AND l_shipdate > DATE '1998-01-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin

  def q28_sql_api(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "orders", "lineitem").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    spark.sql(Q3Text)
  }

  val q28Sql: String = Q3Text.replace("CAST(o_orderdate AS STRING)", "o_orderdate::VARCHAR")

  // ======================================================================
  // x30: CUBE multi-dimensional aggregation with a grouping id. The
  // NULL-marker group keys are coalesced to 'ALL' BEFORE the ORDER BY:
  // Spark sorts NULLS FIRST, DuckDB NULLS LAST — never order oracle
  // output by a nullable grouping key. One expand + one shuffle.
  def x30_grouping_cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        (when(col("l_returnflag").isNull, 2).otherwise(0) +
          when(col("l_linestatus").isNull, 1).otherwise(0)).as("gid"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")

  val x30Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  (CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END
      |   + CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END)::INT AS gid,
      |  count(*)::BIGINT AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin

  // ======================================================================
  // x31: range (interval) join — for every signup event, count the same
  // user's events in the following hour. A naive theta-join is a
  // BroadcastNestedLoopJoin (quadratic; fatal at scale); instead the
  // probe side is bucketed by hour and each anchor expands to the ≤2
  // buckets its window overlaps, turning the range join into an
  // equi-join on (user_id, bucket) + residual filter — the standard
  // distributed interval-join decomposition (bucket width = window
  // span). Each event lands in exactly one probe bucket, so no dedup
  // pass is needed after the residual filter.
  def x31_range_join(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val anchors = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("a_ts"))
    val probes = ev.select(col("user_id"), col("ts").as("e_ts"))
      .withColumn("bucket", floor(unix_timestamp(col("e_ts")) / 3600))
    val expanded = anchors
      .withColumn("b0", floor(unix_timestamp(col("a_ts")) / 3600))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
    val hits = expanded.join(probes, Seq("user_id", "bucket"))
      .filter(col("e_ts") > col("a_ts") &&
        col("e_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("anchor_id").agg(count(lit(1)).as("n_following"))
    anchors.join(hits, Seq("anchor_id"), "left")
      .select(col("anchor_id"), col("user_id"),
        coalesce(col("n_following"), lit(0L)).as("n_following"))
      .orderBy("anchor_id")
  }

  val x31Sql: String =
    """WITH a AS (SELECT event_id AS anchor_id, user_id, ts::TIMESTAMP AS a_ts
      |           FROM events WHERE event_type = 'signup'),
      |j AS (SELECT a.anchor_id, count(*)::BIGINT AS n_following
      |      FROM a JOIN events e ON e.user_id = a.user_id
      |        AND e.ts::TIMESTAMP > a.a_ts
      |        AND e.ts::TIMESTAMP <= a.a_ts + INTERVAL 1 HOUR
      |      GROUP BY a.anchor_id)
      |SELECT a.anchor_id, a.user_id, coalesce(j.n_following, 0)::BIGINT AS n_following
      |FROM a LEFT JOIN j USING (anchor_id) ORDER BY anchor_id""".stripMargin

  // ======================================================================
  // x32: time-series gap filling / resampling — the hourly spine is
  // generated with sequence() (a few thousand rows however big the fact
  // table is), cross-joined with the distinct keys, and the real
  // aggregates are left-joined in: the only full-data pass is the one
  // groupBy. Missing buckets surface as explicit zeros.
  def x32_gap_fill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val hours = ev
      .agg(date_trunc("hour", min(col("ts"))).as("mn"),
        date_trunc("hour", max(col("ts"))).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("h"))
    val counts = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    hours.crossJoin(ev.select("event_type").distinct())
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), unix_timestamp(col("h")).as("hour_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("event_type", "hour_start")
  }

  val x32Sql: String =
    """WITH b AS (SELECT date_trunc('hour', min(ts::TIMESTAMP)) AS mn,
      |                  date_trunc('hour', max(ts::TIMESTAMP)) AS mx FROM events),
      |hrs AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b),
      |cnt AS (SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS h,
      |          count(*)::BIGINT AS n_events, round(sum(value), 2) AS sum_value
      |        FROM events GROUP BY 1, 2)
      |SELECT t.event_type, epoch(hrs.h)::BIGINT AS hour_start,
      |  coalesce(c.n_events, 0)::BIGINT AS n_events,
      |  coalesce(c.sum_value, 0.0) AS sum_value
      |FROM hrs CROSS JOIN (SELECT DISTINCT event_type FROM events) t
      |LEFT JOIN cnt c ON c.event_type = t.event_type AND c.h = hrs.h
      |ORDER BY 1, 2""".stripMargin

  // ======================================================================
  // x33: analytic-frame battery — ntile, percent_rank, cume_dist (all
  // over a TOTAL order: ties broken by key, or the tile assignment is
  // nondeterministic), plus a value-RANGE frame (deterministic under
  // ties by construction: the frame depends on the value, not the row
  // position). Windows are computed over the full partitions; the
  // output subset is filtered AFTERWARD so both engines rank the same
  // population. One shuffle per distinct partitioning.
  private val X33Inner =
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS tile,
      |  floor(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) * 1000000 + 0.5) / 1000000 AS pr,
      |  floor(cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) * 1000000 + 0.5) / 1000000 AS cd,
      |  floor(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS near_sum
      |FROM orders""".stripMargin

  def x33_window_frames(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    spark.sql(
      s"""SELECT * FROM ($X33Inner)
         |WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin)
  }

  // DuckDB's ntile returns BIGINT where Spark returns INT — cast it;
  // everything else is textually the Spark SQL.
  val x33Sql: String =
    s"""SELECT o_orderkey, o_orderpriority, tile::INT AS tile, pr, cd, near_sum
       |FROM ($X33Inner)
       |WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin

  // ======================================================================
  // x34: multi-distinct aggregation — two COUNT(DISTINCT) on different
  // columns in one query forces Catalyst's Expand-based planning (one
  // shuffle carrying a null-padded row per distinct group). The
  // scale-out alternative for looser precision is approx_count_distinct
  // (HLL, no expand) — asserted within tolerance in AnalyticsSpec, not
  // oracle-hashable because the sketches differ across engines.
  def x34_distinct_battery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  val x34Sql: String =
    """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users,
      |  count(DISTINCT (ts::TIMESTAMP)::DATE)::BIGINT AS n_days,
      |  count(*)::BIGINT AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ======================================================================
  // x35: lateral explosion with position — posexplode splits documents
  // into sentences keeping the ordinal. Narrow generate (no shuffle
  // until the final sort); position is computed on the RAW split array
  // in both engines, then empty fragments are filtered, so ordinals
  // stay aligned.
  def x35_sentences(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), "\\. +")).as(Seq("pos", "sentence")))
      .filter(trim(col("sentence")) =!= "")
      .select(col("doc_id"), col("pos"), trim(col("sentence")).as("sentence"))
      .orderBy("doc_id", "pos")

  val x35Sql: String =
    """SELECT doc_id, pos, trim(sentence) AS sentence FROM (
      |  SELECT doc_id, unnest(range(0, len(parts)))::INT AS pos, unnest(parts) AS sentence
      |  FROM (SELECT doc_id, string_split_regex(text, '\. +') AS parts FROM documents))
      |WHERE trim(sentence) <> '' ORDER BY doc_id, pos""".stripMargin

  // ======================================================================
  // x36: map columns — per-document token→count maps built with
  // map_from_entries over a per-doc collect_list (bounded by document
  // size, NOT corpus size — safe at any corpus scale), then probed with
  // element_at / map_keys / map_values. The oracle recomputes the same
  // scalars relationally.
  def x36_map_funcs(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = ReferenceQueries.docTokenCounts(Tables.documents(spark, sfDir))
    counts.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("token"), col("cnt")))).as("tokmap"))
      .select(col("doc_id"),
        size(map_keys(col("tokmap"))).as("n_distinct"),
        coalesce(element_at(col("tokmap"), "the"), lit(0L)).as("the_count"),
        array_max(map_values(col("tokmap"))).as("max_count"))
      .orderBy("doc_id")
  }

  val x36Sql: String =
    s"""WITH tokc AS (SELECT doc_id, token, count(*)::BIGINT AS cnt FROM
       |  (SELECT doc_id, unnest($SqlTok) AS token FROM documents)
       |  GROUP BY doc_id, token)
       |SELECT doc_id, count(*)::INT AS n_distinct,
       |  coalesce(max(CASE WHEN token = 'the' THEN cnt END), 0)::BIGINT AS the_count,
       |  max(cnt)::BIGINT AS max_count
       |FROM tokc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ======================================================================
  // x37: regex battery — extract / extract_all / replace / rlike. All
  // patterns are chosen inside the PCRE∩RE2 common subset (character
  // classes, +), where Java regex (Spark) and RE2 (DuckDB) agree.
  // Pure codegen'd projection, no shuffle before the sort.
  def x37_regex(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
        // explicit group 0: Spark defaults to group 1 and throws on a
        // groupless pattern AT MATCH TIME (latent on digit-free data)
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_nums"),
        length(regexp_replace(col("text"), "[aeiou]", "")).as("len_novowel"),
        col("text").rlike("data").as("mentions_data"))
      .orderBy("doc_id")

  val x37Sql: String =
    """SELECT doc_id, regexp_extract(text, '[0-9]+') AS first_num,
      |  len(regexp_extract_all(text, '[0-9]+'))::INT AS n_nums,
      |  length(regexp_replace(text, '[aeiou]', '', 'g'))::INT AS len_novowel,
      |  regexp_matches(text, 'data') AS mentions_data
      |FROM documents ORDER BY doc_id""".stripMargin

  // ======================================================================
  // Round-trip scratch dir for the source/sink queries. Keyed by process
  // id AND scale factor: two concurrent drivers on the same SF would
  // otherwise race (one's mode-overwrite delete under the other's
  // in-flight read). private[graft] so specs derive the path instead of
  // duplicating the layout. The per-pid root is removed by a JVM
  // shutdown hook (registered once, on first use) so repeated runs
  // don't accumulate dead pid directories in tmp.
  private[graft] lazy val scratchRoot: String = {
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip/${ProcessHandle.current().pid()}")
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => rm(root)))
    root.toString
  }

  private[graft] def scratch(sfDir: String, name: String): String =
    s"$scratchRoot/${new java.io.File(sfDir).getName}/$name"

  // x38: CSV source round-trip — write a projection as headered CSV,
  // read it back with an explicit schema (never inferSchema at scale:
  // it's an extra full pass), aggregate. The oracle aggregates the
  // original parquet, so the hash-match proves the CSV write/read is
  // value-exact (doubles survive via shortest-roundtrip repr, dates as
  // ISO strings).
  def x38_csv_roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate")
    val src = Tables.lineitem(spark, sfDir).select(cols.map(col): _*)
    val path = scratch(sfDir, "lineitem_csv")
    src.write.mode("overwrite").option("header", "true").csv(path)
    spark.read.schema(src.schema).option("header", "true").csv(path)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        min(col("l_shipdate")).cast("string").as("first_ship"),
        max(col("l_shipdate")).cast("string").as("last_ship"))
      .orderBy("l_returnflag")
  }

  val x38Sql: String =
    """SELECT l_returnflag, count(*)::BIGINT AS n,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  min(l_shipdate)::VARCHAR AS first_ship,
      |  max(l_shipdate)::VARCHAR AS last_ship
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // x39: JSON-lines source round-trip — newline-containing text fields
  // survive (JSON escapes them), proven by hashing min(md5(text)) per
  // group against the parquet original.
  def x39_json_roundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(spark, sfDir)
    val path = scratch(sfDir, "documents_json")
    src.write.mode("overwrite").json(path)
    spark.read.schema(src.schema).json(path)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
        min(md5(col("text"))).as("min_md5"))
      .orderBy("lang", "source")
  }

  val x39Sql: String =
    """SELECT lang, source, count(*)::BIGINT AS n,
      |  sum(n_chars)::BIGINT AS sum_chars, min(md5(text)) AS min_md5
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // x40: partitioned layout + partition pruning — orders written
  // hive-partitioned by status; the filtered read must prune to one
  // directory (AnalyticsSpec asserts the plan's partition filters, the
  // oracle asserts the values). At 100 TB, partition-on-ingest by the
  // dominant filter column is the difference between scanning 1/|status|
  // of the data and all of it.
  def x40_partition_prune(spark: SparkSession, sfDir: String): DataFrame = {
    val path = scratch(sfDir, "orders_by_status")
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(path)
    spark.read.parquet(path)
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val x40Sql: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS n,
      |  round(sum(o_totalprice), 2) AS sum_price
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ======================================================================
  // x41: salted two-phase aggregation — the skew-resistant shape for
  // hot grouping keys: a first groupBy on (key, salt) spreads a hot key
  // over 16 reducers, the second combines the 16 partials. Equivalent
  // results to the plain single-shuffle groupBy (the oracle IS the
  // plain groupBy); at scale you pay one extra (tiny) shuffle to avoid
  // a straggler reducer.
  def x41_salted_agg(spark: SparkSession, sfDir: String): DataFrame = {
    val partial = Tables.lineitem(spark, sfDir)
      .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pc"))
    partial.groupBy("l_returnflag")
      .agg(round(sum(col("ps")), 2).as("sum_qty"), sum(col("pc")).as("n_rows"))
      .orderBy("l_returnflag")
  }

  val x41Sql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
      |  count(*)::BIGINT AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ======================================================================
  // x42: batch MERGE/upsert — Upsert.mergeByKey (the S8-S10 sink recipe)
  // exercised end-to-end as an oracle-checked query: matched keys take
  // the update row (price uplift), new keys are inserts, everything
  // else survives. The oracle recomputes the merge with CASE + UNION.
  def x42_merge_upsert(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    // Insert keys are offset past max(o_orderkey) so they can never
    // collide with a real key at ANY scale factor (a fixed +10M offset
    // would collide once keys exceed 10M, turning "inserts" into
    // updates and silently diverging from the UNION-ALL oracle). The
    // scalar rides a 1-row broadcast cross join — a scalar subquery's
    // plan shape, no driver action.
    val maxKey = orders.agg(max(col("o_orderkey")).as("__mk"))
    val inserts = orders.filter(col("o_orderkey") % 500 === 0)
      .crossJoin(broadcast(maxKey))
      .withColumn("o_orderkey", col("o_orderkey") + col("__mk") + 1)
      .drop("__mk")
    val updates = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      .unionByName(inserts)
    // Money is summed in exact integer MILLS (the ×1.1 uplift makes 3
    // decimals): per-row floor(p·1000+0.5) recovers the same integer in
    // both engines, and integer sums are order-independent — a rounded
    // double sum over ~10⁵ rows can land on a cent boundary and flip
    // between engines (observed at sf0.1).
    Upsert.mergeByKey(orders, updates, "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 1000 + lit(0.5)).cast("long")) / 1000.0)
          .as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val x42Sql: String =
    """WITH merged AS (
      |  SELECT o_orderstatus,
      |    CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 1.1
      |         ELSE o_totalprice END AS p
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderstatus, o_totalprice AS p FROM orders WHERE o_orderkey % 500 = 0)
      |SELECT o_orderstatus, count(*)::BIGINT AS n,
      |  sum(floor(p * 1000 + 0.5)::BIGINT)::BIGINT / 1000.0 AS sum_price
      |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ======================================================================
  // x43: per-group multi-quantile + FILTER-style conditional counts.
  // Quartiles are computed over exact integer CENTS: with binary-exact
  // fractions (.25/.5/.75) and integer endpoints the interpolation is
  // exact real arithmetic in any formula order, so Spark's percentile()
  // and DuckDB's quantile_cont() produce bit-identical doubles — no
  // rounding needed (a float-quantile interpolation can differ by an
  // ulp between engines). One shuffle; percentile is a sort-based agg
  // per group, bounded by group size.
  def x43_quantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("cents", floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .groupBy("o_orderpriority")
      .agg((expr("percentile(cents, 0.25)") / 100.0).as("p25"),
        (expr("percentile(cents, 0.5)") / 100.0).as("p50"),
        (expr("percentile(cents, 0.75)") / 100.0).as("p75"),
        count(when(col("o_totalprice") > 200000, 1)).as("n_high"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val x43Sql: String =
    """WITH c AS (SELECT o_orderpriority, o_totalprice,
      |             floor(o_totalprice * 100 + 0.5)::BIGINT AS cents FROM orders)
      |SELECT o_orderpriority,
      |  quantile_cont(cents, 0.25) / 100.0 AS p25,
      |  quantile_cont(cents, 0.5) / 100.0 AS p50,
      |  quantile_cont(cents, 0.75) / 100.0 AS p75,
      |  count(*) FILTER (WHERE o_totalprice > 200000)::BIGINT AS n_high,
      |  count(*)::BIGINT AS n
      |FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // x44: array-function battery — sort, slice, distinct-intersect,
  // overlap against a constant stoplist. Narrow projection; tokens come
  // from the shared persisted posting-free array form (one tokenize).
  def x44_array_funcs(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = array(Seq("the", "and", "of", "to", "a").map(lit): _*)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.Tokenize.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        concat_ws(" ", slice(sort_array(col("toks")), 1, 3)).as("first3"),
        size(array_intersect(col("toks"), stop)).as("n_stop"),
        arrays_overlap(col("toks"), stop).as("has_stop"))
      .orderBy("doc_id")
  }

  val x44Sql: String =
    s"""WITH t AS (SELECT doc_id, $SqlTok AS toks FROM documents)
       |SELECT doc_id,
       |  array_to_string(list_slice(list_sort(toks), 1, 3), ' ') AS first3,
       |  len(list_filter(list_distinct(toks),
       |      x -> list_contains(['the','and','of','to','a'], x)))::INT AS n_stop,
       |  list_has_any(toks, ['the','and','of','to','a']) AS has_stop
       |FROM t ORDER BY doc_id""".stripMargin

  // x45: ordered string aggregation (LISTAGG/string_agg) — top-5 order
  // keys per priority as a CSV in rank order. collect_list has no
  // ordering guarantee, so the rank is captured IN the collected struct
  // and sort_array restores it deterministically after the shuffle —
  // the scalable ordered-agg recipe (bounded per group by the rank
  // filter, never corpus-sized).
  def x45_string_agg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .groupBy("o_orderpriority")
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("rn"), col("o_orderkey")))),
          s => s.getField("o_orderkey").cast("string")), ",").as("top5_keys"))
      .orderBy("o_orderpriority")
  }

  val x45Sql: String =
    """WITH ranked AS (SELECT o_orderpriority, o_orderkey,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_orderpriority, string_agg(o_orderkey, ',' ORDER BY rn) AS top5_keys
      |FROM ranked WHERE rn <= 5
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ======================================================================
  // x47: repetition-based quality signals (the Gopher/Dolma-style
  // filters an LLM-data pipeline runs before training): per doc, the
  // fraction of 3-gram occurrences that are duplicates and the share
  // of the single most frequent 2-gram. Highly repetitive docs
  // (boilerplate, keyword stuffing, generation loops) score high on
  // both. Plan: the n-gram arrays stay per-row (array functions — no
  // explode) for the dup fraction; the top-2-gram needs the gram
  // posting, one explode + two groupBys keyed by doc_id — per-doc
  // cardinality is bounded by doc length, shuffles are linear in
  // corpus size, nothing is quadratic at 100 TB.
  def x47_repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Tokenize
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        Tokenize.shingles(col("toks"), 2).as("g2"),
        Tokenize.shingles(col("toks"), 3).as("g3"))
    val arr = base.select(col("doc_id"),
      size(col("g3")).as("total3"),
      size(array_distinct(col("g3"))).as("distinct3"),
      size(col("g2")).as("total2"))
    val top2 = base.select(col("doc_id"), explode(col("g2")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max(col("cnt")).as("top2"))
    arr.join(top2, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(when(col("total3") > 0,
          lit(1.0) - col("distinct3").cast("double") / col("total3"))
          .otherwise(lit(0.0)), 6).as("dup_3gram_frac"),
        round(when(col("total2") > 0,
          coalesce(col("top2"), lit(0L)).cast("double") / col("total2"))
          .otherwise(lit(0.0)), 6).as("top_2gram_frac"))
      .orderBy("doc_id")
  }

  val x47Sql: String =
    s"""WITH tok AS (SELECT doc_id, $SqlTok AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |    i -> array_to_string(list_slice(toks, i, i + 1), ' ')) AS g2,
       |  list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
       |    i -> array_to_string(list_slice(toks, i, i + 2), ' ')) AS g3
       |  FROM tok),
       |arrs AS (SELECT doc_id, len(g3) AS total3,
       |         len(list_distinct(g3)) AS distinct3, len(g2) AS total2 FROM sh),
       |g2e AS (SELECT doc_id, unnest(g2) AS g FROM sh),
       |cnt AS (SELECT doc_id, g, count(*) AS c FROM g2e GROUP BY doc_id, g),
       |top2 AS (SELECT doc_id, max(c) AS top2 FROM cnt GROUP BY doc_id)
       |SELECT a.doc_id,
       |  round(CASE WHEN a.total3 > 0 THEN 1.0 - a.distinct3::DOUBLE / a.total3 ELSE 0.0 END, 6) AS dup_3gram_frac,
       |  round(CASE WHEN a.total2 > 0 THEN coalesce(t.top2, 0)::DOUBLE / a.total2 ELSE 0.0 END, 6) AS top_2gram_frac
       |FROM arrs a LEFT JOIN top2 t USING (doc_id) ORDER BY a.doc_id""".stripMargin

  // ======================================================================
  // x48: PII masking — the redaction pass an LLM-data pipeline runs
  // before training (emails, URLs, long digit runs). Patterns live in
  // the PCRE∩RE2 common subset with NO backslash metachars ([.]
  // instead of \\.) so the identical pattern text parses the same in
  // Java regex and RE2. Masking order matters (emails contain digits,
  // URLs contain dots) and is identical in both engines. Output keeps
  // the counts and an md5 of the masked text — value-exact proof of
  // the full replacement, without hashing megabytes into the result.
  // Pure codegen'd projection; no shuffle before the sort.
  private[queries] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private[queries] val UrlRe = "https?://[^ ]+"
  private[queries] val NumRe = "[0-9]{4,}"

  /** Total PII hit count over the named text column — the x48 counters
    * as one reusable expression (the dataset card flags docs with any
    * hit).
    */
  private[queries] def piiCount(textCol: String): org.apache.spark.sql.Column =
    size(expr(s"regexp_extract_all($textCol, '$EmailRe', 0)")) +
      size(expr(s"regexp_extract_all($textCol, '$UrlRe', 0)")) +
      size(expr(s"regexp_extract_all($textCol, '$NumRe', 0)"))

  /** The x48 projection over any (doc_id, text) frame — private[graft]
    * so the spec can drive the rewrite on synthetic PII (the testdata
    * corpus contains none, which exercises only the no-op path).
    */
  private[graft] def piiMask(docs: DataFrame): DataFrame =
    piiMaskOf(docs).orderBy("doc_id")

  /** The mask projection WITHOUT the presentation sort — the Pipeline
    * rewrites its whole corpus through this and every downstream stage
    * re-shuffles anyway, so x48's orderBy would be a wasted global
    * sort there. `keep` names input columns to carry through untouched
    * (the Pipeline threads `lang` to the per-language vectorizer);
    * x48's own output schema stays pinned by passing none.
    */
  private[graft] def piiMaskOf(docs: DataFrame,
      keep: Seq[String] = Nil): DataFrame =
    docs.select((col("doc_id") +: keep.map(col)) ++ Seq(
      // group idx 0 (whole match) MUST be explicit: Spark's default is
      // group 1, which THROWS on a groupless pattern — but only when a
      // row actually matches, so the bug hides on match-free data
      size(expr(s"regexp_extract_all(text, '$EmailRe', 0)")).as("n_emails"),
      size(expr(s"regexp_extract_all(text, '$UrlRe', 0)")).as("n_urls"),
      size(expr(s"regexp_extract_all(text, '$NumRe', 0)")).as("n_longnums"),
      md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
        EmailRe, "<EMAIL>"), UrlRe, "<URL>"), NumRe, "<NUM>"))
        .as("masked_hash"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        EmailRe, "<EMAIL>"), UrlRe, "<URL>"), NumRe, "<NUM>")
        .as("masked")): _*)

  def x48_pii_mask(spark: SparkSession, sfDir: String): DataFrame =
    piiMask(Tables.documents(spark, sfDir)).drop("masked")

  val x48Sql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$EmailRe'))::INT AS n_emails,
       |  len(regexp_extract_all(text, '$UrlRe'))::INT AS n_urls,
       |  len(regexp_extract_all(text, '$NumRe'))::INT AS n_longnums,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'), '$UrlRe', '<URL>', 'g'),
       |    '$NumRe', '<NUM>', 'g')) AS masked_hash
       |FROM documents ORDER BY doc_id""".stripMargin

  // ======================================================================
  // x53: ordered conversion funnel (view -> click -> purchase) — the
  // classic event-analytics shape: each stage's timestamp is the
  // earliest qualifying event STRICTLY AFTER the previous stage, so an
  // out-of-order click-before-view does not count. Three user-keyed
  // aggregations chained by joins — every shuffle is on user_id,
  // stage tables shrink monotonically, nothing scans event pairs.
  // Timestamps surface as whole epoch seconds (truncation agreed with
  // the oracle) for hash-stable output.
  def x53_funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelFrom(Tables.events(spark, sfDir).select("user_id", "event_type", "ts"))

  /** The funnel core over any (user_id, event_type, ts) frame — split
    * out so the strict-ordering tie semantics (a click at EXACTLY
    * t_view does not advance the funnel) are pinned on a fixture in
    * SemanticsSpec, not only exercised through whatever ties the
    * generated testdata happens to contain.
    */
  private[graft] def funnelFrom(ev: DataFrame): DataFrame = {
    val users = ev.select("user_id").distinct()
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    users.join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        unix_timestamp(col("t_view")).as("t_view"),
        unix_timestamp(col("t_click")).as("t_click"),
        unix_timestamp(col("t_purchase")).as("t_purchase"),
        (col("t_view").isNotNull.cast("int") +
          col("t_click").isNotNull.cast("int") +
          col("t_purchase").isNotNull.cast("int")).as("funnel_stage"))
      .orderBy("user_id")
  }

  val x53Sql: String =
    """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
      |u AS (SELECT DISTINCT user_id FROM e),
      |s1 AS (SELECT user_id, min(ts) AS t_view FROM e
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t_click FROM e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s1.t_view GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_click GROUP BY e.user_id)
      |SELECT u.user_id,
      |  floor(epoch(s1.t_view))::BIGINT AS t_view,
      |  floor(epoch(s2.t_click))::BIGINT AS t_click,
      |  floor(epoch(s3.t_purchase))::BIGINT AS t_purchase,
      |  ((s1.user_id IS NOT NULL)::INT + (s2.user_id IS NOT NULL)::INT +
      |   (s3.user_id IS NOT NULL)::INT) AS funnel_stage
      |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |  LEFT JOIN s3 USING (user_id)
      |ORDER BY u.user_id""".stripMargin

  // ======================================================================
  // x54: weekly cohort retention — users cohorted by the week of their
  // first event, activity counted per (cohort, week-offset). Two
  // user-keyed aggregations + one (cohort, offset) rollup; the
  // activity table is distinct (user, week) so its size is bounded by
  // users × weeks, never raw events. Both engines truncate weeks to
  // Monday, so the cohort keys agree.
  def x54_cohort_retention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
    val first = ev.groupBy("user_id").agg(min(col("w")).as("cohort_w"))
    val active = ev.distinct()
    val joined = active.join(first, Seq("user_id"))
      .withColumn("offset",
        (datediff(col("w"), col("cohort_w")) / 7).cast("int"))
    val ret = joined.groupBy("cohort_w", "offset")
      .agg(count(lit(1)).as("n_active"))
    val sizes = first.groupBy("cohort_w").agg(count(lit(1)).as("cohort_size"))
    ret.join(sizes, Seq("cohort_w"))
      .select(col("cohort_w").cast("date").cast("string").as("cohort_week"),
        col("offset"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("cohort_week", "offset")
  }

  val x54Sql: String =
    """WITH e AS (SELECT DISTINCT user_id, date_trunc('week', ts::TIMESTAMP) AS w FROM events),
      |f AS (SELECT user_id, min(w) AS cohort_w FROM e GROUP BY user_id),
      |j AS (SELECT e.user_id, f.cohort_w, e.w,
      |      (date_diff('day', f.cohort_w, e.w) // 7)::INT AS "offset"
      |      FROM e JOIN f USING (user_id)),
      |ret AS (SELECT cohort_w, "offset", count(*) AS n_active
      |        FROM j GROUP BY cohort_w, "offset"),
      |sizes AS (SELECT cohort_w, count(*) AS cohort_size FROM f GROUP BY cohort_w)
      |SELECT r.cohort_w::DATE::VARCHAR AS cohort_week, r."offset",
      |  r.n_active::BIGINT AS n_active, s.cohort_size::BIGINT AS cohort_size,
      |  round(r.n_active::DOUBLE / s.cohort_size, 6) AS retention
      |FROM ret r JOIN sizes s USING (cohort_w)
      |ORDER BY cohort_week, r."offset"""".stripMargin

  // ======================================================================
  // x63: distinct counts from MERGED sketch artifacts — x34's battery
  // re-answered without a full-data distinct. The corpus is sketched in
  // two independent slices (stand-ins for ingest batches) and the
  // slices' HLL sketches are unioned on read (SketchStore.merge): at
  // 100 TB each batch aggregates once into kilobyte sketch rows, and
  // corpus-wide distincts never rescan history — countDistinct's exact
  // shuffle moves every (group, value) pair, the sketch table moves one
  // small row per (slice, group). Approximate by design (HLL lgK=12
  // ≈ 1.6% RSE; SketchSpec pins the bound against exact x34), so
  // rows-only in the oracle contract, like the other ML/approx queries.
  def x63_sketch_distinct(spark: SparkSession, sfDir: String): DataFrame = {
    // slice = the ingest-batch stand-in: per-(slice, group) sketches
    // built in ONE scan (slice as an extra group key), then merged
    // per group — exactly the shape of N batch sketch tables unioned
    // on read, without paying N scans to stage the demo
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")).cast("string"))
      .withColumn("slice", pmod(col("user_id"), lit(2)))
    val sliced = graft.sources.SketchStore.sketchTable(
      ev, Seq("event_type", "slice"), Seq("user_id", "day"), Nil)
    graft.sources.SketchStore.merge(
      Seq(sliced.drop("slice")), Seq("event_type"))
      .select(col("event_type"),
        hll_sketch_estimate(col("user_id_hll")).as("n_users_est"),
        hll_sketch_estimate(col("day_hll")).as("n_days_est"),
        col("n_rows").as("n_events"))
      .orderBy("event_type")
  }

  // x64: quantiles from MERGED sketch artifacts — x43's percentiles
  // without holding each group's full value set. Spark has no mergeable
  // quantile sketch in SQL, so this exercises the engine's own KLL
  // aggregation (functions.KllExpressions, DataSketches KLL k=200
  // ≈ 1.65% rank error — SketchSpec pins the rank bound against exact
  // x43). Same two-slice merge shape as x63; exact percentile() sorts
  // every group in memory, the sketch table is map-side combinable and
  // O(k) per group. Rows-only: KLL compaction is randomized, values
  // within the rank bound vary run to run.
  def x64_sketch_quantiles(spark: SparkSession, sfDir: String): DataFrame = {
    // same one-scan slice shape as x63
    val o = Tables.orders(spark, sfDir)
      .withColumn("cents", floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .withColumn("slice", pmod(col("o_orderkey"), lit(2)))
    val sliced = graft.sources.SketchStore.sketchTable(
      o, Seq("o_orderpriority", "slice"), Nil, Seq("cents"))
    import graft.functions.KllExpressions.kll_quantile
    graft.sources.SketchStore.merge(
      Seq(sliced.drop("slice")), Seq("o_orderpriority"))
      .select(col("o_orderpriority"),
        (kll_quantile(col("cents_kll"), 0.25) / 100.0).as("p25"),
        (kll_quantile(col("cents_kll"), 0.5) / 100.0).as("p50"),
        (kll_quantile(col("cents_kll"), 0.75) / 100.0).as("p75"),
        col("n_rows").as("n"))
      .orderBy("o_orderpriority")
  }

  // ======================================================================
  // x65: top tokens from MERGED frequency sketches — x24's heavy
  // hitters without shuffling every distinct (lang, token) pair. The
  // frequent-items aggregation (functions.FreqExpressions, DataSketches
  // Misra-Gries) carries at most maxMapSize entries per group through
  // partials, merges, and the artifact, so the state is bounded no
  // matter how wide the vocabulary gets at 100 TB; estimates come with
  // lower/upper bounds and a no-false-negatives guarantee (SketchSpec
  // pins both against exact x24). Same two-slice merge shape as
  // x63/x64. Rows-only: items near the error boundary may differ
  // run to run (the top-5 of a Zipf corpus never does, but the
  // CONTRACT is approximate).
  def x65_sketch_topk(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), pmod(col("doc_id"), lit(2)).as("slice"),
        explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
    val sliced = graft.sources.SketchStore.sketchTable(
      toks, Seq("lang", "slice"), Nil, Nil, Seq("token"))
    graft.sources.SketchStore.merge(
      Seq(sliced.drop("slice")), Seq("lang"))
      .select(col("lang"), posexplode(
        graft.functions.FreqExpressions.freq_top_k(col("token_freq"), 5))
        .as(Seq("idx", "hit")))
      .select(col("lang"), (col("idx") + 1).cast("int").as("rnk"),
        col("hit.item").as("token"), col("hit.est").as("occ_est"),
        col("hit.lb").as("occ_lb"), col("hit.ub").as("occ_ub"))
      .orderBy("lang", "rnk")
  }

  // ======================================================================
  // x66: release-overlap estimates from theta sketches — the set-ops
  // leg. "How much of release B's content is already in release A" is
  // a set intersection over content units; exact answers join the two
  // sets (a shuffle over every unit of both at 100 TB), theta sketches
  // answer from two kilobyte artifacts built in ONE pass (conditional
  // aggregation — no per-release filter branches). Intersection /
  // difference are what HLL cannot do; below 2^lgK retained entries
  // the estimates are exact (SketchSpec pins them against exact set
  // algebra; rows-only here since estimates are approximate by
  // contract). The content unit is the 3-gram shingle — the same unit
  // the dedup/contamination family measures with, riding the SAME
  // shared posting cache as x02/x04 — and the releases are the doc_id
  // parity slices, which overlap through near-dups and shared
  // phrasing (the corpus has no byte-identical texts, so whole-doc
  // hashing would make every release disjoint).
  def x66_sketch_overlap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.ThetaExpressions._
    val lgK = 16 // exact through test scale; ~0.4% RSE beyond
    val sh = ExtensionQueries.docShingles(Tables.documents(spark, sfDir))
      .withColumn("release", pmod(col("doc_id"), lit(2)))
    val sk = sh.agg(
      theta_agg(when(col("release") === 0, col("shingle")), lgK).as("sk_a"),
      theta_agg(when(col("release") === 1, col("shingle")), lgK).as("sk_b"))
    sk.select(
      round(theta_estimate(col("sk_a")), 0).cast("long").as("n_a"),
      round(theta_estimate(col("sk_b")), 0).cast("long").as("n_b"),
      round(theta_intersect_estimate(col("sk_a"), col("sk_b")), 0)
        .cast("long").as("n_common"),
      round(theta_diff_estimate(col("sk_a"), col("sk_b")), 0)
        .cast("long").as("n_only_a"),
      round(theta_union_estimate(col("sk_a"), col("sk_b")), 0)
        .cast("long").as("n_total"))
  }

  // ======================================================================
  // x89: Z-order layout audit — the multi-dimensional data-clustering
  // decision a 100 TB table's writer makes so that point/range
  // predicates on MULTIPLE columns each prune files. Events are
  // clustered on (user_id, event hour): both dims are min-max scaled
  // to 16 bits, bit-interleaved into a 32-bit Morton key, and files
  // are modeled as the 32 z-PREFIX buckets (top 5 bits — exactly the
  // z-range boxes a lakehouse writer produces, no global sort, no
  // single-partition window). Per bucket the query reports the
  // per-dimension min/max envelope — the file-skipping statistics a
  // reader consults — and whether a canned center-quarter predicate
  // on BOTH dims touches the bucket: with z-ordering, a 2-D selective
  // predicate touches a small fraction of buckets, where any 1-D sort
  // layout leaves one of the two dims unclustered (every file
  // touched). Shapes: one tiny global-extent agg broadcast to one
  // corpus-linear projection + one 32-key groupBy; the interleave is
  // pure codegen'd bit arithmetic. Nothing here is testdata-sized
  // state: at 100 TB the same plan emits the same 32 rows.
  def x89_zorder_layout(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as("u"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
    val ext = e.agg(min(col("u")).as("lo_u"), max(col("u")).as("hi_u"),
      min(col("hr")).as("lo_h"), max(col("hr")).as("hi_h"))
    val scaled = e.crossJoin(broadcast(ext))
      .withColumn("u16", expr("((u - lo_u) * 65535) div greatest(hi_u - lo_u, 1)"))
      .withColumn("h16", expr("((hr - lo_h) * 65535) div greatest(hi_h - lo_h, 1)"))
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(col("u16"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(col("h16"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    scaled.withColumn("bucket", shiftright(z, 27))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_events"),
        min(col("u")).as("min_user"), max(col("u")).as("max_user"),
        min(col("hr")).as("min_hour"), max(col("hr")).as("max_hour"),
        first(col("lo_u")).as("lo_u"), first(col("hi_u")).as("hi_u"),
        first(col("lo_h")).as("lo_h"), first(col("hi_h")).as("hi_h"))
      .select(col("bucket"),
        col("n_events"),
        col("min_user"), col("max_user"), col("min_hour"), col("max_hour"),
        (!(col("max_user") < col("lo_u") + expr("(hi_u - lo_u) div 4") ||
           col("min_user") > col("lo_u") + expr("(hi_u - lo_u) div 2") ||
           col("max_hour") < col("lo_h") + expr("(hi_h - lo_h) div 4") ||
           col("min_hour") > col("lo_h") + expr("(hi_h - lo_h) div 2")))
          .as("touched"))
      .orderBy("bucket")
  }

  val x89Sql: String =
    s"""WITH e AS (SELECT user_id::BIGINT AS u,
       |           epoch_us(ts::TIMESTAMP) // 3600000000 AS hr FROM events),
       |ext AS (SELECT min(u) AS lo_u, max(u) AS hi_u,
       |        min(hr) AS lo_h, max(hr) AS hi_h FROM e),
       |s AS (SELECT u, hr,
       |      ((u - lo_u) * 65535) // greatest(hi_u - lo_u, 1) AS u16,
       |      ((hr - lo_h) * 65535) // greatest(hi_h - lo_h, 1) AS h16,
       |      lo_u, hi_u, lo_h, hi_h FROM e, ext),
       |zc AS (SELECT u, hr, lo_u, hi_u, lo_h, hi_h,
       |       (${(0 until 16).map(i =>
                  s"(((u16 >> $i) & 1) << ${2 * i}) | (((h16 >> $i) & 1) << ${2 * i + 1})")
                  .mkString(" | ")}) AS z
       |       FROM s)
       |SELECT z >> 27 AS bucket, count(*)::BIGINT AS n_events,
       |  min(u) AS min_user, max(u) AS max_user,
       |  min(hr) AS min_hour, max(hr) AS max_hour,
       |  NOT (max(u) < any_value(lo_u) + (any_value(hi_u) - any_value(lo_u)) // 4
       |    OR min(u) > any_value(lo_u) + (any_value(hi_u) - any_value(lo_u)) // 2
       |    OR max(hr) < any_value(lo_h) + (any_value(hi_h) - any_value(lo_h)) // 4
       |    OR min(hr) > any_value(lo_h) + (any_value(hi_h) - any_value(lo_h)) // 2)
       |    AS touched
       |FROM zc GROUP BY bucket ORDER BY bucket""".stripMargin

  // ======================================================================
  // x95: trailing-window anomaly detection — the monitoring pass a
  // production ingest runs over its own event stream: hourly counts
  // per event type, gap-filled to a dense hour spine (a silent-hour
  // ZERO is exactly the anomaly a sparse frame would hide), then a
  // per-type trailing 24-hour mean/stddev and the z-score flag
  // (|z| > 3). Shapes: the hour spine is types × hours (a kilobyte
  // dimension even over years), counts are ONE corpus-linear shuffle
  // on (type, hour), and the trailing stats are an entity-partitioned
  // window — never a global sort. Warm-up is gated on a FULL frame
  // (round-10 ADVICE: with rowsBetween(-24,-1) only hours 1-2 are
  // structurally unflaggable, and a partial-window z-score over a few
  // samples is noise): the trailing mean/stddev still publish as they
  // fill in, but the anomaly FLAG requires all 24 trailing hours —
  // each type's first 24 hours never fire, identically in both
  // engines.
  def x95_anomaly_hours(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
    val cnt = e.groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
    val hours = e.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("hr"))
    val spine = e.select("event_type").distinct().crossJoin(broadcast(hours))
    val filled = spine.join(cnt, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
    filled
      .withColumn("mu", avg(col("cnt")).over(w))
      .withColumn("sd", stddev_samp(col("cnt")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .select(col("event_type"), col("hr"), col("cnt"),
        round(coalesce(col("mu"), lit(0.0)), 6).as("mu"),
        round(when(col("sd") > 0, (col("cnt") - col("mu")) / col("sd"))
          .otherwise(lit(0.0)), 6).as("z"),
        coalesce(col("nw") === 24 && col("sd") > 0 &&
          abs((col("cnt") - col("mu")) / col("sd")) > 3, lit(false))
          .as("anomaly"))
      .orderBy("event_type", "hr")
  }

  val x95Sql: String =
    """WITH e AS (SELECT event_type,
      |           epoch_us(ts::TIMESTAMP) // 3600000000 AS hr FROM events),
      |c AS (SELECT event_type, hr, count(*)::BIGINT AS cnt FROM e GROUP BY 1, 2),
      |hours AS (SELECT unnest(range(min(hr), max(hr) + 1))::BIGINT AS hr FROM e),
      |types AS (SELECT DISTINCT event_type FROM e),
      |spine AS (SELECT t.event_type, h.hr FROM types t CROSS JOIN hours h),
      |f AS (SELECT s.event_type, s.hr, coalesce(c.cnt, 0)::BIGINT AS cnt
      |      FROM spine s LEFT JOIN c USING (event_type, hr)),
      |wn AS (SELECT event_type, hr, cnt,
      |  avg(cnt) OVER w AS mu, stddev_samp(cnt) OVER w AS sd,
      |  count(*) OVER w AS nw
      |  FROM f WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hr, cnt,
      |  round(coalesce(mu, 0.0), 6) AS mu,
      |  round(CASE WHEN sd > 0 THEN (cnt - mu) / sd ELSE 0.0 END, 6) AS z,
      |  (CASE WHEN nw = 24 AND sd IS NOT NULL AND sd > 0
      |    AND abs((cnt - mu) / sd) > 3
      |    THEN true ELSE false END) AS anomaly
      |FROM wn ORDER BY event_type, hr""".stripMargin

  // ======================================================================
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_sql_api" -> (q28_sql_api _),
    "x30_grouping_cube" -> (x30_grouping_cube _),
    "x31_range_join" -> (x31_range_join _),
    "x32_gap_fill" -> (x32_gap_fill _),
    "x33_window_frames" -> (x33_window_frames _),
    "x34_distinct_battery" -> (x34_distinct_battery _),
    "x35_sentences" -> (x35_sentences _),
    "x36_map_funcs" -> (x36_map_funcs _),
    "x37_regex" -> (x37_regex _),
    "x38_csv_roundtrip" -> (x38_csv_roundtrip _),
    "x39_json_roundtrip" -> (x39_json_roundtrip _),
    "x40_partition_prune" -> (x40_partition_prune _),
    "x41_salted_agg" -> (x41_salted_agg _),
    "x89_zorder_layout" -> (x89_zorder_layout _),
    "x95_anomaly_hours" -> (x95_anomaly_hours _),
    "x42_merge_upsert" -> (x42_merge_upsert _),
    "x43_quantiles" -> (x43_quantiles _),
    "x44_array_funcs" -> (x44_array_funcs _),
    "x45_string_agg" -> (x45_string_agg _),
    "x47_repetition" -> (x47_repetition _),
    "x48_pii_mask" -> (x48_pii_mask _),
    "x53_funnel" -> (x53_funnel _),
    "x54_cohort_retention" -> (x54_cohort_retention _),
    // rows-only (approx sketch estimates — no DuckDB oracle): the
    // tolerance bounds vs exact x34/x43 are pinned in SketchSpec
    "x63_sketch_distinct" -> (x63_sketch_distinct _),
    "x64_sketch_quantiles" -> (x64_sketch_quantiles _),
    "x65_sketch_topk" -> (x65_sketch_topk _),
    "x66_sketch_overlap" -> (x66_sketch_overlap _))

  val oracleSql: Map[String, String] = Map(
    "q28_sql_api" -> q28Sql,
    "x30_grouping_cube" -> x30Sql,
    "x31_range_join" -> x31Sql,
    "x32_gap_fill" -> x32Sql,
    "x33_window_frames" -> x33Sql,
    "x34_distinct_battery" -> x34Sql,
    "x35_sentences" -> x35Sql,
    "x36_map_funcs" -> x36Sql,
    "x37_regex" -> x37Sql,
    "x38_csv_roundtrip" -> x38Sql,
    "x39_json_roundtrip" -> x39Sql,
    "x40_partition_prune" -> x40Sql,
    "x89_zorder_layout" -> x89Sql,
    "x95_anomaly_hours" -> x95Sql,
    "x41_salted_agg" -> x41Sql,
    "x42_merge_upsert" -> x42Sql,
    "x43_quantiles" -> x43Sql,
    "x44_array_funcs" -> x44Sql,
    "x45_string_agg" -> x45Sql,
    "x47_repetition" -> x47Sql,
    "x48_pii_mask" -> x48Sql,
    "x53_funnel" -> x53Sql,
    "x54_cohort_retention" -> x54Sql)
}
