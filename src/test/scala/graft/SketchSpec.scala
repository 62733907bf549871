package graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsQueries
import graft.sources.{SketchStore, VersionedStore}

/** Mergeable sketch artifacts: the estimates must sit inside the
  * sketches' published error bounds against the EXACT twin queries
  * (x34 distinct battery, x43 quantiles), slice-merged sketches must
  * agree with whole-corpus sketches, and the published store must
  * answer corpus stats without ever rescanning a corpus row.
  */
class SketchSpec extends AnyFunSuite with SparkSpec {

  test("x63 HLL estimates track exact x34 within the sketch error bound") {
    val est = AnalyticsQueries.x63_sketch_distinct(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val exact = AnalyticsQueries.x34_distinct_battery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (k, (users, days, events)) =>
      val (uEst, dEst, nEv) = est(k)
      // the additive counter rides exactly
      assert(nEv === events, s"$k n_events")
      // lgK=12 => RSE ~= 1.04/sqrt(4096) ~= 1.6%; 3 sigma bound (and
      // below ~2^12 distincts HLL is still in exact sparse mode, so
      // test-scale estimates are typically spot-on)
      assert(math.abs(uEst.toDouble / users - 1) <= 0.05,
        s"$k n_users est $uEst vs exact $users")
      assert(math.abs(dEst.toDouble / days - 1) <= 0.05,
        s"$k n_days est $dEst vs exact $days")
    }
  }

  test("HLL: slice sketches merged == whole-corpus sketch, estimate-exact") {
    val ev = Tables.events(spark, sf)
    def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("event_type"),
        hll_sketch_estimate(col("user_id_hll")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = SketchStore.sketchTable(
      ev, Seq("event_type"), Seq("user_id"), Nil)
    val slices = Seq(0, 1).map(h => SketchStore.sketchTable(
      ev.filter(pmod(col("user_id"), lit(2)) === h),
      Seq("event_type"), Seq("user_id"), Nil))
    // HLL state is register-max, order- and partition-independent:
    // union of slice sketches carries the SAME registers as the
    // whole-corpus sketch, so the estimates are identical, not merely
    // close — this is what makes per-batch sketch tables a lossless
    // substitute for a full rescan
    assert(estimates(SketchStore.merge(slices, Seq("event_type")))
      === estimates(whole))
  }

  test("x64 KLL quantiles sit within the rank-error bound of exact x43 data") {
    // KLL guarantees RANK accuracy, not value accuracy: assert that
    // each returned quantile VALUE's true rank in the group's data is
    // within eps of the requested rank (2x: two slice sketches merged)
    val eps = 2 * org.apache.datasketches.kll.KllSketch.getNormalizedRankError(
      graft.functions.KllExpressions.DefaultK, false)
    val byPrio = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = AnalyticsQueries.x64_sketch_quantiles(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === byPrio.keySet)
    rows.foreach { r =>
      val data = byPrio(r.getString(0))
      assert(r.getLong(4) === data.length.toLong, "n must be exact")
      Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2), 0.75 -> r.getDouble(3))
        .foreach { case (p, dollars) =>
          val cents = math.rint(dollars * 100).toLong
          val rank = data.count(_ <= cents).toDouble / data.length
          assert(math.abs(rank - p) <= eps,
            s"${r.getString(0)} p$p: value $cents has rank $rank")
        }
    }
  }

  test("published sketch batches merge on read; no corpus row is rescanned") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val root = java.nio.file.Files
      .createTempDirectory("graft_sketch").toString + "/store"
    val ev = Tables.events(spark, sf)
    // three ingest batches (disjoint corpus slices), sketched and
    // published independently — history is never re-read
    (0 until 3).foreach { h =>
      SketchStore.publishBatch(SketchStore.sketchTable(
        ev.filter(pmod(col("user_id"), lit(3)) === h),
        Seq("event_type"), Seq("user_id"), Seq("value")), root)
    }
    val merged = SketchStore.mergedStats(spark, root, Seq("event_type"))

    // contract: the merged-stats plan reads ONLY the sketch store —
    // a regression recomputing from raw events would scan their parquet
    val scans = merged.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    assert(scans.nonEmpty && scans.forall(_.startsWith(
      new org.apache.hadoop.fs.Path(root).toUri.getPath.toString)),
      s"merged stats scans outside the sketch store: $scans")

    // and the merged artifact answers like a whole-corpus sketch
    val whole = SketchStore.sketchTable(
      ev, Seq("event_type"), Seq("user_id"), Seq("value"))
    def users(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("event_type"),
        hll_sketch_estimate(col("user_id_hll")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(users(merged) === users(whole))
    assert(merged.select(sum("n_rows")).head().getLong(0) === ev.count())

    // a publish that crashed between its parquet write and the version
    // marker leaves an ORPHAN version dir whose content the retry
    // republished — mergedStats must skip it (no completion stamp) or
    // the crashed batch double-counts. Simulate: copy slice v=0's
    // parquet to an unstamped v=9, republish a real batch above it.
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(root, "v=0"), fs,
      new org.apache.hadoop.fs.Path(root, "v=9"), false, true,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "v=9/_graft_slice_ok"), false)
    SketchStore.publishBatch(SketchStore.sketchTable(
      ev.limit(0), Seq("event_type"), Seq("user_id"), Seq("value")), root)
    val afterOrphan = SketchStore.mergedStats(spark, root, Seq("event_type"))
    assert(afterOrphan.select(sum("n_rows")).head().getLong(0) === ev.count(),
      "orphan slice was double-counted")

    // compaction folds every stamped slice into one, losslessly: the
    // merged answer is unchanged, the read cost drops to one slice,
    // the unstamped orphan stays excluded, and a batch landing
    // afterwards merges on top as before
    val v0save = new org.apache.hadoop.fs.Path(root, "v0_save")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(root, "v=0"), fs, v0save, false, true,
      spark.sparkContext.hadoopConfiguration)
    SketchStore.compact(spark, root, Seq("event_type"))
    val afterCompact = SketchStore.mergedStats(spark, root, Seq("event_type"))
    assert(users(afterCompact) === users(whole))
    assert(afterCompact.select(sum("n_rows")).head().getLong(0) === ev.count())

    // compaction crash window: the merged slice was stamped but a
    // retirement delete failed, leaving a stamped input behind — the
    // manifest must keep excluding it, or the batch double-counts
    org.apache.hadoop.fs.FileUtil.copy(fs, v0save, fs,
      new org.apache.hadoop.fs.Path(root, "v=0"), false, true,
      spark.sparkContext.hadoopConfiguration)
    val withLeftover = SketchStore.mergedStats(spark, root, Seq("event_type"))
    assert(withLeftover.select(sum("n_rows")).head().getLong(0) === ev.count(),
      "retired leftover slice was double-counted")
  }

  test("x65 frequency-sketch top tokens equal exact x24 while under capacity") {
    // the corpus vocabulary (~31 tokens/lang) fits the 128-entry map,
    // and a Misra-Gries sketch that never evicts is EXACT — so the
    // merged-slice top-5 must reproduce x24's window-ranked answer
    // including counts and the occ-desc/token-asc tiebreak
    val est = AnalyticsQueries.x65_sketch_topk(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val exact = graft.queries.ExtensionQueries.x24_top_tokens(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(est.toSeq === exact.toSeq)
  }

  test("frequency sketch under eviction pressure: bounds hold, no false negatives") {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    // force the approximate regime: map of 8 over a ~31-token
    // vocabulary must evict, so estimates carry real error
    val toks = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
    val bytes = toks
      .agg(graft.functions.FreqExpressions.freq_agg(col("token"), 8).as("s"))
      .head().getAs[Array[Byte]](0)
    val sk = ItemsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(bytes), new ArrayOfStringsSerDe)
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.getStreamLength === exact.values.sum)
    assert(sk.getMaximumError > 0, "a map of 8 over 31 tokens must evict")
    // every estimate brackets the true count
    exact.foreach { case (t, n) =>
      assert(sk.getLowerBound(t) <= n && n <= sk.getUpperBound(t),
        s"$t: true $n outside [${sk.getLowerBound(t)}, ${sk.getUpperBound(t)}]")
    }
    // no false negatives: every token above the error bound surfaces
    val surfaced = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSet
    exact.collect { case (t, n) if n > sk.getMaximumError => t }
      .foreach(t => assert(surfaced.contains(t), s"heavy hitter $t missed"))
  }

  test("frequency sketches of slices merged == whole-corpus sketch under capacity") {
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
    def top(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.select(col("lang"), graft.functions.FreqExpressions
        .freq_top_k(col("token_freq"), 3).cast("string").as("top"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toSeq.sorted
    val whole = SketchStore.sketchTable(
      toks, Seq("lang"), Nil, Nil, Seq("token"))
    val slices = Seq(0, 1, 2).map(h => SketchStore.sketchTable(
      toks.filter(pmod(col("doc_id"), lit(3)) === h),
      Seq("lang"), Nil, Nil, Seq("token")))
    assert(top(SketchStore.merge(slices, Seq("lang"))) === top(whole))
  }

  test("x66 theta overlap estimates equal exact set algebra under capacity") {
    val r = AnalyticsQueries.x66_sketch_overlap(spark, sf).collect()
    assert(r.length === 1)
    val (nA, nB, nCommon, nOnlyA, nTotal) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3),
        r(0).getLong(4))
    // exact set algebra over the same shingle slices (distinct 3-gram
    // shingles at test scale sit below the query's 2^16 retained
    // entries, where a theta sketch is exact)
    val sets = graft.queries.ExtensionQueries
      .docShingles(Tables.documents(spark, sf))
      .select(col("shingle"), pmod(col("doc_id"), lit(2)).as("release"))
      .collect().map(row => (row.getString(0), row.getLong(1)))
    val a = sets.collect { case (c, 0L) => c }.toSet
    val b = sets.collect { case (c, 1L) => c }.toSet
    assert(nA === a.size.toLong)
    assert(nB === b.size.toLong)
    assert(nCommon === a.intersect(b).size.toLong)
    assert(nOnlyA === a.diff(b).size.toLong)
    assert(nTotal === a.union(b).size.toLong)
    // near-dups and shared phrasing make the overlap non-trivial
    assert(nCommon > 0, "expected shingle overlap across the release split")
  }

  test("theta sketches: slice-union == whole; SketchStore merges _theta columns") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), md5(col("text")).as("content"),
        pmod(col("doc_id"), lit(3)).as("slice"))
    def est(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("lang"), graft.functions.ThetaExpressions
        .theta_estimate(col("content_theta")).cast("long").as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = SketchStore.sketchTable(
      docs, Seq("lang"), Nil, Nil, Nil, Seq("content"))
    val sliced = SketchStore.sketchTable(
      docs, Seq("lang", "slice"), Nil, Nil, Nil, Seq("content"))
    assert(est(SketchStore.merge(Seq(sliced.drop("slice")), Seq("lang")))
      === est(whole))
  }

  test("theta SQL surface: agg + union + set estimates") {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("sk_docs")
    val row = spark.sql(
      """WITH sk AS (
        |  SELECT pmod(doc_id, 2) AS r, graft_theta_agg(md5(text), 12) AS s
        |  FROM sk_docs GROUP BY pmod(doc_id, 2)),
        |ab AS (SELECT
        |  max(CASE WHEN r = 0 THEN s END) AS sa,
        |  max(CASE WHEN r = 1 THEN s END) AS sb FROM sk)
        |SELECT CAST(round(graft_theta_intersect_estimate(sa, sb)) AS BIGINT) AS common,
        |       CAST(round(graft_theta_union_estimate(sa, sb)) AS BIGINT) AS total,
        |       CAST(round(graft_theta_estimate(sa)) AS BIGINT) AS n_a FROM ab
        |""".stripMargin).head()
    // under capacity the sketch is exact — compare to plain distincts
    val docs = Tables.documents(spark, sf)
      .select(md5(col("text")).as("h"), pmod(col("doc_id"), lit(2)).as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = docs.collect { case (h, 0L) => h }.toSet
    val b = docs.collect { case (h, 1L) => h }.toSet
    assert(row.getLong(0) === a.intersect(b).size.toLong)
    assert(row.getLong(1) === a.union(b).size.toLong)
    assert(row.getLong(2) === a.size.toLong)
  }

  test("KLL SQL surface: agg, merge, quantile; empty sketch is NULL") {
    graft.functions.GraftFunctions.register(spark)
    Tables.orders(spark, sf).createOrReplaceTempView("sk_orders")
    val q = spark.sql(
      """WITH sk AS (
        |  SELECT o_orderpriority,
        |         graft_kll_agg(CAST(o_totalprice AS DOUBLE), 200) AS s
        |  FROM sk_orders GROUP BY o_orderpriority)
        |SELECT graft_kll_quantile(graft_kll_merge(s), 0.5d) AS p50 FROM sk
        |""".stripMargin).head().getDouble(0)
    // merged-sketch median must land inside the global value range
    val mm = Tables.orders(spark, sf)
      .agg(min("o_totalprice"), max("o_totalprice")).head()
    assert(q >= mm.getDouble(0) && q <= mm.getDouble(1))

    // an empty sketch (empty corpus slice) has no quantiles -> NULL
    import spark.implicits._
    val empty = KllDoublesSketch.newHeapInstance(200).toByteArray
    val row = Seq(Tuple1(empty)).toDF("s")
      .select(graft.functions.KllExpressions.kll_quantile(col("s"), 0.5))
      .head()
    assert(row.isNullAt(0))
  }

  test("KLL merge target preserves the inputs' k (no silent accuracy downgrade)") {
    // DataSketches merge adopts the SMALLEST k involved, including
    // the target's — a default-k merge buffer would degrade k=800
    // slices to k=200's rank error. The merge must be built at the
    // slices' k (review finding; KllMergeAgg.k / SketchStore kllK).
    import spark.implicits._
    val slices = (0 until 4).map { i =>
      val sk = KllDoublesSketch.newHeapInstance(800)
      (i * 1000 until (i + 1) * 1000).foreach(v => sk.update(v.toDouble))
      Tuple1(sk.toByteArray)
    }
    val merged = slices.toDF("s")
      .select(graft.functions.KllExpressions.kll_merge_agg(col("s"), 800).as("m"))
      .head().getAs[Array[Byte]](0)
    val back = KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(merged))
    assert(back.getK === 800, s"merge degraded k to ${back.getK}")
    assert(back.getN === 4000L)
    // the default-k path still exists and is what it says: k=200
    val defaultMerged = slices.toDF("s")
      .select(graft.functions.KllExpressions.kll_merge_agg(col("s")).as("m"))
      .head().getAs[Array[Byte]](0)
    assert(KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(defaultMerged)).getK === 200)
  }

  test("wrong-typed sketch SQL fails analysis, not mid-task on an executor") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a", 1.0)).toDF("s", "d").createOrReplaceTempView("sk_badtype")
    for (q <- Seq(
      "SELECT graft_theta_estimate(s) FROM sk_badtype",
      "SELECT graft_kll_quantile(s, 0.5d) FROM sk_badtype",
      "SELECT graft_freq_top_k(s, 3) FROM sk_badtype",
      "SELECT graft_kll_merge(d) FROM sk_badtype",
      // build sides: KLL wants numerics (a string would die in
      // toDouble mid-task), theta/freq want string/binary items
      // (numeric coercion would make long 5 and double 5.0 distinct
      // items and zero the overlap of equal-valued columns)
      "SELECT graft_kll_agg(s, 200) FROM sk_badtype",
      "SELECT graft_theta_agg(d, 12) FROM sk_badtype",
      "SELECT graft_freq_agg(d, 8) FROM sk_badtype")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(q).collect())
      assert(e.getMessage.contains("graft_"),
        s"analysis error should name the function: ${e.getMessage}")
    }
  }

  test("SQL graft_kll_merge takes the target k like the Column API") {
    // without the optional k argument, SQL users merging k=800 slices
    // silently degraded to k=200 rank error — the Column API and the
    // theta/freq SQL merges already threaded the size through
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val slices = (0 until 4).map { i =>
      val sk = KllDoublesSketch.newHeapInstance(800)
      (i * 1000 until (i + 1) * 1000).foreach(v => sk.update(v.toDouble))
      Tuple1(sk.toByteArray)
    }
    slices.toDF("s").createOrReplaceTempView("sk_mergek")
    val merged = spark.sql("SELECT graft_kll_merge(s, 800) AS m FROM sk_mergek")
      .head().getAs[Array[Byte]](0)
    assert(KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(merged)).getK === 800)
    // arity guard still fires
    val e = intercept[Exception](
      spark.sql("SELECT graft_kll_merge(s, 800, 1) FROM sk_mergek").collect())
    assert(e.getMessage.contains("graft_kll_merge"))
  }
}
