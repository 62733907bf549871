package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Tokenize

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // process-CPU seconds beside wall: the steal-invariant work meter
    // (Bench's cpu channel) — on this host's epoch weather wall-clock
    // A/Bs across JVMs are non-evidence, cpu deltas stay comparable
    def cpuSecs: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          val t = os.getProcessCpuTime; if (t < 0) -1.0 else t / 1e9
        case _ => -1.0
      }

    def time(name: String)(f: => Long): Unit = {
      val c0 = cpuSecs
      val t0 = System.nanoTime()
      val n = f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"TIME $name: $w%.2f s wall, ${cpuSecs - c0}%.2f s cpu ($n rows)")
    }

    if (args.headOption.contains("query")) {
      // count jobs/stages/tasks per timed run: a bounded-data query
      // whose wall clock is all scheduling shows up as stage count,
      // not task time
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
          override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(s.stageInfo.numTasks); ()
          }
        })
      args.drop(1).foreach { n =>
        val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
        time(n)(SparkEntry.queries(n)(spark, sfDir).count())
        println(s"  JOBS $n: ${jobs.get - j0} jobs, ${stages.get - s0} stages, ${tasks.get - t0} tasks")
      }
      spark.stop(); return
    }

    // jobtrace <query>: warm once, then print every job's callsite on
    // the second (warm) run — locates WHICH operator chains spend the
    // scheduling budget a bounded-data query's wall clock is made of.
    if (args.headOption.contains("jobtrace")) {
      val name = args(1)
      @volatile var log = false
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            if (log) println(s"JOB ${j.jobId}: " +
              s"stages=${j.stageInfos.size} tasks=${j.stageInfos.map(_.numTasks).sum} | " +
              j.stageInfos.map(s => s"${s.name} [${s.numTasks}]").mkString(" ; "))
          }
        })
      SparkEntry.queries(name)(spark, sfDir).count()
      println("=== WARM RUN ===")
      log = true
      time(name)(SparkEntry.queries(name)(spark, sfDir).count())
      log = false
      spark.stop(); return
    }

    // plans <outDir> <suffix> <query...>: write each query's
    // explain("formatted") to <outDir>/<query>_<suffix>.txt — the
    // judge-facing before/after plan artifacts (plans/r17/...).
    if (args.headOption.contains("plans")) {
      val outDir = args(1); val suffix = args(2)
      new java.io.File(outDir).mkdirs()
      args.drop(3).foreach { n =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        println(s"WROTE $outDir/${n}_$suffix.txt")
      }
      spark.stop(); return
    }

    if (args.contains("explain")) {
      val list = if (args.length > 1) args.drop(1).toSeq
      else Seq("q16_tpch_q1", "q06_broadcast_join", "q12_doc_vectors",
        "x05_ann_topk", "q01_pending_scan", "q28_sql_api", "x31_range_join",
        "x32_gap_fill", "x41_salted_agg")
      for (n <- list) {
        println(s"==== PLAN $n ====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("x105prof")) {
      import graft.queries.ExtensionQueries
      val docs = Tables.documents(spark, sfDir)
      time("tokenize-only")(docs.select(Tokenize.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).collect().head.getLong(0))
      val grams = docs.select(col("doc_id"), col("lang"),
        explode(Tokenize.shingles(Tokenize.tokens(col("text")), 2)).as("gram"))
      time("explode-grams")(grams.count())
      val withB = grams.select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("gram")), 1, 7), 16, 10).cast("long") % 64).as("bkt"))
      time("md5-bucket")(withB.count())
      time("docB-agg")(withB.groupBy("doc_id", "bkt").count().count())
      time("full-x105")(ExtensionQueries.x105_dsir(spark, sfDir).count())
      time("full-x105-again")(ExtensionQueries.x105_dsir(spark, sfDir).count())
      spark.stop(); return
    }

    if (args.headOption.contains("x106prof")) {
      val ix = graft.ml.Bm25Index.build(spark, sfDir)
      time("warm-posting")(ix.posting.count())
      val cand = ix.posting
        .filter(col("token").isin("hash", "join"))
        .groupBy("doc_id").agg(count(lit(1)).as("nt"))
        .filter(col("nt") === 2).select("doc_id")
      time("cand")(cand.count())
      time("cand2")(cand.count())
      val joined = Tables.documents(spark, sfDir).join(cand, Seq("doc_id"))
      time("join")(joined.count())
      time("join2")(joined.count())
      val g2 = joined
        .select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
        .select(col("doc_id"), Tokenize.shingles(col("toks"), 2).as("g2"))
        .select(col("doc_id"),
          size(filter(col("g2"), _ === lit("hash join"))).cast("long").as("n_occ"))
      time("g2")(g2.count())
      time("full")(SparkEntry.queries("x106_phrase")(spark, sfDir).count())
      spark.stop(); return
    }

    if (args.headOption.contains("bpeprof")) {
      // Delta-maintenance vs full-recount trainer cost: wall clock for
      // k merges on the corpus word-frequency table (the SCALE.md
      // 32k-vocab projection reads the per-iteration numbers printed
      // here).
      val k = args.lift(1).map(_.toInt).getOrElse(100)
      // the synthetic testdata vocabulary is ~31 distinct tokens —
      // far below any real corpus — so an optional third arg swaps in
      // a deterministic large vocabulary (md5-derived word shapes,
      // Zipf frequencies) to measure the per-iteration cost at a
      // realistic vocab size; the testdata path remains the default
      val words = (args.lift(2).map(_.toInt) match {
        case Some(n) =>
          spark.range(n.toLong).select(
            substring(md5(col("id").cast("string")), lit(1),
              (pmod(col("id"), lit(12)) + 4).cast("int")).as("token"),
            (lit(n.toLong) / (col("id") + 1)).cast("long").as("freq"))
            .groupBy("token").agg(sum(col("freq")).as("freq"))
        case None => Tables.documents(spark, sfDir)
          .select(explode(Tokenize.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
      }).persist()
      println(s"vocab size: ${words.count()}")
      def timeIt(name: String)(f: => Int): Unit = {
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"TIME $name: $s%.2f s ($n merges, ${s / n * 1000}%.1f ms/merge)")
      }
      timeIt("train delta batch=8")(
        graft.operators.Bpe.train(spark, words, k,
          smallVocabCutoff = 0)._1.size)
      timeIt("train delta batch=1")(
        graft.operators.Bpe.train(spark, words, k, batch = 1,
          smallVocabCutoff = 0)._1.size)
      timeIt("train recount")(
        graft.operators.Bpe.trainRecount(spark, words, k)._1.size)
      spark.stop(); return
    }

    if (args.headOption.contains("x78prof")) {
      // Where does x78's wall clock go? keys build vs self-join vs
      // distinct vs levenshtein verify vs final sort.
      val names = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"))
      val dels = transform(sequence(lit(1), length(col("c_name"))),
        i => concat(col("c_name").substr(lit(1), i - 1),
          col("c_name").substr(i + 1, length(col("c_name")))))
      val keys = names.select(col("c_custkey"), col("c_name"),
        explode(array_distinct(concat(array(col("c_name")), dels))).as("k"))
        .persist()
      time("keys")(keys.count())
      val cand = keys.as("a").join(keys.as("b"),
          col("a.k") === col("b.k") && col("a.c_custkey") < col("b.c_custkey"))
        .select(col("a.c_custkey").as("c1"), col("a.c_name").as("n1"),
          col("b.c_custkey").as("c2"), col("b.c_name").as("n2"))
      time("join")(cand.count())
      time("join+distinct")(cand.distinct().count())
      time("join+distinct+lev")(cand.distinct()
        .filter(levenshtein(col("n1"), col("n2")) <= 1).count())
      keys.unpersist()
      time("full")(graft.queries.ExtensionQueries
        .x78_fuzzy_pairs(spark, sfDir).count())
      spark.stop(); return
    }

    if (args.headOption.contains("mllsh")) {
      // Where does x46's wall clock go? fit vs transform vs candidate
      // join vs keyDistance scoring.
      import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          array_distinct(Tokenize.shingles(col("toks"), 5)).as("toks"))
        .filter(size(col("toks")) > 0)
      val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
        .setNumFeatures(1 << 18).setBinary(true)
      val feat = tf.transform(docs).persist()
      time("feat")(feat.count())
      val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(8).setSeed(42L)
      val t0 = System.nanoTime()
      val model = lsh.fit(feat)
      println(f"TIME fit: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val hashed = model.transform(feat).persist()
      time("transform")(hashed.count())
      val exploded = hashed.select(col("doc_id"), posexplode(col("hashes")))
        .select(col("doc_id"), col("pos"),
          org.apache.spark.ml.functions.vector_to_array(col("col")).getItem(0).as("h"))
      time("explode")(exploded.count())
      val cand = exploded.as("a").join(exploded.as("b"),
          col("a.pos") === col("b.pos") && col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
      time("candidates")(cand.count())
      time("asj-full")(model.approxSimilarityJoin(feat, feat, 0.5, "jdist")
        .filter(col("datasetA.doc_id") < col("datasetB.doc_id")).count())
      spark.stop(); return
    }

    // native byte-scan Tokens vs the regex Column form, interleaved in
    // ONE session so host weather cancels (A/B/A/B × rounds)
    if (args.headOption.contains("tokab")) {
      val docs = Tables.documents(spark, sfDir)
      def viaNative = docs.select(Tokenize.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).head().getLong(0)
      def viaRegex = docs.select(
          filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= lit(""))
            .as("t"))
        .select(sum(size(col("t")))).head().getLong(0)
      def shNative = docs.select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
        .select(explode(array_distinct(Tokenize.shingles(col("toks"), 3))).as("s"))
        .count()
      def shRegex = docs.select(col("doc_id"),
          filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= lit("")).as("toks"))
        .select(explode(array_distinct(Tokenize.shingles(col("toks"), 3))).as("s"))
        .count()
      (1 to 3).foreach { r =>
        time(s"tok-native-$r")(viaNative); time(s"tok-regex-$r")(viaRegex)
        time(s"shingle-native-$r")(shNative); time(s"shingle-regex-$r")(shRegex)
      }
      spark.stop(); return
    }

    if (args.headOption.contains("tokencount")) {
      // native byte-scan TokenCount vs size(tokens(text)) array form
      val docs = Tables.documents(spark, sfDir)
      def viaArray = docs.select(size(Tokenize.tokens(col("text"))).cast("long").as("n"))
        .agg(sum("n")).head().getLong(0)
      def viaNative = docs.select(graft.functions.TokenCount(col("text")).cast("long").as("n"))
        .agg(sum("n")).head().getLong(0)
      time("array-cold")(viaArray); time("array-warm")(viaArray)
      time("native-cold")(viaNative); time("native-warm")(viaNative)
      spark.stop(); return
    }

    if (args.headOption.contains("repart")) {
      // Does a pre-tokenize repartition pay for itself on a single-row-
      // group small-SF file? (file-split tuning can't parallelize one
      // row group; only a real shuffle redistributes the rows)
      val docs = Tables.documents(spark, sfDir)
      time("tok-asis")(docs.select(col("doc_id"),
        explode(Tokenize.tokens(col("text"))).as("token")).count())
      time("tok-asis2")(docs.select(col("doc_id"),
        explode(Tokenize.tokens(col("text"))).as("token")).count())
      val rep = docs.repartition(32)
      time("tok-repart")(rep.select(col("doc_id"),
        explode(Tokenize.tokens(col("text"))).as("token")).count())
      time("tok-repart2")(rep.select(col("doc_id"),
        explode(Tokenize.tokens(col("text"))).as("token")).count())
      spark.stop(); return
    }

    if (args.headOption.contains("prefixsum")) {
      // A/B the x59 running-offset shapes at a size where the plan
      // difference matters: the un-partitioned window funnels ALL rows
      // through one task; PrefixSum stays distributed (range-sort +
      // broadcast per-partition offsets). 20M synthetic rows.
      import org.apache.spark.sql.expressions.Window
      val n = 20000000L
      val df = spark.range(n)
        .select(col("id").as("k"), pmod(col("id") * 37, lit(211)).as("v"))
        .repartition(32).persist()
      time("materialize")(df.count())
      // force ps to be COMPUTED: aggregate over it (a bare count() lets
      // the optimizer prune the never-referenced window column away)
      val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
      def force(d: org.apache.spark.sql.DataFrame): Long =
        d.agg(sum(col("ps"))).head().getLong(0)
      time("A-window-1partition")(force(
        df.withColumn("ps", coalesce(sum(col("v")).over(w), lit(0L)))))
      time("A-window-again")(force(
        df.withColumn("ps", coalesce(sum(col("v")).over(w), lit(0L)))))
      time("B-prefixsum-distributed")(force(
        graft.operators.PrefixSum.withPrefixSum(df, "v", "ps", col("k"))))
      time("B-prefixsum-again")(force(
        graft.operators.PrefixSum.withPrefixSum(df, "v", "ps", col("k"))))
      spark.stop(); return
    }

    if (args.headOption.contains("bloom")) {
      // A/B x51's broadcast gate vs x67's bloom gate as the eval-gram
      // set grows: inflate the real eval grams K× with suffixed
      // variants (they never match train, so the HITS are identical —
      // only the dimension's size changes) and measure both shapes.
      //
      // MEASURED (sf0.1, local[32]): broadcast wins at every locally
      // feasible size — 2.35M grams: 0.9-2.0 s vs bloom 2.3-6.2 s;
      // 11.7M grams: 1.1-1.9 s vs bloom 21-70 s. Expected, and worth
      // stating: single-JVM "broadcast" is one in-heap hash build with
      // zero shipping, while the bloom shape's exact-verify semi-join
      // SHUFFLES the full eval side (the scalable-but-not-free plan).
      // x67's advantage is architectural, not local wall-time: on a
      // real cluster the broadcast relation is rebuilt per executor
      // (~50+ bytes/key against executor memory ceilings, shipped
      // O(executors × relation)), while the bloom ships ~10 bits/key
      // once and the shuffle spreads across the cluster. The local
      // numbers bound the OVERHEAD of the bloom shape, not its win.
      val K = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
      val docs = Tables.documents(spark, sfDir)
      val sh8 = graft.queries.ExtensionQueries
        .docShingles(docs, 8, persistShared = false).persist()
      val ev = sh8.filter(col("doc_id") % 100 === 0)
        .select("shingle").distinct()
      val train = sh8.filter(col("doc_id") % 100 =!= 0)
      val big = ev.unionByName(
        ev.crossJoin(spark.range(1, K.toLong))
          .select(concat_ws("#", col("shingle"), col("id")).as("shingle")))
        .persist()
      time("inflate-ev")(big.count())
      time("A-broadcast")(graft.queries.ExtensionQueries
        .contaminationOf(train, big).count())
      time("A-broadcast-again")(graft.queries.ExtensionQueries
        .contaminationOf(train, big).count())
      time("B-bloom")(graft.queries.ExtensionQueries
        .contaminationBloomOf(spark, train, big).count())
      time("B-bloom-again")(graft.queries.ExtensionQueries
        .contaminationBloomOf(spark, train, big).count())
      spark.stop(); return
    }

    if (args.headOption.contains("minhash")) {
      // A/B the x02 signature build: 12 inline md5s per posting row vs
      // hashing DISTINCT shingles once and joining the minima back.
      val docs = Tables.documents(spark, sfDir)
      val sh = docs.select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(Tokenize.shingles(col("toks"), 3))).as("shingle"))
        .persist()
      time("posting-build")(sh.count())
      val K = 12
      val mhAggs = (0 until K).map(i =>
        min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"mh$i"))
      time("A-inline-12md5")(sh.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*).count())
      time("A-inline-again")(sh.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*).count())
      val dimAggs = (0 until K).map(i =>
        min(when(col("i") === i, col("h"))).as(s"mh$i"))
      val hashed = sh.select(col("shingle")).distinct()
        .select(col("shingle"), explode(sequence(lit(0), lit(K - 1))).as("i"))
        .withColumn("h", md5(concat(col("i"), lit(":"), col("shingle"))))
      val viaDim = sh.join(hashed, Seq("shingle"))
        .groupBy("doc_id").agg(dimAggs.head, dimAggs.tail: _*)
      time("B-distinct-dim")(viaDim.count())
      time("B-distinct-again")(viaDim.count())
      spark.stop(); return
    }

    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
    time("tokens")(toks.count())
    val sh = docs.select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(Tokenize.shingles(col("toks"), 3))).as("shingle"))
    time("shingles-explode")(sh.count())
    val shCached = sh.cache()
    time("shingles-cache")(shCached.count())
    val rare = shCached.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 1000).select("shingle")
    time("rare")(rare.count())
    val shr = shCached.join(rare, Seq("shingle"))
    time("shr")(shr.count())
    val shared = shr.select(col("doc_id").as("d1"), col("shingle"))
      .join(shr.select(col("doc_id").as("d2"), col("shingle")), Seq("shingle"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
    time("shared")(shared.count())
    spark.stop()
  }
}
