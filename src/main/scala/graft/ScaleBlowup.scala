package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-posture certification harness (round-12 verdict ask #7).
  *
  * BASELINE.md's superlinearity argument used to rest on the 100×
  * sf0.001→sf0.1 span of tiny driver-shipped data; this main MEASURES
  * the scaling instead: it generates a deterministic N× blowup of the
  * documents + embeddings tables (seeded by construction — no RNG, no
  * clock), runs the artifact-served families (x96/x97/x124/x129/x140)
  * and the dedup banding family (x04/x02/x136) once COLD (artifact
  * roots deleted first, the Bench cold-probe convention) and once
  * WARM, at 1× and N×, and prints one JSON line per scale. The
  * measured exponents land in SCALE.md §"measured blowup".
  *
  * Blowup semantics — "N× more data of the same shape", not "N exact
  * copies":
  *   - documents: replica k > 0 suffixes every alnum token with `xk`,
  *     so each replica's vocabulary and shingle space are DISJOINT
  *     from every other replica's — the corpus's internal dup/overlap
  *     structure repeats at N× size instead of collapsing into
  *     N-way exact-dup groups that would quadratically inflate the
  *     verified-pair count and measure dup-rate, not scale.
  *   - embeddings: replica k circular-shifts each vector by k mod dim
  *     coordinates (negated once the shift wraps), preserving norms
  *     and the pairwise-angle DISTRIBUTION while keeping replicas
  *     directionally distinct.
  *   - every other table is copied verbatim (these families never
  *     read them, but Tables.load must find them).
  *
  * Usage: `runMain graft.ScaleBlowup <srcSfDir> <workDir> <factor>`
  * (defaults: /root/testdata/sf0.1 /tmp/graft_blowup 10). Modes:
  * no flag = the measured-families cold/warm table at 1× and N×;
  * `--pipeline` = the funnel legs (bitext release legs at 1× and N×,
  * base WITH bitext release on the blown corpus, rule batteries on
  * its planted-compliant variant, published > 0 and pairs > 0
  * required); `--sweep` = the full bitext mining sweep reconciliation
  * (with `--paired` on the synthetic-twin variant; factor > 1 twins
  * the blown corpus — see sweepLeg / pairedVariant).
  */
object ScaleBlowup {

  /** The measured families, in cold-dependency order (x04 builds the
    * shared shingle posting x02 reuses; x96's lexical artifact feeds
    * x97's hybrid; x129's (μ,W) feeds x140 — same order Bench probes).
    */
  private[graft] val families: Seq[String] = Seq(
    "x04_ngram_jaccard", "x02_dedup_minhash", "x136_winnow_pairs",
    // the cross-measure closure (hybrid min-label + star fallback,
    // round 13) measured over the posting x04 already warmed
    "x72_dup_clusters_all",
    // the BM25 scan/artifact retrieval family (round-13 ask #5: the
    // family the host epoch keeps hitting had no measured exponent,
    // so the bracket sentinels were hand-picked): x91 = session-built
    // scan shape, x96 = publish+load, x102 = PRF over the published
    // forward projection
    "x91_bm25",
    "x96_bm25_indexed", "x102_prf_expansion",
    "x97_hybrid_indexed", "x124_passage_indexed",
    "x129_whiten", "x140_whiten_ivf",
    // bitext mining, both legs: x144's exact shard-pair product grows
    // ~quadratically in SHARD size by design (the cost ceiling a
    // shard-size knob would cap); x145 is the ANN-served fix — a
    // fixed query batch against the published two-sided index, which
    // must land in the artifact-served band (round-13 ask #1).
    // x146 is the exact extraction truth leg (x144's pair-frame shape
    // — its exponent documents the cost ceiling, round-14 ask #2);
    // x147 is its ANN-served fix riding the artifact x145 warms
    "x144_bitext_mining", "x145_bitext_mining_ann",
    "x146_bitext_extract", "x147_bitext_extract_ann")

  /** Bumped whenever the replica scheme changes semantics — a reused
    * directory generated under a DIFFERENT scheme must regenerate, not
    * silently serve (round-14 review: the bare existence check would
    * have kept a pre-offset-fix directory with colliding replica ids).
    * v3: the marker pins the SOURCE fingerprints instead of the derived
    * id offset (round-14 advice: a regenerated source whose max id
    * happened to be unchanged would silently serve the stale blowup;
    * the fingerprint is the repo's artifact-freshness convention and —
    * being metadata-only — lets the fresh fast path skip every scan).
    */
  private val SchemeVersion = 3

  private[graft] def blowup(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // reuse ONLY a directory whose marker proves the same scheme,
    // factor, and SOURCE CONTENT (Tables.fileFingerprint — metadata
    // only, so the fast path touches no table data) produced it;
    // anything else (including a pre-marker directory) regenerates.
    // The fingerprint covers EVERY source table, not just the two the
    // replica scheme transforms — the rest are copied verbatim into
    // the blown directory, so a regenerated events/lineitem/... would
    // otherwise serve stale through a matching marker (round-15
    // review).
    val marker = new org.apache.hadoop.fs.Path(s"$out/_BLOWUP_SCHEME")
    // source-side metadata goes through the SOURCE path's FileSystem
    // (round-15 ADVICE: listing src through the output's fs would fail
    // or misresolve when the two live on different schemes)
    val srcPath0 = new org.apache.hadoop.fs.Path(src)
    val srcFs = srcPath0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcFp = srcFs.listStatus(srcPath0)
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).sorted
      .map(n => graft.Tables.fileFingerprint(spark, src,
        n.stripSuffix(".parquet")))
      .mkString(":")
    val want = s"v$SchemeVersion factor=$factor src=$srcFp"
    val fresh =
      try {
        val in = fs.open(marker)
        val got = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        got == want &&
          fs.exists(new org.apache.hadoop.fs.Path(s"$out/documents.parquet"))
      } catch { case _: Exception => false }
    if (fresh) return // deterministic: same inputs -> same blowup
    fs.delete(outPath, true)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    // Replica-id offset derived from the OBSERVED max id, never a
    // fixed constant (round-13 advice: source ids >= 1e7 would
    // silently collide across replicas). doc_id and vec_id share ONE
    // offset because the tables join on id (x144's docs⋈embeddings);
    // per-table offsets would misalign every replica's lang metadata.
    // Not part of the marker: the fingerprint already pins the source
    // content the offset is a pure function of.
    val maxId = math.max(
      docs.agg(max(col("doc_id"))).head.getLong(0),
      embs.agg(max(col("vec_id"))).head.getLong(0))
    val off = math.max(10000000L, maxId + 1)
    // replica k circular-shifts by k mod dim with ONE negation past
    // the wrap, so k >= 2*dim would repeat replica k-2*dim exactly —
    // duplicate vectors measure dup-rate, not scale
    val dim0 = embs.select(size(col("embedding"))).head.getInt(0)
    require(factor <= 2 * dim0,
      s"blowup factor $factor exceeds the 2*dim=${2 * dim0} distinct-replica " +
        "ceiling of the circular-shift scheme")
    val docsB = (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + lit(k * off)).as("doc_id"),
        regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1x" + k).as("text"),
        col("lang"), col("source"),
        length(regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1x" + k))
          .cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
    docsB.write.mode("overwrite").parquet(s"$out/documents.parquet")
    val embsB = (0 until factor).map { k =>
      if (k == 0) embs
      else {
        val d = size(col("embedding"))
        val s = lit(k) % d
        val shifted = concat(
          slice(col("embedding"), s + 1, d - s),
          slice(col("embedding"), lit(1), s))
        val v = when(lit(k) >= d, transform(shifted, x => -x))
          .otherwise(shifted)
        embs.select((col("vec_id") + lit(k * off)).as("vec_id"),
          v.as("embedding"), col("label"))
      }
    }.reduce(_ unionByName _)
    embsB.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // verbatim copies so Tables.load finds every table
    srcFs.listStatus(srcPath0).filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
      .filterNot(n => n == "documents.parquet" || n == "embeddings.parquet")
      .foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(srcFs,
          new org.apache.hadoop.fs.Path(s"$src/$n"), fs,
          new org.apache.hadoop.fs.Path(s"$out/$n"), false, true,
          spark.sparkContext.hadoopConfiguration)
      }
    // marker LAST: a crashed generation leaves no marker and the next
    // run regenerates instead of serving a half-written directory
    val outMark = fs.create(marker, true)
    try outMark.write(want.getBytes("UTF-8")) finally outMark.close()
  }

  private def timed(spark: SparkSession, dir: String, q: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, dir).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Cold+warm pass over [[families]] at `dir`: artifact roots deleted
    * first (cold = build+publish+load; the Bench convention), then the
    * same queries again (warm = memo/artifact-served).
    */
  private[graft] def measure(spark: SparkSession,
      dir: String): (Seq[(String, Double)], Seq[(String, Double)]) = {
    graft.ml.Bm25Index.artifactKinds.foreach { kind =>
      val p = new org.apache.hadoop.fs.Path(
        graft.ml.Bm25Index.artifactRoot(kind, dir))
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    Tables.names.foreach { t =>
      try Tables.load(spark, dir, t).count() catch { case _: Throwable => () }
    }
    val cold = families.map(q => q -> timed(spark, dir, q))
    val warm = families.map(q => q -> timed(spark, dir, q))
    (cold, warm)
  }

  /** The 10× funnel certification (round-13 verdict ask #6): run the
    * FULL snapshot pipeline at the blown-up corpus — once with the
    * rule batteries off (the corpus-shaped exercise of verdict → mask
    * → closure → contamination → vectors → pack → BPE → snapshot) and
    * once with them on (the battery stages scan the full N× corpus
    * too; on THIS punctuation-free synthetic corpus their published
    * operating points then gate out most docs, which is exactly the
    * opt-in note on Pipeline.run — the counters still must reconcile).
    * Reconciliation is asserted here, not eyeballed: the published
    * documents count must equal the funnel arithmetic.
    */
  private def pipelineLeg(spark: SparkSession, dir: String,
      batteries: Boolean, requirePublished: Boolean = false,
      bitext: Boolean = false): String = {
    val store = java.nio.file.Files
      .createTempDirectory("graft_blowup_pipe").toString + "/store"
    val t0 = System.nanoTime()
    val r = Pipeline.run(spark, dir, store, ruleBatteries = batteries,
      bitextRelease = bitext)
    val secs = (System.nanoTime() - t0) / 1e9
    // the release leg must SHIP pairs at scale, not merely run (the
    // battery leg's published>0 discipline applied to the bitext
    // product; the pair count read back from the published table is
    // the reconciliation)
    require(!bitext || r.bitextPairs > 0,
      s"bitext release leg shipped zero pairs: $r")
    val published = graft.sources.VersionedStore
      .readTable(spark, store, r.version, "documents").count()
    val expected = r.kept - r.heldOutEval - r.droppedC4Pages -
      r.droppedLowQuality - r.prunedNearDup - r.emptiedBySegClean -
      r.droppedContaminated - r.prunedSemantic
    require(published == expected,
      s"funnel does not reconcile: published=$published expected=$expected $r")
    // the battery-variant leg must prove a battery-gated publish WORKS
    // at scale, not merely that the empty-edge arithmetic reconciles
    // (round-14 ask #4: the all-synthetic corpus published zero)
    require(!requirePublished || published > 0,
      s"battery leg published an empty corpus: $r")
    s"""{"pipeline":"${if (batteries) "batteries" else "base"}",""" +
      s""""dir":"$dir","secs":${math.rint(secs * 10) / 10},""" +
      s""""kept":${r.kept},"held_out":${r.heldOutEval},""" +
      s""""dropped_gopher":${r.droppedGopher},""" +
      s""""dropped_c4_pages":${r.droppedC4Pages},""" +
      s""""pruned_near_dup":${r.prunedNearDup},""" +
      s""""emptied_seg":${r.emptiedBySegClean},""" +
      s""""dropped_contaminated":${r.droppedContaminated},""" +
      s""""published":$published,"sequences":${r.sequences},""" +
      s""""packed_tokens":${r.packedTokens},""" +
      s""""bitext_pairs":${r.bitextPairs},"reconciles":true}"""
  }

  /** The bitext RELEASE leg in isolation (round-15 verdict ask #1's
    * done-criterion): time the production `bitextExtractSweep` — the
    * staged, batched ANN extraction `Pipeline.run(bitextRelease=true)`
    * now ships — at a given corpus, pairs > 0 required. Run at 1× and
    * N× the pair of timings is the release path's measured exponent
    * (the exact x146 leg's ceiling is the families table's row).
    */
  private def bitextLeg(spark: SparkSession, dir: String): String = {
    // warm the two-sided artifact + the serving JIT once, off the clock
    SparkEntry.queries("x147_bitext_extract_ann")(spark, dir).count()
    val stage = java.nio.file.Files
      .createTempDirectory("graft_blowup_bitext").toString + "/stage"
    val sides = graft.ml.BitextAnn.loadOrPublish(spark, dir)
    val nEn = sides.en.assigned.count()
    val t0 = System.nanoTime()
    val pairs = graft.queries.ExtensionQueries
      .bitextExtractSweep(spark, dir, stage).count()
    val secs = (System.nanoTime() - t0) / 1e9
    require(pairs > 0, s"bitext sweep extracted zero pairs at $dir")
    // total sweep cost is linear in POOL (every query mines once — the
    // irreducible term, embarrassingly parallel across batches); the
    // scale claim is per-batch flatness (x147's measured 0.15 exponent
    // vs corpus), so the per-batch figure prints alongside
    val bs = graft.queries.ExtensionQueries.sweepBatchSize(nEn)
    val batches = math.max(1L, (nEn + bs - 1) / bs)
    // round-16 verdict ask #2's done-criterion: with S slots of
    // concurrent batch submission, wall clock is per-batch ×
    // ceil(batches/S) — per_round is the measured cost of one such
    // wave (comparable to the r16 sequential per_batch figure);
    // per_batch stays as amortized throughput per batch
    val slots = graft.queries.ExtensionQueries.SweepSlots
    val rounds = math.max(1L, (batches + slots - 1) / slots)
    s"""{"bitext_release":"sweep","dir":"$dir","queries":$nEn,""" +
      s""""batches":$batches,"slots":$slots,"rounds":$rounds,""" +
      s""""secs":${math.rint(secs * 10) / 10},""" +
      s""""per_round":${math.rint(secs / rounds * 1000) / 1000},""" +
      s""""per_batch":${math.rint(secs / batches * 1000) / 1000},""" +
      s""""pairs":$pairs}"""
  }

  /** A blown-up corpus VARIANT whose battery funnel is non-degenerate
    * (round-14 verdict ask #4): the synthetic blowup text never clears
    * Gopher's 50-word floor, so the ruleBatteries pipeline leg used to
    * publish an EMPTY corpus at 10× — proving the scan runs and the
    * empty-edge arithmetic reconciles, not that a battery-gated
    * publish works at scale. This plants a deterministic COMPLIANT
    * stratum on top of the blown corpus: docs engineered to clear
    * every published operating point (120 words across 6
    * terminal-punctuated 20-token lines, ≥2 distinct Gopher stopwords,
    * mean word length in [3,10], every word carrying letters, no
    * braces/ellipses/bullets/lorem, x57's dup_frac = 0 via a per-doc
    * unique token in every 3-gram), which also keeps the stratum
    * distinct under near-dup banding, with
    * matching hash-seeded embeddings so the vector/pack stages see
    * them. Deterministic by construction — no RNG, no clock.
    */
  private[graft] def batteryVariant(spark: SparkSession, bigDir: String,
      out: String, nPlanted: Int = 200): Unit = {
    import spark.implicits._
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outPath, true)
    val docs = spark.read.parquet(s"$bigDir/documents.parquet")
    val embs = spark.read.parquet(s"$bigDir/embeddings.parquet")
    val base = math.max(
      docs.agg(max(col("doc_id"))).head.getLong(0),
      embs.agg(max(col("vec_id"))).head.getLong(0)) + 1
    // Every gate the stratum must clear, by construction (6 lines ×
    // 20 tokens = 120 words per doc):
    //  - x57 verdict: dup_frac ≤ 0.02 → a per-doc unique token at
    //    every other position makes EVERY 3-gram contain one, so all
    //    3-grams are distinct (dup_frac = 0) within and across docs;
    //    quality ≥ 0.6 → 120 tokens, low stop ratio, avg token ≈ 6
    //  - Gopher: 120 words ≥ 50; "the"/"and" give ≥2 required stops;
    //    every word alphanumeric WITH letters (the alpha rule needs a
    //    letter, not letters-only); mean word len ~5-7
    //  - C4: 6 lines, each ≥5 words ending in '.', no braces
    //  - near-dup banding: shingles all carry unique tokens, so the
    //    stratum never collapses into one cluster
    val bank = Seq(
      "mountain", "river", "forest", "valley", "garden", "window",
      "journey", "evening", "morning", "harvest", "lantern", "meadow",
      "quiet", "steady", "bright", "gentle", "copper", "willow")
    def plantedText(i: Int): String =
      (0 until 6).map { line =>
        val toks = (0 until 10).flatMap { j =>
          val w =
            if (j == 0) "the" else if (j == 1) "and"
            else bank((i * 5 + line * 7 + j) % bank.size)
          Seq(w, s"u${i}x${line}y$j")
        }
        toks.mkString(" ") + "."
      }.mkString("\n")
    val planted = (0 until nPlanted).map { i =>
      val t = plantedText(i)
      (base + i, t, "en", "planted", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(planted).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val dim = embs.select(size(col("embedding"))).head.getInt(0)
    // splitmix-style hash → [-1, 1] floats (the BitextSpec fixture
    // convention): deterministic, directionally distinct per doc
    def mix(seed: Long, d: Int): Float = {
      var x = seed * 1000003L + d.toLong * 7919L + 12345L
      x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
      (((x & 0xffffffL).toDouble / 0xffffffL.toDouble) * 2 - 1).toFloat
    }
    val plantedEmb = (0 until nPlanted).map { i =>
      (base + i, Array.tabulate(dim)(d => mix(base + i, d)), 0)
    }.toDF("vec_id", "embedding", "label")
    embs.unionByName(plantedEmb).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    val srcPath = new org.apache.hadoop.fs.Path(bigDir)
    val srcFs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    srcFs.listStatus(srcPath).filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
      .filterNot(n => n == "documents.parquet" || n == "embeddings.parquet")
      .foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(srcFs,
          new org.apache.hadoop.fs.Path(s"$bigDir/$n"), fs,
          new org.apache.hadoop.fs.Path(s"$out/$n"), false, true,
          spark.sparkContext.hadoopConfiguration)
      }
  }

  /** A PAIRED corpus variant for the structured-recall leg: the sweep
    * on the raw synthetic corpus honestly reads low argmax agreement
    * (isotropic embeddings → near-tie candidates), and the ≥ 0.9
    * recall gate lives on a 40-pair fixture. This bridges the two
    * scales: every en doc in the source gets ONE synthetic
    * translation twin (0.75·v + 0.25·hash-noise, normalized — the
    * BitextSpec fixture recipe at corpus size), so x144's exact
    * argmax has real structure to find and the ANN sweep's recall is
    * measurable at ~20× the fixture's pair count with genuinely
    * sparse probes (√N lists, nProbe 4). Deterministic throughout.
    */
  private[graft] def pairedVariant(spark: SparkSession, srcDir: String,
      out: String): Unit = {
    import spark.implicits._
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outPath, true)
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val en = embs.join(
        docs.filter(col("lang") === "en").select(col("doc_id").as("vec_id")),
        Seq("vec_id"))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(en.nonEmpty, "paired variant needs a non-empty en pool")
    // driver-twin budget: the twins materialize on the driver, which
    // is fine for the measurement leg's pools (sf0.1 ≈ 0.8k en
    // vectors, the 10× blowup ≈ 8k — round-15 verdict ask #3 runs the
    // paired sweep at 10×) but must refuse rather than GC-thrash on a
    // genuinely large source; past this budget the leg would need the
    // batteryVariant-style distributed construction
    require(en.length <= 100000,
      s"pairedVariant materializes twins on the driver; en pool " +
        s"${en.length} exceeds the budget")
    val off = math.max(10000000L,
      math.max(docs.agg(max(col("doc_id"))).head.getLong(0),
        embs.agg(max(col("vec_id"))).head.getLong(0)) + 1)
    def mix(seed: Long, d: Int): Float = {
      var x = seed * 1000003L + d.toLong * 7919L + 12345L
      x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
      (((x & 0xffffffL).toDouble / 0xffffffL.toDouble) * 2 - 1).toFloat
    }
    val twins = en.map { case (id, v) =>
      val dim = v.length
      val noise = Array.tabulate(dim)(d => mix(id, d))
      val nn = math.sqrt(noise.map(x => x.toDouble * x).sum).toFloat
      val mixed = v.zip(noise).map { case (a, b) => 0.75f * a + 0.25f * b / nn }
      val mn = math.sqrt(mixed.map(x => x.toDouble * x).sum).toFloat
      (off + id, mixed.map(_ / mn))
    }
    val enDocs = docs.filter(col("lang") === "en")
    enDocs.unionByName(
        twins.map { case (id, _) => (id, s"twin $id", "xx", "paired", 8L) }
          .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    embs.join(enDocs.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      .unionByName(twins.map { case (id, v) => (id, v, 0) }.toSeq
        .toDF("vec_id", "embedding", "label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val srcPath = new org.apache.hadoop.fs.Path(srcDir)
    val srcFs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    srcFs.listStatus(srcPath).filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
      .filterNot(n => n == "documents.parquet" || n == "embeddings.parquet")
      .foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(srcFs,
          new org.apache.hadoop.fs.Path(s"$srcDir/$n"), fs,
          new org.apache.hadoop.fs.Path(s"$out/$n"), false, true,
          spark.sparkContext.hadoopConfiguration)
      }
  }

  /** Full-sweep mining reconciliation at 1× (round-14 verdict ask #3):
    * the x145 comment claims full-corpus mining is "this query over
    * successive batches, embarrassingly parallel" — this leg MEASURES
    * it. Every en doc is swept through the ANN serving path in
    * x145-sized batches against the published two-sided artifact, the
    * union of per-batch argmaxes is compared against x144's full
    * exact answer (match recall), and the sweep's wall clock is
    * compared against batches × a single batch's warm cost (the
    * embarrassingly-parallel claim: no super-batch term). One JSON
    * line; the numbers land in SCALE.md.
    */
  private def sweepLeg(spark: SparkSession, dir: String,
      batchSize: Int = 32): String = {
    import spark.implicits._
    val sides = graft.ml.BitextAnn.loadOrPublish(spark, dir)
    // warm the serving path once (JIT + artifact load), then take the
    // min of 3 single-batch timings (the Bench min-of-N convention —
    // an inflated denominator would flatter cost_vs_linear)
    SparkEntry.queries("x145_bitext_mining_ann")(spark, dir).count()
    val perBatch = (1 to 3)
      .map(_ => timed(spark, dir, "x145_bitext_mining_ann")).min
    val enIds = sides.en.assigned.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    val t0 = System.nanoTime()
    val mined = enIds.grouped(batchSize).flatMap { batch =>
      val q = sides.en.assigned.filter(col("vec_id").isin(batch: _*))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      graft.queries.ExtensionQueries.bitextMineAnn(sides, q)
        .select("query_id", "match_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
    }.toMap
    val sweepSecs = (System.nanoTime() - t0) / 1e9
    val exact = SparkEntry.queries("x144_bitext_mining")(spark, dir)
      .select("query_id", "match_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a query whose every probed list came back empty (possible on a
    // skewed corpus) is a recall MISS, not a tool abort (round-15
    // ADVICE: the old require killed the whole sweep on one such
    // query); mined.get(q) = None already counts it as a miss below
    val lost = exact.keySet -- mined.keySet
    if (lost.nonEmpty)
      System.err.println(s"[sweep] ${lost.size} queries yielded no ANN " +
        "candidates - counted as recall misses")
    val agree = exact.count { case (q, m) => mined.get(q).contains(m) }
    val recall = agree.toDouble / exact.size
    // argmax agreement alone under-reads an UNSTRUCTURED corpus (the
    // synthetic embeddings are isotropic, so every query's candidates
    // are near-ties and the argmax is probe-sensitive); the quality
    // certificate is margin REGRET: price each ANN pick on the exact
    // pair frame and compare with the exact argmax's margin — a ratio
    // ≈ 1 means a disagreeing pick is a near-tie equivalent, not a
    // miss (the fixture with real planted structure is where the
    // ≥ 0.9 id-recall gate lives, BitextSpec).
    // the O(|en|·|x|) exact pair frame prices BOTH regret legs and the
    // bestM dimension — persist it once for the leg's lifetime
    // (round-15 review: unpersisted, the quadratic frame re-evaluated
    // per derived job and dominated the tool's wall clock at N×)
    val picks = mined.toSeq.toDF("qid", "cid")
    val frame = graft.queries.ExtensionQueries.bitextMarginFrame(spark, dir)
      .select("qid", "cid", "margin").persist()
    val bestM = frame.groupBy("qid").agg(max(col("margin")).as("best_margin"))
      .persist()
    // unpersist in finally (the WhitenedIvf lost-race rule): a throw
    // anywhere in the legs below must not leak the cached quadratic
    // frame for the session lifetime (round-15 review)
    try {
    val annM = frame.join(broadcast(picks), Seq("qid", "cid"))
      .select(col("qid"), col("margin").as("ann_margin"))
    val regret = annM.join(bestM, Seq("qid"))
      .agg(avg(col("ann_margin") / col("best_margin"))).head.getDouble(0)
    // the EXTRACTION policy swept the same way (x147 vs the exact
    // x146): extracted-pair id-recall plus the same margin-regret
    // pricing on the ANN-extracted pairs — the serving story for the
    // output a parallel-corpus builder actually ships
    val tx0 = System.nanoTime()
    val extracted = enIds.grouped(batchSize).flatMap { batch =>
      val q = sides.en.assigned.filter(col("vec_id").isin(batch: _*))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      graft.queries.ExtensionQueries.bitextExtractAnn(sides, q)
        .select("query_id", "match_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
    }.toMap
    val extractSecs = (System.nanoTime() - tx0) / 1e9
    val exactPairs = SparkEntry.queries("x146_bitext_extract")(spark, dir)
      .select("query_id", "match_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairAgree = exactPairs.count { case (q, m) =>
      extracted.get(q).contains(m) }
    val pairRecall =
      if (exactPairs.isEmpty) -1.0 else pairAgree.toDouble / exactPairs.size
    val exRegret =
      if (extracted.isEmpty) -1.0
      else frame.join(broadcast(extracted.toSeq.toDF("qid", "cid")),
          Seq("qid", "cid"))
        .select(col("qid"), col("margin").as("ann_margin"))
        .join(bestM, Seq("qid"))
        .agg(avg(col("ann_margin") / col("best_margin"))).head.getDouble(0)
    val batches = (enIds.length + batchSize - 1) / batchSize
    s"""{"sweep":"bitext","dir":"$dir","queries":${enIds.length},""" +
      s""""batches":$batches,"batch_size":$batchSize,""" +
      s""""per_batch_warm":${math.rint(perBatch * 1000) / 1000},""" +
      s""""sweep_secs":${math.rint(sweepSecs * 10) / 10},""" +
      s""""cost_vs_linear":${
        math.rint(sweepSecs / (batches * perBatch) * 100) / 100},""" +
      s""""recall_vs_exact":${math.rint(recall * 1000) / 1000},""" +
      s""""margin_ratio_vs_exact":${math.rint(regret * 1000) / 1000},""" +
      s""""extract_sweep_secs":${math.rint(extractSecs * 10) / 10},""" +
      s""""extract_pairs":${extracted.size},""" +
      s""""exact_pairs":${exactPairs.size},""" +
      s""""extract_pair_recall":${math.rint(pairRecall * 1000) / 1000},""" +
      s""""extract_margin_ratio":${math.rint(exRegret * 1000) / 1000}}"""
    } finally {
      frame.unpersist(false)
      bestM.unpersist(false)
    }
  }

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val src = pos.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = pos.lift(1).getOrElse("/tmp/graft_blowup")
    val factor = pos.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val big = s"$work/x$factor"
    // --sweep never reads the blown directory — generating it there
    // would cost minutes of wall clock and N× disk for nothing
    // (round-15 review), so the generation sits inside the two modes
    // that measure it
    if (flags("--sweep")) {
      // full-sweep mining reconciliation (see sweepLeg); with --paired
      // the sweep runs on the synthetic-twin variant instead, measuring
      // recall where the corpus HAS translation structure. --paired
      // honors the blowup factor (round-15 verdict ask #3: the
      // structured-recall claim must be measured where √N list growth
      // thins probe coverage, not only at 1×): factor > 1 twins the
      // BLOWN corpus — twins stay driver-bounded there (10× sf0.1 ≈ 8k
      // en vectors, inside pairedVariant's budget).
      val dir =
        if (flags("--paired")) {
          val base = if (factor > 1) { blowup(spark, src, big, factor); big }
                     else src
          val p = s"$work/paired${if (factor > 1) s"_x$factor" else ""}"
          pairedVariant(spark, base, p)
          p
        } else src
      println(sweepLeg(spark, dir))
      spark.stop()
      return
    }
    blowup(spark, src, big, factor)
    if (flags("--bitext")) {
      // release-leg-only mode: the two bitextLeg timings without the
      // full funnel (re-measuring after a sweep-shape change costs
      // minutes, not the --pipeline hour)
      println(bitextLeg(spark, src))
      println(bitextLeg(spark, big))
      spark.stop()
      return
    }
    if (flags("--pipeline")) {
      // funnel-at-scale mode: the base leg on the blown corpus, the
      // battery leg on its planted-compliant variant (round-14 ask #4:
      // on the all-synthetic corpus the battery leg published zero —
      // a degenerate proof; the variant's stratum must survive the
      // batteries, so published > 0 is REQUIRED there)
      // the base leg ships the bitext release product too (round-15
      // verdict ask #1: the production snapshot path must ride the
      // measured-sublinear sweep WITH pairs > 0 reconciled at 10×);
      // the isolated release-leg timings at 1× and N× measure the
      // sweep's own exponent beside the funnel total
      println(bitextLeg(spark, src))
      println(bitextLeg(spark, big))
      println(pipelineLeg(spark, big, batteries = false, bitext = true))
      val variant = s"$work/x${factor}_battery"
      batteryVariant(spark, big, variant)
      println(pipelineLeg(spark, variant, batteries = true,
        requirePublished = true))
      spark.stop()
      return
    }
    // JIT warmup at the smallest SF so the 1× pass doesn't pay
    // first-compilation costs the N× pass then skips
    try measure(spark, src.replace("sf0.1", "sf0.001"))
    catch { case _: Throwable => () }
    def json(pairs: Seq[(String, Double)]): String = pairs
      .map { case (k, v) => "\"" + k + "\":" + math.rint(v * 1000) / 1000 }
      .mkString("{", ",", "}")
    Seq(("1x", src, 1), (s"${factor}x", big, factor)).foreach {
      case (tag, dir, f) =>
        val (cold, warm) = measure(spark, dir)
        println(s"""{"scale":"$tag","factor":$f,"dir":"$dir","cold":${json(cold)},"warm":${json(warm)}}""")
    }
    spark.stop()
  }
}
