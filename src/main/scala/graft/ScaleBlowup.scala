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
  * (defaults: /root/testdata/sf0.1 /tmp/graft_blowup 10).
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
    // must land in the artifact-served band (round-13 ask #1)
    "x144_bitext_mining", "x145_bitext_mining_ann")

  /** Bumped whenever the replica scheme changes semantics — a reused
    * directory generated under a DIFFERENT scheme must regenerate, not
    * silently serve (round-14 review: the bare existence check would
    * have kept a pre-offset-fix directory with colliding replica ids).
    */
  private val SchemeVersion = 2

  private[graft] def blowup(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    // Replica-id offset derived from the OBSERVED max id, never a
    // fixed constant (round-13 advice: source ids >= 1e7 would
    // silently collide across replicas). doc_id and vec_id share ONE
    // offset because the tables join on id (x144's docs⋈embeddings);
    // per-table offsets would misalign every replica's lang metadata.
    val maxId = math.max(
      docs.agg(max(col("doc_id"))).head.getLong(0),
      embs.agg(max(col("vec_id"))).head.getLong(0))
    val off = math.max(10000000L, maxId + 1)
    // reuse ONLY a directory whose marker proves the same scheme,
    // factor, and derived offset produced it; anything else (including
    // a pre-marker directory) regenerates from scratch
    val marker = new org.apache.hadoop.fs.Path(s"$out/_BLOWUP_SCHEME")
    val want = s"v$SchemeVersion factor=$factor off=$off"
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
    val srcPath = new org.apache.hadoop.fs.Path(src)
    fs.listStatus(srcPath).filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
      .filterNot(n => n == "documents.parquet" || n == "embeddings.parquet")
      .foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(fs,
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
      batteries: Boolean): String = {
    val store = java.nio.file.Files
      .createTempDirectory("graft_blowup_pipe").toString + "/store"
    val t0 = System.nanoTime()
    val r = Pipeline.run(spark, dir, store, ruleBatteries = batteries)
    val secs = (System.nanoTime() - t0) / 1e9
    val published = graft.sources.VersionedStore
      .readTable(spark, store, r.version, "documents").count()
    val expected = r.kept - r.heldOutEval - r.droppedC4Pages -
      r.droppedLowQuality - r.prunedNearDup - r.emptiedBySegClean -
      r.droppedContaminated - r.prunedSemantic
    require(published == expected,
      s"funnel does not reconcile: published=$published expected=$expected $r")
    s"""{"pipeline":"${if (batteries) "batteries" else "base"}",""" +
      s""""dir":"$dir","secs":${math.rint(secs * 10) / 10},""" +
      s""""kept":${r.kept},"held_out":${r.heldOutEval},""" +
      s""""dropped_gopher":${r.droppedGopher},""" +
      s""""dropped_c4_pages":${r.droppedC4Pages},""" +
      s""""pruned_near_dup":${r.prunedNearDup},""" +
      s""""emptied_seg":${r.emptiedBySegClean},""" +
      s""""dropped_contaminated":${r.droppedContaminated},""" +
      s""""published":$published,"sequences":${r.sequences},""" +
      s""""packed_tokens":${r.packedTokens},"reconciles":true}"""
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
    blowup(spark, src, big, factor)
    if (flags("--pipeline")) {
      // funnel-at-scale mode: the two pipeline legs, nothing else
      println(pipelineLeg(spark, big, batteries = false))
      println(pipelineLeg(spark, big, batteries = true))
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
