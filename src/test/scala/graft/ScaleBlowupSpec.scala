package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Tokenize

/** The 10× blowup generator's invariants (round-12 verdict ask #7):
  * SCALE.md's measured exponents are only meaningful if the blowup is
  * "N× more data of the same shape" — deterministic, replica
  * vocabularies disjoint (so dup structure repeats instead of
  * collapsing into exact-dup groups), embedding norms preserved.
  */
class ScaleBlowupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("blowup: N× counts, disjoint replica vocabularies, norm-preserving embeddings, deterministic") {
    val work = java.nio.file.Files.createTempDirectory("graft_blow").toString
    val out = s"$work/x3"
    ScaleBlowup.blowup(spark, sf, out, 3)

    val docs0 = spark.read.parquet(s"$sf/documents.parquet")
    val docsB = spark.read.parquet(s"$out/documents.parquet")
    assert(docsB.count() === 3 * docs0.count())
    assert(docsB.select("doc_id").distinct().count() === docsB.count(),
      "replica ids must not collide")
    // replica k=0 is the original corpus byte-for-byte
    assert(docsB.filter(col("doc_id") < 10000000L)
      .exceptAll(docs0).count() === 0L)
    // replica VOCABULARIES are pairwise disjoint — the property that
    // keeps the banding family's measured growth about corpus SIZE,
    // not about an exploding cross-replica dup rate
    val shared = docsB
      .select((col("doc_id") / 10000000L).cast("int").as("k"),
        explode(Tokenize.tokens(col("text"))).as("t"))
      .distinct()
      .groupBy("t").agg(countDistinct(col("k")).as("nk"))
      .filter(col("nk") > 1).count()
    assert(shared === 0L, s"$shared tokens shared across replicas")

    val e0 = spark.read.parquet(s"$sf/embeddings.parquet")
    val eB = spark.read.parquet(s"$out/embeddings.parquet")
    assert(eB.count() === 3 * e0.count())
    // a circular shift preserves the norm exactly (same floats, new
    // order); join each replica back to its source and compare
    val norms = eB
      .select((pmod(col("vec_id"), lit(10000000L))).as("vec_id"),
        graft.functions.VecMath.l2norm(graft.functions.VecMath.asDouble(col("embedding"))).as("nb"))
      .join(e0.select(col("vec_id"),
        graft.functions.VecMath.l2norm(graft.functions.VecMath.asDouble(col("embedding"))).as("n0")),
        Seq("vec_id"))
    assert(norms.filter(abs(col("nb") - col("n0")) > 1e-4).count() === 0L)
    // replicas are directionally DISTINCT from their source (the shift
    // moved coordinates) for the overwhelming majority of vectors
    val sameDir = eB.filter(col("vec_id") >= 10000000L)
      .select((pmod(col("vec_id"), lit(10000000L))).as("vec_id"),
        col("embedding").as("eb"))
      .join(e0.select(col("vec_id"), col("embedding").as("e0")), Seq("vec_id"))
      .filter(col("eb") === col("e0")).count()
    assert(sameDir < e0.count() / 10,
      s"$sameDir replicas identical to their source vector")

    // deterministic: a second generation into a fresh dir is
    // row-identical (no RNG, no clock anywhere in the generator)
    val out2 = s"$work/x3b"
    ScaleBlowup.blowup(spark, sf, out2, 3)
    val docsB2 = spark.read.parquet(s"$out2/documents.parquet")
    assert(docsB.exceptAll(docsB2).count() === 0L &&
      docsB2.exceptAll(docsB).count() === 0L)

    // reuse is marker-gated (round-14 review: a bare existence check
    // would serve a directory generated under an OLD replica scheme):
    // a matching marker short-circuits; a mismatched one regenerates
    val markerPath = java.nio.file.Paths.get(out2, "_BLOWUP_SCHEME")
    val goodMarker = java.nio.file.Files.readAllBytes(markerPath)
    ScaleBlowup.blowup(spark, sf, out2, 3) // matching marker → reuse
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(markerPath), goodMarker))
    java.nio.file.Files.write(markerPath,
      "v0 factor=3 off=1".getBytes("UTF-8"))
    ScaleBlowup.blowup(spark, sf, out2, 3) // stale scheme → regenerate
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(markerPath), goodMarker),
      "regeneration must restore the current scheme marker")
    val docsB3 = spark.read.parquet(s"$out2/documents.parquet")
    assert(docsB.exceptAll(docsB3).count() === 0L &&
      docsB3.exceptAll(docsB).count() === 0L)
  }

  test("a regenerated source republishes the blowup even with unchanged ids") {
    // round-14 advice: the old marker pinned the derived id OFFSET, so
    // a regenerated source whose max id happened to be unchanged
    // silently served the stale directory. The marker now pins the
    // source fileFingerprints (metadata-only), so a byte-identical
    // REWRITE of a source table — same ids, same content, new mtime —
    // must regenerate.
    val work = java.nio.file.Files.createTempDirectory("graft_blowfp").toString
    val srcCopy = s"$work/src"
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Tables.names) {
      val from = new org.apache.hadoop.fs.Path(s"$sf/$t.parquet")
      if (fs.exists(from))
        org.apache.hadoop.fs.FileUtil.copy(fs, from, fs,
          new org.apache.hadoop.fs.Path(s"$srcCopy/$t.parquet"), false, true,
          spark.sparkContext.hadoopConfiguration)
    }
    val out = s"$work/x2"
    ScaleBlowup.blowup(spark, srcCopy, out, 2)
    val markerPath = java.nio.file.Paths.get(out, "_BLOWUP_SCHEME")
    val m1 = new String(java.nio.file.Files.readAllBytes(markerPath), "UTF-8")
    ScaleBlowup.blowup(spark, srcCopy, out, 2) // unchanged → reuse
    assert(new String(java.nio.file.Files.readAllBytes(markerPath),
      "UTF-8") === m1)
    // rewrite embeddings in place: identical rows, fresh files
    val e = spark.read.parquet(s"$srcCopy/embeddings.parquet").collect()
    val schema = spark.read.parquet(s"$srcCopy/embeddings.parquet").schema
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(e: _*)), schema)
      .write.mode("overwrite").parquet(s"$srcCopy/embeddings.parquet")
    ScaleBlowup.blowup(spark, srcCopy, out, 2)
    val m2 = new String(java.nio.file.Files.readAllBytes(markerPath), "UTF-8")
    assert(m2 !== m1,
      "regenerated source must change the marker (fingerprint basis)")
  }

  test("battery variant: the planted stratum clears every battery gate") {
    // round-14 verdict ask #4's unit half (the 10× published>0 run is
    // asserted inside pipelineLeg and recorded in SCALE.md): planted
    // docs must pass the FULL Gopher conjunction and the C4 page rule,
    // carry embeddings, and stay distinct under near-dup shingling.
    val work = java.nio.file.Files.createTempDirectory("graft_battvar")
      .toString
    val big = s"$work/x2"
    ScaleBlowup.blowup(spark, sf, big, 2)
    val variant = s"$work/x2_battery"
    ScaleBlowup.batteryVariant(spark, big, variant, nPlanted = 50)
    val docs = spark.read.parquet(s"$variant/documents.parquet")
    val nBig = spark.read.parquet(s"$big/documents.parquet").count()
    assert(docs.count() === nBig + 50)
    val planted = docs.filter(col("source") === "planted")
    assert(planted.count() === 50L)
    val gopher = graft.queries.ExtensionQueries.gopherFlagsOf(planted)
    assert(gopher.filter(!col("gopher_pass")).count() === 0L,
      "every planted doc must clear the full Gopher conjunction")
    // the battery funnel GATES ON the x57 verdict first — a stratum
    // that passes Gopher but fails the verdict (the first variant's
    // failure mode: rotating-bank text repeated 3-grams past
    // dup_frac's 0.02 bar) still publishes empty
    val verdict = graft.queries.ExtensionQueries
      .x57_filter_verdict(spark, variant)
      .join(planted.select("doc_id"), Seq("doc_id"), "left_semi")
    assert(verdict.filter(!col("keep")).count() === 0L,
      "every planted doc must clear the x57 verdict gate")
    val c4 = graft.queries.ExtensionQueries.c4LineRulesOf(planted)
    assert(c4.filter(!col("page_kept")).count() === 0L,
      "every planted doc must survive the C4 page rule")
    // embeddings present and distinct per planted doc
    val emb = spark.read.parquet(s"$variant/embeddings.parquet")
      .join(planted.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    assert(emb.count() === 50L)
    assert(emb.select("embedding").distinct().count() === 50L)
    // the per-doc unique tokens keep the stratum out of exact-dup
    // collapse: no two planted texts identical
    assert(planted.select("text").distinct().count() === 50L)
  }

  test("measured families are declared queries in cold-dependency order") {
    ScaleBlowup.families.foreach(q =>
      assert(SparkEntry.queries.contains(q), s"$q is not a declared query"))
    // x04 must precede x02 (shared shingle posting), x96 precede x97
    // (lexical artifact feeds the hybrid), x129 precede x140 (the
    // (μ,W) feeds the whitened index)
    val ix = ScaleBlowup.families.zipWithIndex.toMap
    assert(ix("x04_ngram_jaccard") < ix("x02_dedup_minhash"))
    assert(ix("x96_bm25_indexed") < ix("x97_hybrid_indexed"))
    assert(ix("x129_whiten") < ix("x140_whiten_ivf"))
    // x145 publishes the two-sided bitext artifact x147 serves from
    assert(ix("x145_bitext_mining_ann") < ix("x147_bitext_extract_ann"))
  }
}
