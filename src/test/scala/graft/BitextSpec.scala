package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** x144's margin scoring must do the one thing raw cosine can't:
  * demote HUB vectors. The fixture plants an English query whose
  * highest-cosine cross-lingual neighbor is a hub (a vector close to
  * every English doc) while its true translation pair sits at a lower
  * raw cosine but points somewhere the English pool doesn't — the
  * ratio margin divides the hub by its own fat neighborhood average
  * and picks the truth. (Corpus-level value equality is the
  * x144 DuckDB oracle; this pins the SEMANTICS on a constructed
  * geometry.)
  */
class BitextSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("margin picks the true pair where raw cosine picks the hub") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bitext").toString
    val docs = Seq(
      (1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"),
      (11L, "de"), (12L, "de"), (13L, "de"), (14L, "de"))
      .map { case (id, l) => (id, s"doc $id", l, "fixture", 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    // dim 5. en pool = 4 axes; de pool: three "translations" that mix
    // 0.6 of an en axis with 0.8 of axis 5 (INVISIBLE to the en pool,
    // so their own neighborhood average stays lean), plus the HUB —
    // tilted toward en1 so its raw cosine with en1 (0.748) BEATS the
    // true pair's (0.6), while its cosine with every other en doc
    // (0.35-0.40) fattens its neighborhood average.
    val embs = Seq(
      (1L, Array(1f, 0f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 0f, 1f, 0f)),
      (11L, Array(0.6f, 0f, 0f, 0f, 0.8f)),
      (12L, Array(0f, 0.6f, 0f, 0f, 0.8f)),
      (13L, Array(0f, 0f, 0.6f, 0f, 0.8f)),
      (14L, Array(0.75f, 0.4f, 0.4f, 0.35f, 0f))) // the hub
      .map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    embs.write.parquet(s"$dir/embeddings.parquet")

    // raw cosine would hand query 1 to the hub — the failure mode
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VecMath.asDouble(col("embedding")).as("v"))
    val q1 = e.filter(col("vec_id") === 1L).select(col("v").as("qv"))
    val rawBest = e.filter(col("vec_id") >= 11L).crossJoin(broadcast(q1))
      .select(col("vec_id"),
        graft.functions.VecMath.cosine(col("qv"), col("v")).as("cos"))
      .orderBy(col("cos").desc).head.getLong(0)
    assert(rawBest === 14L, "fixture must make raw cosine prefer the hub")

    val mined = ExtensionQueries.x144_bitext_mining(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(4)))).toMap
    assert(mined(1L)._1 === 11L,
      s"margin must pick the true pair over the hub: ${mined(1L)}")
    // the other planted translations mine cleanly too
    assert(mined(2L)._1 === 12L && mined(3L)._1 === 13L)
    // and the truth margin clears the global-threshold bar
    // CCMatrix-style mining filters on (~1.85 is the hub's margin on
    // this geometry; the truth pair sits comfortably above it)
    assert(mined(1L)._3 > 2.0,
      s"truth-pair margin unexpectedly low: ${mined(1L)._3}")

    // the ANN-served leg (x145's path) on the same tiny geometry:
    // 4 lists per side, nProbe=4 probes them all — the candidate
    // lists are exhaustive here, so hub demotion must reproduce
    // exactly through the artifact-served margin arithmetic
    val sides = graft.ml.BitextAnn.loadOrPublish(spark, dir)
    val annTiny = ExtensionQueries.bitextMineAnn(sides,
      sides.en.assigned.select(col("vec_id").as("query_id"),
        col("v").as("qv")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(annTiny(1L) === 11L && annTiny(2L) === 12L && annTiny(3L) === 13L,
      s"ANN-served margin must also demote the hub: $annTiny")
  }

  test("pair extraction: mutuality excludes the hub even above threshold") {
    // x146's two gates pull different weight on this geometry: the
    // hub's margin (~1.85) CLEARS the 1.06 extraction threshold, so
    // only the mutual-best rule can keep it out of the corpus — the
    // hub is some query's runner-up everywhere but nobody's mutual
    // argmax (its own best query's best match is that query's true
    // translation). The three planted pairs extract; the hub ships in
    // NO pair. Same fixture as the margin test above.
    val dir = java.nio.file.Files.createTempDirectory("graft_bitext_x146")
      .toString
    val docs = Seq(
      (1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"),
      (11L, "de"), (12L, "de"), (13L, "de"), (14L, "de"))
      .map { case (id, l) => (id, s"doc $id", l, "fixture", 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    val embs = Seq(
      (1L, Array(1f, 0f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 0f, 1f, 0f)),
      (11L, Array(0.6f, 0f, 0f, 0f, 0.8f)),
      (12L, Array(0f, 0.6f, 0f, 0f, 0.8f)),
      (13L, Array(0f, 0f, 0.6f, 0f, 0.8f)),
      (14L, Array(0.75f, 0.4f, 0.4f, 0.35f, 0f))) // the hub
      .map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
    embs.write.parquet(s"$dir/embeddings.parquet")

    val pairs = ExtensionQueries.x146_bitext_extract(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs === Map(1L -> 11L, 2L -> 12L, 3L -> 13L),
      s"extraction must keep exactly the mutual planted pairs: $pairs")
    assert(!pairs.values.exists(_ == 14L),
      "the hub must never ship in an extracted pair")
  }

  test("ANN-served mining recalls >= 0.9 of the exact leg's matches") {
    // round-13 verdict ask #1's done-criterion. A 40+40 planted-pair
    // fixture where the ANN path is genuinely approximate: √40 → 7
    // lists per side, nProbe=4 probes 4/7 — candidate lists are
    // partial, unlike the exhaustive tiny fixture above. Deterministic
    // throughout (sin-seeded vectors, hash-sampled Lloyd's).
    val dim = 16
    val nPairs = 40
    // splitmix-style integer hash → [-1, 1]: sin-seeded components
    // have near-periods (97·16 ≈ 247·2π collides seeds 16 apart)
    def mix(seed: Int, d: Int): Double = {
      var x = seed.toLong * 1000003L + d.toLong * 7919L + 12345L
      x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL; x ^= (x >>> 33)
      ((x & 0xffffffL).toDouble / 0xffffffL.toDouble) * 2 - 1
    }
    def unit(seed: Int): Array[Float] = {
      val v = Array.tabulate(dim)(d => mix(seed, d))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val enVecs = (0 until nPairs).map(i => i.toLong -> unit(i))
    val deVecs = (0 until nPairs).map { j =>
      val e = enVecs(j)._2
      val noise = unit(1000 + j)
      val mixed = e.zip(noise).map { case (a, b) => 0.75f * a + 0.25f * b }
      val n = math.sqrt(mixed.map(x => x * x).sum.toDouble).toFloat
      (100L + j) -> mixed.map(_ / n)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_bitext_ann")
      .toString
    (enVecs.map { case (id, _) => (id, "en") } ++
      deVecs.map { case (id, _) => (id, "de") })
      .map { case (id, l) => (id, s"doc $id", l, "fixture", 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    (enVecs ++ deVecs).map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val exact = ExtensionQueries.x144_bitext_mining(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sanity: the planted geometry mines cleanly in the exact leg
    assert((0 until nPairs).count(i => exact(i.toLong) == 100L + i)
      >= (nPairs * 9) / 10, s"planted pairs don't dominate: $exact")

    val sides = graft.ml.BitextAnn.loadOrPublish(spark, dir)
    assert(sides.x.centroids.count() === 7L,
      "fixture must exercise a genuinely partial probe (7 lists)")
    val ann = ExtensionQueries.bitextMineAnn(sides,
      sides.en.assigned.select(col("vec_id").as("query_id"),
        col("v").as("qv")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ann.size === nPairs, s"every en query must mine a match: $ann")
    val agree = exact.keys.count(q => ann.get(q).contains(exact(q)))
    assert(agree.toDouble / exact.size >= 0.9,
      s"ANN leg recalled only $agree/${exact.size} of the exact matches")

    // artifact freshness (the WhitenedIvf contract): a regenerated
    // embeddings table must republish the pair, never serve the stale
    // quantizers — memo cleared to simulate a fresh session
    val root = graft.ml.Bm25Index.artifactRoot("bitext", dir)
    val v1 = graft.sources.VersionedStore.latestVersion(root).get
    graft.ml.BitextAnn.clear(dir)
    val same = graft.ml.BitextAnn.loadOrPublish(spark, dir)
    assert(graft.sources.VersionedStore.latestVersion(root).get === v1,
      "unchanged source must serve the published version, not rebuild")
    assert(same.x.centroids.count() === 7L)
    graft.ml.BitextAnn.clear(dir)
    (enVecs ++ deVecs).map { case (id, v) => (id, v.map(_ * 2.0f), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    graft.Caches.clear(dir)
    graft.ml.BitextAnn.loadOrPublish(spark, dir)
    assert(graft.sources.VersionedStore.latestVersion(root).get > v1,
      "regenerated embeddings must republish the two-sided artifact")
  }
}
