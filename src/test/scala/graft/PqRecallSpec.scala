package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.PqIndex
import graft.queries.ExtensionQueries

/** Quality gate for the PQ ANN path (x75 is rows-only for the oracle —
  * the codebooks are k-means-trained — so the accuracy contract lives
  * here): the ADC score must BE the inner product against the coded
  * reconstruction (the defining PQ identity — any LUT/code indexing
  * slip breaks it by whole subspace terms, not ulps), the code frame
  * must have the claimed 1-byte-per-subspace shape, and the
  * shortlist+re-rank search must recover the brute-force top-3 with
  * exact score agreement on overlaps.
  */
class PqRecallSpec extends AnyFunSuite with SparkSpec {

  test("ADC identity: the ADC score equals dot(query, reconstruction) for every corpus vector") {
    val ix = PqIndex.build(spark, sf)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.VecMath.asDouble(col("embedding")).as("v"))

    // driver-side ground truth: reconstruction from collected codes +
    // the driver-held codebooks, dotted against each query in plain Scala
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val codes = ix.codes.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val queries = (0L to 4L).map(q => q -> vecs(q))

    // DataFrame-side ADC, exactly as search() computes it
    val q = spark.createDataFrame(
      spark.sparkContext.parallelize(queries.map(t => org.apache.spark.sql.Row(t._1))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType))))
      .join(emb.withColumnRenamed("vec_id", "query_id").withColumnRenamed("v", "qv"), Seq("query_id"))
      .withColumn("lut", PqIndex.lutFor(ix, col("qv")))
    val adc = ix.codes.join(broadcast(q))
      .withColumn("ip", PqIndex.adcIp(col("lut"), col("codes")))
      .select("query_id", "vec_id", "ip").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    assert(adc.size === queries.size * vecs.size)
    queries.foreach { case (qid, qv) =>
      vecs.keys.foreach { vid =>
        val r = reconstruct(ix, codes(vid))
        val expected = qv.zip(r).map { case (a, b) => a * b }.sum
        assert(math.abs(adc((qid, vid)) - expected) < 1e-9,
          s"ADC != dot(q, reconstruction) for ($qid,$vid)")
      }
    }
  }

  test("code frame shape: M codes per vector, each within [0, ksub)") {
    val ix = PqIndex.build(spark, sf)
    val bad = ix.codes.filter(size(col("codes")) =!= ix.m or
        exists(col("codes"), c => c < 0 || c >= 16))
      .count()
    assert(bad === 0L)
    assert(ix.codes.columns.toSeq === Seq("vec_id", "codes", "vnorm"))
  }

  test("PQ shortlist+re-rank top-3 recall vs brute force, exact score agreement") {
    val brute = ExtensionQueries.x05_ann_topk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val pq = ExtensionQueries.x75_ann_pq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))

    val bruteTop3 = brute.filter(_._2 <= 3).map(t => (t._1, t._3)).toSet
    val bruteCos = brute.map(t => (t._1, t._3) -> t._4).toMap

    // the re-rank computes the same round(cosine, 6) as x05: overlapping
    // pairs must agree exactly (PQ changes WHICH pairs reach the
    // re-rank, never the re-ranked score)
    pq.foreach { case (q, v, cos) =>
      bruteCos.get((q, v)).foreach { b =>
        assert(math.abs(b - cos) < 1e-9, s"score mismatch for ($q,$v)")
      }
    }

    val hits = pq.count { case (q, v, _) => bruteTop3((q, v)) }
    val recall = hits.toDouble / bruteTop3.size
    info(f"PQ recall@3 = $recall%.2f (${hits}/${bruteTop3.size})")
    // the measured ladder (PqIndex Scaladoc): the default m=16/ksub=16/
    // shortlist=64 scores 1.00 on this fixture; a regression to a
    // coarser effective configuration (m=8-equivalent error, or a
    // shortlist cut) lands at 0.87 or below, under this bar
    assert(recall >= 0.9, f"recall@3 too low: $recall%.2f")
  }

  test("published artifact round-trip: a loaded index searches row-identically") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq_store").toString
    val v = PqIndex.save(spark, sf, root)
    val loaded = PqIndex.load(spark, root, Some(v))
    try {
      val built = PqIndex.build(spark, sf)
      assert(loaded.m === built.m && loaded.dsub === built.dsub)
      // codebooks survive the parquet roundtrip bit-for-bit (doubles)
      assert(loaded.codebooks.flatten.flatten.toSeq ===
        built.codebooks.flatten.flatten.toSeq)
      val emb = Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          graft.functions.VecMath.asDouble(col("embedding")).as("v"))
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val a = PqIndex.search(spark, sf, built, queries).collect().map(_.toSeq)
      val b = PqIndex.search(spark, sf, loaded, queries).collect().map(_.toSeq)
      assert(a.toSeq === b.toSeq,
        "loaded index returned different rows than the built one")
    } finally graft.Caches.clear(root)
  }

  private def reconstruct(ix: PqIndex.Index, codes: Array[Int]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, mi) => ix.codebooks(mi)(c) }
}
