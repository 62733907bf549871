package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedStore

/** The composed pipeline must behave like its parts: the funnel counts
  * reconcile with the stage queries, the published snapshot is pinned
  * and complete, and a second run publishes a NEW version without
  * touching the first.
  */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  test("verdict -> dedup -> vectorize -> pack -> snapshot, counts reconcile") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_pipe").toString + "/store"
    val r = Pipeline.run(spark, sf, store)

    val keep = graft.queries.ExtensionQueries.x57_filter_verdict(spark, sf)
      .filter(col("keep")).count()
    assert(r.kept === keep)
    assert(r.prunedNearDup >= 0 && r.prunedNearDup <= r.kept)
    assert(r.vectorized > 0)
    // vectorized <= survivors: docVectors drops token-less docs only
    assert(r.vectorized <= r.kept - r.prunedNearDup)

    // packing reconciles: the packed doc set is exactly the vectorized
    // set (both are the token-having survivors), the token stream is
    // contiguous (max end == total), and the sequence count is
    // ceil(total / capacity)
    val packing = VersionedStore.readTable(spark, store, r.version, "packing")
    assert(packing.count() === r.vectorized)
    val contig = packing.agg(max(col("end_off")), sum(col("n_tokens"))).head()
    assert(contig.getLong(0) === contig.getLong(1),
      "packed offsets must be gap-free")
    assert(r.packedTokens === contig.getLong(1))
    assert(r.sequences === (r.packedTokens + 255) / 256)

    // every near-dup pair with BOTH sides passing the verdict keeps
    // its canonical: d2 pruned, d1 either present or itself the d2 of
    // another kept pair (transitive chains) — never both lost
    val snapIds = VersionedStore.readTable(spark, store, r.version, "vectors")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(packing.select("doc_id").collect().map(_.getLong(0)).toSet
      === snapIds)
    val keptSet = graft.queries.ExtensionQueries.x57_filter_verdict(spark, sf)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val keptPairs = graft.queries.ExtensionQueries
      .x02_dedup_minhash(spark, sf)
      .collect().map(p => (p.getLong(0), p.getLong(1)))
      .filter { case (a, b) => keptSet(a) && keptSet(b) }
    val losers = keptPairs.map(_._2).toSet
    keptPairs.foreach { case (d1, d2) =>
      assert(!snapIds.contains(d2), s"near-dup loser $d2 kept")
      assert(snapIds.contains(d1) || losers.contains(d1),
        s"pair ($d1,$d2): canonical lost without replacement")
    }

    // snapshot is pinned: a second pipeline run appends a new version
    // and the first is untouched
    val before = VersionedStore.readTable(spark, store, r.version, "vectors").count()
    val r2 = Pipeline.run(spark, sf, store)
    assert(r2.version === r.version + 1)
    assert(VersionedStore.readTable(spark, store, r.version, "vectors").count()
      === before)
  }
}
