package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{ExtensionQueries, ReferenceQueries}
import graft.sources.VersionedStore

/** End-to-end training-data pipeline over one corpus snapshot — the
  * "a reference user could switch" demo, wiring the library's stages
  * the way a production job would:
  *
  *   1. preprocessing verdict (x57: lang / exact-dup / quality /
  *      repetition) → keep set
  *   2. near-dup pruning on the keep set (banded MinHash x02 shape:
  *      drop the higher doc_id of every verified near-dup pair)
  *   3. doc vectors for the survivors (the reference's E1 flagship)
  *   4. sequence packing of the survivors into fixed-size training
  *      sequences (the x59 pack-then-chunk shape, survivor-only)
  *   5. publish vectors + packing as ONE immutable multi-table
  *      snapshot version (VersionedStore.publishAll) a training run
  *      can pin forever — vectors of v=N can never pair with packing
  *      of v=N-1
  *
  * Every stage is the already-oracle-checked query; this object only
  * composes them. Returns (version, kept, pruned, vectorized,
  * sequences, packedTokens) so callers/specs can assert the funnel.
  */
object Pipeline {

  case class Result(version: Long, kept: Long, prunedNearDup: Long,
      vectorized: Long, sequences: Long, packedTokens: Long)

  def run(spark: SparkSession, sfDir: String, storeRoot: String): Result = {
    val docs = Tables.documents(spark, sfDir)

    // 1. verdict gate (persisted: the funnel counts AND the corpus
    // join below all read it — without the persist each action re-runs
    // the whole verdict lineage)
    val keepIds = ExtensionQueries.x57_filter_verdict(spark, sfDir)
      .filter(col("keep")).select("doc_id").persist()
    val kept = keepIds.count()

    // 2. near-dup pruning among the KEPT docs: for a verified pair
    // with both sides kept, the lower doc_id is canonical and the
    // higher is dropped. Pairs whose canonical already fell to the
    // verdict gate must NOT drop the survivor — restricting both pair
    // sides to the keep set guarantees every dropped doc leaves a
    // kept canonical behind (anti-join — no collect).
    val pairs = ExtensionQueries.x02_dedup_minhash(spark, sfDir)
    val keptPairs = pairs
      .join(keepIds.withColumnRenamed("doc_id", "d1"), Seq("d1"), "left_semi")
      .join(keepIds.withColumnRenamed("doc_id", "d2"), Seq("d2"), "left_semi")
    val dupLosers = keptPairs.select(col("d2").as("doc_id")).distinct()
    val survivors = keepIds.join(dupLosers, Seq("doc_id"), "left_anti").persist()

    // 3. flagship vectors for the surviving docs
    val corpus = docs.join(survivors, Seq("doc_id"), "left_semi")
    val vecs = ReferenceQueries.docVectors(
      corpus, ReferenceQueries.wordvecs8(spark, sfDir), ReferenceQueries.VecDim)
      .select(col("doc_id"), col("known_ratio"), col("vec"))

    // 4. pack ONLY the survivors into training sequences (no shared
    // corpus cache: the survivor posting is this run's private frame)
    val packed = ExtensionQueries.seqPackOf(corpus, sharedCache = false)

    // 5. one atomic multi-table snapshot: vectors + packing together
    val version = VersionedStore.publishAll(
      Map("vectors" -> vecs, "packing" -> packed), storeRoot)
    val vectorized =
      VersionedStore.readTable(spark, storeRoot, version, "vectors").count()
    val packStats = VersionedStore.readTable(spark, storeRoot, version, "packing")
      .agg(coalesce(max(col("last_seq")) + 1, lit(0L)).as("n_seq"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("tot"))
      .head()
    val pruned = kept - survivors.count()
    keepIds.unpersist(); survivors.unpersist()
    Result(version, kept, pruned, vectorized,
      packStats.getLong(0), packStats.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val store = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_pipeline").toString + "/store")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, sfDir, store)
    println(s"""{"version":${r.version},"kept":${r.kept},""" +
      s""""pruned_near_dup":${r.prunedNearDup},"vectorized":${r.vectorized},""" +
      s""""sequences":${r.sequences},"packed_tokens":${r.packedTokens}}""")
    spark.stop()
  }
}
