package graft.ml

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib near-dup detection via `MinHashLSH` — the library-function
  * counterpart of the hand-built banded MinHash in
  * ExtensionQueries.x02 (SURVEY.md §4: similarity joins belong in a
  * library function, not a Catalyst rule).
  *
  * Hybrid design: MLlib generates the CANDIDATES (documents become
  * binary shingle-presence vectors via HashingTF, `MinHashLSH.fit/
  * transform` attaches 8 minhash values, pairs sharing any minhash
  * bucket are candidates — the same bucketing `approxSimilarityJoin`
  * does internally), but the SCORING is the codegen'd exact-Jaccard
  * verification shared with x02/x04 (two semi-joins into the shingle
  * posting table). `approxSimilarityJoin` itself is deliberately NOT
  * used: it scores every candidate with a per-pair JVM `keyDistance`
  * call over the full feature vectors through a non-codegen UDF join —
  * measured 14–22 s at sf0.1 vs ~4 s for x02 on the same corpus. The
  * hybrid keeps the MLlib API surface where it is cheap (hashing) and
  * Catalyst where it is hot (the joins).
  *
  * SHINGLES, not tokens, is load-bearing: MLlib's MinHashLSH is
  * OR-amplification only (each of the numHashTables is a SINGLE
  * minhash — no band-size dial like x02's bands of 3), so two docs
  * become candidates whenever ANY minhash matches. Over token sets the
  * global minimum lands on ubiquitous tokens ('the', 'a', …) shared by
  * most documents — candidate volume degenerates to ~n² (measured:
  * minutes at 5k docs, fatal at scale). The shingle space is vastly
  * larger and its minima are document-specific, so buckets stay small
  * while genuinely-near docs (which share most shingles) still
  * collide. Default shingleN = 3 so the verification measure — exact
  * 3-gram Jaccard ≥ minJaccard — is IDENTICAL to x02/x04's: at the
  * default settings this returns the x04 pair set minus any LSH
  * candidate misses (MlLshSpec pins that recall).
  * At 100 TB the candidate join shuffles on (table, minhash-bucket)
  * keys, never the corpus cross-product, and the verification joins
  * shuffle on posting keys — both linear in data, not pairs.
  *
  * Deterministic (fixed seed) but hash-based — not SQL-expressible, so
  * the x46 query entry is rows-only; MlLshSpec pins recall against the
  * exact x04 pair set.
  */
object MlLshDedup {

  def nearDupPairs(spark: SparkSession, sfDir: String,
      minJaccard: Double = 0.5, shingleN: Int = 3): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    // Build the per-doc shingle arrays FROM the shared posting table
    // (x02/x04 hit the same cache entry at the default n): the groupBy
    // both reuses that materialization and lands the HashingTF/minhash
    // UDF work on shuffle partitions — hashing straight off the scan
    // would run on the (single, small-file) input split at bench scale.
    // Docs with zero shingles simply have no posting rows, so the
    // MinHashLSH empty-vector requirement holds by construction.
    val sh = graft.queries.ExtensionQueries.docShingles(docs, shingleN)
    val perDoc = sh.groupBy("doc_id").agg(collect_list("shingle").as("shs"))
    val tf = new HashingTF().setInputCol("shs").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(perDoc)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    // fit() reads the data only to learn the input DIMENSION (a
    // first-row peek — but that peek runs the collect_list groupBy's
    // whole map side, a full feature pass). The dimension here is the
    // HashingTF constant (1 << 18) and MinHashLSH's coefficients are a
    // pure function of (seed, numHashTables), so fitting on a 1-row
    // frame of that dimension yields the IDENTICAL model for a full
    // pass less (MlLshSpec's recall pin against exact x04 guards this)
    val dimProbe = {
      import spark.implicits._
      Seq(Tuple1(org.apache.spark.ml.linalg.Vectors
        .sparse(1 << 18, Array(0), Array(1.0)))).toDF("features")
    }
    val model = lsh.fit(dimProbe)
    // Bucket rows: one row per (doc, hash-table) with the minhash value
    // as the bucket key. vector_to_array touches n_docs × 8 tiny rows —
    // off the hot path.
    val buckets = model.transform(feat)
      .select(col("doc_id"), posexplode(col("hashes")).as(Seq("t", "h")))
      .select(col("doc_id"), col("t"),
        vector_to_array(col("h")).getItem(0).as("hv"))
    val b1 = buckets.select(col("doc_id").as("d1"), col("t"), col("hv"))
    val b2 = buckets.select(col("doc_id").as("d2"), col("t"), col("hv"))
    val cand = b1.join(b2, Seq("t", "hv")).filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    // Exact-Jaccard verification on the raw shingle posting table —
    // the same measure (and code) as x02/x04.
    graft.queries.ExtensionQueries.jaccardOf(cand, sh, minJaccard)
      .select(col("d1"), col("d2"), col("jaccard").as("jaccard_sim"))
      .orderBy("d1", "d2")
  }
}
