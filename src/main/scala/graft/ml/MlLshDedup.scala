package graft.ml

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tokenize

/** MLlib near-dup detection via `MinHashLSH.approxSimilarityJoin` — the
  * library-function counterpart of the hand-built banded MinHash in
  * ExtensionQueries.x02 (SURVEY.md §4: similarity joins belong in a
  * library function, not a Catalyst rule).
  *
  * Documents become binary 5-gram-SHINGLE-presence vectors (HashingTF,
  * binary mode — presence, not counts, so the distance is true Jaccard
  * on the hashed shingle space); the LSH join prunes candidate pairs by
  * matching minhash values and reports the EXACT Jaccard distance of
  * the survivors (keyDistance, not the estimate).
  *
  * SHINGLES, not tokens, is load-bearing: MLlib's MinHashLSH is
  * OR-amplification only (each of the numHashTables is a SINGLE minhash
  * — there is no band-size dial like x02's bands of 3), so two docs
  * become candidates whenever ANY minhash matches. Over token sets the
  * global minimum lands on ubiquitous tokens ('the', 'a', …) shared by
  * most documents — candidate volume degenerates to ~n² (measured:
  * minutes at 5k docs, fatal at scale). The shingle space is vastly
  * larger and its minima are document-specific, so buckets stay small
  * while genuinely-near docs (which share most shingles) still collide;
  * 5-grams (vs x02's 3-grams) push selectivity further. Note the
  * threshold therefore binds on 5-gram Jaccard, which runs LOWER than
  * 3-gram Jaccard for the same pair — near-dups at x02/x04's 0.5
  * 3-gram boundary need a looser maxJaccardDist here (the planted
  * testdata pairs sit at ~0.95 and clear both comfortably).
  * At 100 TB the join shuffles on hash-bucket keys, never the corpus
  * cross-product.
  *
  * Deterministic (fixed seed) but hash-based — not SQL-expressible, so
  * the x46 query entry is rows-only; MlLshSpec pins recall against the
  * exact x04 pair set.
  *
  * Measured (sf0.1, local[32]): ~20 s vs ~4 s for the hand-built banded
  * MinHash (x02) on the same corpus — MLlib's pipeline runs the hash
  * explode + join through non-codegen UDFs and scores every candidate
  * with a JVM keyDistance call. Provided for API parity; prefer x02's
  * formulation where throughput matters.
  */
object MlLshDedup {

  def nearDupPairs(spark: SparkSession, sfDir: String,
      maxJaccardDist: Double = 0.5): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(Tokenize.shingles(col("toks"), 5)).as("toks"))
      .filter(size(col("toks")) > 0) // MinHashLSH rejects empty vectors
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxJaccardDist, "jdist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"),
        col("jdist"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        (floor((lit(1.0) - col("jdist")) * 1000000 + lit(0.5)) / 1000000)
          .as("jaccard_sim"))
      .orderBy("d1", "d2")
  }
}
