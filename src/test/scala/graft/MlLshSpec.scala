package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.MlLshDedup
import graft.queries.ExtensionQueries

/** Quality contract for the MLlib LSH near-dup path (x46 is rows-only
  * for the oracle — hash-based feature vectors aren't SQL-expressible):
  * the approximate join must recover the exact inverted-index pair set.
  * sf0.01 is the smallest SF with planted near-dup pairs.
  */
class MlLshSpec extends AnyFunSuite with SparkSpec {

  test("approxSimilarityJoin recovers the exact x04 near-dup pairs") {
    val sfDir = this.sfDir("0.01")
    val exact = ExtensionQueries.x04_ngram_jaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "expected planted near-dup pairs at sf0.01")
    // x46 verifies with the SAME measure as x04 (exact 3-gram Jaccard
    // >= 0.5), so any divergence is purely LSH candidate-generation
    // misses (8 single-minhash tables, fixed seed); the <1.0 recall
    // budget covers those, should future testdata plant boundary pairs.
    val ml = MlLshDedup.nearDupPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recovered = exact.count(ml.contains)
    val recall = recovered.toDouble / exact.size
    info(f"ML-LSH recall over exact pairs = $recall%.2f ($recovered/${exact.size})")
    assert(recall >= 0.8, f"LSH missed too many exact pairs: $recall%.2f")
  }
}
