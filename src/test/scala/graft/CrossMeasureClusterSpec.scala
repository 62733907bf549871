package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** The cross-measure closure's reason to exist, exercised on data
  * that actually distinguishes it (review finding: the shared
  * testdata's containment pairs coincide with its Jaccard pairs at
  * every SF, so the oracles alone validate x72 only as a replay of
  * x29). Planted here: A ~ B by Jaccard (near-identical long docs)
  * and C ⊂ B by containment ONLY (a short excerpt — ≥90% of its
  * shingles inside B, but B is long enough that Jaccard(B, C) < 0.5).
  * One representative per {A, B, C} requires edges across measures.
  */
class CrossMeasureClusterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("containment-only edges merge clusters that Jaccard alone cannot") {
    val base = (1 to 60).map(i => s"tok$i alpha$i beta$i").mkString(" ")
    val aText = base + " unique tail for doc a"
    val bText = base + " unique tail for doc b"
    // C = a contiguous slice of B's token stream: all its 3-gram
    // shingles appear in B, but it is ~10x shorter than B
    val cText = (20 to 27).map(i => s"tok$i alpha$i beta$i").mkString(" ")
    // unrelated doc to keep the pair machinery honest about absences
    val dText = (1 to 40).map(i => s"other$i gamma$i").mkString(" ")
    val docs = Seq(
      (1L, aText, "en", "srcA", aText.length.toLong),
      (2L, bText, "en", "srcA", bText.length.toLong),
      (3L, cText, "en", "srcA", cText.length.toLong),
      (4L, dText, "en", "srcA", dText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val work = Files.createTempDirectory("graft_xmeasure")
    docs.write.parquet(s"$work/documents.parquet")
    val dir = work.toString

    // the fixture does what it claims: (1,2) is Jaccard-reachable,
    // (2,3) is containment-ONLY
    val jac = ExtensionQueries.x04_ngram_jaccard(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(jac.contains((1L, 2L)), s"A~B should pass Jaccard: $jac")
    assert(!jac.contains((2L, 3L)) && !jac.contains((1L, 3L)),
      s"the excerpt must NOT be Jaccard-reachable or the fixture is moot: $jac")
    val cont = ExtensionQueries.x70_containment(spark, dir)
      .select("d1", "d2", "contained_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cont.exists(t => t._1 == 2L && t._2 == 3L && t._3 == 3L),
      s"C⊂B should pass containment with C as contained_id: $cont")

    // x29 (Jaccard edges only) leaves C outside A/B's component;
    // x72 (union) closes over all three. Doc 4 is in neither.
    def clusters(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val c29 = clusters(ExtensionQueries.x29_dup_clusters(spark, dir))
    assert(c29.get(1L) === c29.get(2L))
    assert(!c29.contains(3L) || c29(3L) != c29(1L),
      s"x29 must not reach the excerpt: $c29")
    val c72 = clusters(ExtensionQueries.x72_dup_clusters_all(spark, dir))
    assert(c72(1L) === c72(2L) && c72(2L) === c72(3L),
      s"x72 must close over {A,B,C}: $c72")
    assert(!c72.contains(4L), s"unrelated doc joined a cluster: $c72")

    // exactly the three planted dups are clustered, nothing else
    assert(c72.keySet === Set(1L, 2L, 3L))
  }
}
