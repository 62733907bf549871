package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** Quality gate for the IVF ANN path (x21 is rows-only for the oracle —
  * KMeans isn't SQL-expressible — so the accuracy contract lives here):
  * the probed-list search must recover most of the brute-force top-3,
  * and every cosine it reports must equal the brute-force cosine for
  * that (query, vec) pair (IVF changes WHICH pairs are scored, never
  * the score).
  */
class IvfRecallSpec extends AnyFunSuite with SparkSpec {

  test("IVF top-3 recall vs brute force, and exact score agreement") {
    val brute = ExtensionQueries.x05_ann_topk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val ivf = graft.ml.IvfIndex.searchTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))

    val bruteTop3 = brute.filter(_._2 <= 3).map(t => (t._1, t._3)).toSet
    val bruteCos = brute.map(t => (t._1, t._3) -> t._4).toMap

    // exact score agreement on overlapping pairs (both sides round(…,6))
    ivf.foreach { case (q, v, cos) =>
      bruteCos.get((q, v)).foreach { b =>
        assert(math.abs(b - cos) < 1e-9, s"score mismatch for ($q,$v)")
      }
    }

    val hits = ivf.count { case (q, v, _) => bruteTop3((q, v)) }
    val recall = hits.toDouble / bruteTop3.size
    info(f"IVF recall@3 = $recall%.2f (${hits}/${bruteTop3.size})")
    assert(recall >= 0.3, f"recall@3 too low: $recall%.2f")
  }
}
