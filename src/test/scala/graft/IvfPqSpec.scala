package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** Quality gate for the composed IVF-PQ path (x76, rows-only): recall
  * is bounded by the IVF probe stage (P=4 → 0.80, IvfRecallSpec) and
  * the ADC shortlist inside probed lists is near-exact (PqRecallSpec),
  * so the composition must land AT the IVF bound — a drop below it
  * means the PQ stage is re-ranking wrongly inside the probed lists;
  * exact score agreement must survive the composition unchanged.
  */
class IvfPqSpec extends AnyFunSuite with SparkSpec {

  test("IVF-PQ top-3 recall vs brute force equals the IVF probe bound; exact scores") {
    val brute = ExtensionQueries.x05_ann_topk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val composed = graft.ml.IvfPq.searchTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))

    val bruteTop3 = brute.filter(_._2 <= 3).map(t => (t._1, t._3)).toSet
    val bruteCos = brute.map(t => (t._1, t._3) -> t._4).toMap

    composed.foreach { case (q, v, cos) =>
      bruteCos.get((q, v)).foreach { b =>
        assert(math.abs(b - cos) < 1e-9, s"score mismatch for ($q,$v)")
      }
    }

    val hits = composed.count { case (q, v, _) => bruteTop3((q, v)) }
    val recall = hits.toDouble / bruteTop3.size
    info(f"IVF-PQ recall@3 = $recall%.2f (${hits}/${bruteTop3.size})")
    assert(recall >= 0.8, f"recall@3 below the IVF probe bound: $recall%.2f")
  }

  test("IVF-PQ ranks candidates only from probed lists (subset of IVF's candidate space)") {
    // with identical probe ranking, the composed result's recalled set
    // can never contain a vector the pure-IVF probe stage cannot see:
    // every returned vec must sit in one of the query's 4 nearest lists
    import org.apache.spark.sql.functions.col
    val ivf = graft.ml.IvfIndex.build(spark, sf)
    val lists = ivf.assigned.select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cents = ivf.centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.VecMath.asDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    def probedLists(q: Array[Double]): Set[Int] =
      cents.toSeq.map { case (id, c) =>
        (id, -c.zip(q).map { case (a, b) => a * b }.sum)
      }.sortBy(t => (t._2, t._1)).take(4).map(_._1).toSet

    graft.ml.IvfPq.searchTopK(spark, sf).collect().foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(2))
      assert(probedLists(emb(q)).contains(lists(v)),
        s"result ($q,$v) came from an unprobed list")
    }
  }
}
