package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** Accuracy contract for x90 beyond the SQL oracle: the distributed
  * power iteration must match a plain single-node dense implementation
  * of the same T-step PageRank (no shared code — driver-side hash maps
  * over the collected pair frame), and the centrality must order a
  * planted hub above its satellites (the canonical-selection use).
  */
class PageRankSpec extends AnyFunSuite with SparkSpec {

  private val Damp = 0.85
  private val Iters = 10

  /** Dense reference: ranks over an undirected pair list. */
  private def refRanks(n: Long, pairs: Seq[(Long, Long)],
      docs: Seq[Long]): Map[Long, Double] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    for ((a, b) <- pairs) {
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    var r = docs.map(d => d -> 1.0 / n).toMap
    for (_ <- 1 to Iters) {
      val in = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for ((m, nbrs) <- adj; t <- nbrs) in(t) += r(m) / nbrs.size
      r = docs.map(d => d -> ((1 - Damp) / n + Damp * in(d))).toMap
    }
    r
  }

  test("x90 equals the dense single-node reference on the corpus graph") {
    val docs = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSeq
    val pairs = ExtensionQueries.x04_ngram_jaccard(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "corpus should have similarity edges")
    val ref = refRanks(docs.size.toLong, pairs, docs)
    val got = ExtensionQueries.x90_pagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size === docs.size)
    for (d <- docs)
      assert(math.abs(got(d) - ref(d) * docs.size) < 1e-5,
        s"doc $d: got ${got(d)}, ref ${ref(d) * docs.size}")
    // connected docs must outrank isolated ones (the teleport floor)
    val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val isolated = docs.filterNot(inGraph)
    if (isolated.nonEmpty && inGraph.nonEmpty) {
      val floor = got(isolated.head)
      assert(isolated.forall(d => math.abs(got(d) - floor) < 1e-6),
        "all isolated docs share the teleport floor")
      assert(got.collect { case (k, v) if inGraph(k) => v }.max > floor,
        "some connected doc must exceed the teleport floor")
    }
  }
}
