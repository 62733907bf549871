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

  test("centrality losers: the star hub keeps regardless of doc_id order") {
    import spark.implicits._
    // hub 9 connected to spokes 1..4 (plus one spoke-spoke edge so the
    // graph isn't a pure tree); a second component is a symmetric
    // 2-clique {20, 21}. Under min-id the star would keep doc 1; under
    // centrality the hub (deg 4) must keep. The tie-symmetric clique
    // degrades to min-id (keep 20).
    val pairs = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (1L, 2L),
      (20L, 21L)).toDF("d1", "d2")
    val losers = graft.queries.ExtensionQueries
      .centralityLosersOf(pairs, "spec").collect().map(_.getLong(0)).toSet
    assert(losers === Set(1L, 2L, 3L, 4L, 21L))
  }

  test("centrality losers equal the dense reference on the corpus dup graph") {
    val pairsDf = ExtensionQueries.x04_ngram_jaccard(spark, sf)
      .select("d1", "d2")
      .unionByName(graft.queries.ExtensionQueries.x70_containment(spark, sf)
        .select("d1", "d2"))
      .distinct()
    val pairs = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty)
    // driver reference: union-find components + dense PageRank, keep
    // the (max rank, min doc_id) member per component
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val ranks = refRanks(members.size.toLong, pairs, members)
    val got = ExtensionQueries.centralityLosersOf(pairsDf, "spec")
      .collect().map(_.getLong(0)).toSet
    // epsilon-tolerant keeper check (round-10 ADVICE): the distributed
    // ranks sum floats in partition order, so two structurally-distinct
    // docs with numerically near-equal ranks may order differently
    // across core counts — exact loser-set equality would be flaky on
    // other machines. Instead pin the INVARIANTS: losers ⊂ graph
    // members, every component keeps exactly one member, and the kept
    // member's reference rank is within a relative epsilon of its
    // component's max (a valid argmax up to float noise).
    assert(got.subsetOf(members.toSet), "loser outside the dup graph")
    for ((_, comp) <- members.groupBy(find)) {
      val kept = comp.filterNot(got)
      assert(kept.size === 1, s"component $comp kept $kept")
      val maxR = comp.map(ranks).max
      val eps = 1e-9 * math.max(maxR, 1e-12)
      assert(ranks(kept.head) >= maxR - eps,
        s"kept ${kept.head} rank ${ranks(kept.head)} below component max $maxR")
      // among EXACT reference ties at the max, the pick is min doc_id
      // (the distributed tie-break on equal floats)
      val exactTies = comp.filter(d => ranks(d) == maxR)
      if (exactTies.contains(kept.head))
        assert(kept.head === exactTies.min,
          s"tie in $comp broke to ${kept.head}, not ${exactTies.min}")
    }
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
