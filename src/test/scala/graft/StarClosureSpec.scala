package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtensionQueries

/** The dup-cluster closure (propagateLabels) is now two-path: the
  * min-label fast path (O(diameter) rounds — blocky dup clusters
  * converge in < 5) falls back past FastClosureRounds to the
  * large-star/small-star alternation, which converges in O(log² n)
  * rounds regardless of diameter (the round-12 verdict's named scale
  * fix for chain-shaped components: doc ~ its scrape ~ the scrape's
  * scrape …) — replacing the old loud FAILURE past a 50-round cap.
  * This spec pins both paths against exact union-find on adversarial
  * and random graphs; the x29/x72 DuckDB recursive-CTE oracles pin
  * the composite on the real corpus.
  */
class StarClosureSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ExtensionQueries.propagateLabels(edges.toDF("d1", "d2"), "spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The star path DIRECTLY (propagateLabels only reaches it past the
    * fast-round budget; correctness must not depend on which path ran).
    */
  private def starOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val pairs = edges.toDF("d1", "d2")
    val sym = pairs.union(pairs.select(col("d2"), col("d1"))).toDF("a", "b")
    ExtensionQueries.starClosure(sym, "spec-star")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Exact reference: union-find with component-min relabel. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  test("a chain far beyond the fast-round budget falls back to star and labels min") {
    // a 120-hop path: min-label propagation needs 120 rounds (the old
    // implementation THREW at its 50-round cap); the fallback star
    // alternation converges in a handful
    val path = (0L until 120L).map(i => (i, i + 1))
    val l = labelsOf(path)
    assert(l.size === 121)
    assert(l.values.forall(_ == 0L), "every path node labels the min")
    // descending orientation too (worst case for min-propagation)
    val rev = (0L until 120L).map(i => (i + 1, i))
    assert(labelsOf(rev) === l)
  }

  test("disjoint components keep their own min labels; singleton edge pairs work") {
    val edges = Seq((5L, 9L), (9L, 7L), // component min 5
      (20L, 21L), // component min 20
      (30L, 31L), (32L, 31L), (33L, 30L)) // component min 30
    val l = labelsOf(edges)
    assert(Seq(5L, 9L, 7L).forall(l(_) == 5L))
    assert(Seq(20L, 21L).forall(l(_) == 20L))
    assert(Seq(30L, 31L, 32L, 33L).forall(l(_) == 30L))
  }

  test("self-loops and duplicate edges are harmless") {
    val l = labelsOf(Seq((3L, 3L), (3L, 4L), (4L, 3L), (3L, 4L)))
    assert(l === Map(3L -> 3L, 4L -> 3L))
  }

  test("property: BOTH paths equal exact union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val genEdges = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    val prop = forAll(genEdges) { es =>
      val want = unionFind(es)
      labelsOf(es) == want && starOf(es) == want
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("star path direct: disjoint components, self-loop-only node labels itself") {
    val l = starOf(Seq((5L, 9L), (9L, 7L), (20L, 21L)))
    assert(Seq(5L, 9L, 7L).forall(l(_) == 5L) && l(20L) === 20L &&
      l(21L) === 20L)
    assert(starOf(Seq((8L, 8L), (1L, 2L))) === Map(8L -> 8L, 1L -> 1L, 2L -> 1L))
  }

  test("reliable checkpoint option: conf-directed rounds write real checkpoints, labels unchanged") {
    // round-17 verdict #4: localCheckpoint truncates lineage into
    // executor-local, unreplicated storage — fine at local[32], fatal
    // to an iteration on executor loss at cluster scale. With
    // spark.graft.checkpointDir set, Caches.iterCheckpoint routes every
    // iterative round through a RELIABLE checkpoint instead; rows must
    // be identical and checkpoint files must actually land in the dir.
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
    val base = labelsOf(edges)
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      assert(labelsOf(edges) === base, "reliable path changed the labels")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }
}
