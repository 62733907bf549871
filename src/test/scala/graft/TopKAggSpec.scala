package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.{BottomK, Race, Scored, TopK}

/** The TopK aggregator's scale contract: state stays O(k) through
  * every reduce and merge (the x58 oracle proves end-to-end equality
  * with the window form; this pins the bounding itself).
  */
class TopKAggSpec extends AnyFunSuite {

  test("buffers never exceed k through reduce and merge") {
    val a = new TopK(3)
    var buf = a.zero
    for (i <- 1 to 100) {
      buf = a.reduce(buf, Scored(i.toLong, s"t$i"))
      assert(buf.size <= 3, s"buffer grew past k at insert $i")
    }
    assert(buf.map(_.score) === Seq(100L, 99L, 98L))
    val merged = a.merge(buf,
      Seq(Scored(200L, "x"), Scored(1L, "y"), Scored(50L, "z")))
    assert(merged.size === 3)
    assert(merged.head === Scored(200L, "x"))
  }

  test("equal scores break ties by item ascending (the window's order)") {
    val a = new TopK(3)
    val t = a.merge(Seq(Scored(5L, "b")), Seq(Scored(5L, "a"), Scored(5L, "c"), Scored(4L, "d")))
    assert(t === Seq(Scored(5L, "a"), Scored(5L, "b"), Scored(5L, "c")))
  }

  test("BottomK keeps the k smallest race keys, bounded through merge") {
    val a = new BottomK(3)
    var buf = a.zero
    for (i <- 1 to 100) {
      buf = a.reduce(buf, Race(i.toDouble, i.toLong, 1.0))
      assert(buf.size <= 3, s"buffer grew past k at insert $i")
    }
    assert(buf.map(_.key) === Seq(1.0, 2.0, 3.0))
    val merged = a.merge(buf, Seq(Race(0.5, 200L, 2.0), Race(99.0, 201L, 1.0)))
    assert(merged.map(_.id) === Seq(200L, 1L, 2L))
    // the carried weight survives selection untouched
    assert(merged.head.w === 2.0)
  }

  test("BottomK breaks key ties by id ascending (x68's oracle order)") {
    val a = new BottomK(2)
    val t = a.merge(Seq(Race(1.0, 7L, 1.0)),
      Seq(Race(1.0, 3L, 1.0), Race(1.0, 9L, 1.0)))
    assert(t.map(_.id) === Seq(3L, 7L))
  }

  test("BottomK equals full-sort-take-k for arbitrary inputs and partitionings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val raceGen = for {
      key <- Gen.chooseNum(-1e6, 1e6)
      id <- Gen.chooseNum(0L, 50L) // small id range forces key ties
    } yield Race(key, id, 1.0)
    val prop = Prop.forAll(Gen.listOf(raceGen), Gen.chooseNum(1, 5),
      Gen.chooseNum(1, 7)) { (rs, k, parts) =>
      val a = new BottomK(k)
      // fold through reduce in arbitrary partition groups, then merge
      val merged = rs.grouped(math.max(rs.size / parts, 1))
        .map(_.foldLeft(a.zero)(a.reduce)).foldLeft(a.zero)(a.merge)
      val expected = rs.sortBy(r => (r.key, r.id)).take(k)
      a.finish(merged) == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }
}
