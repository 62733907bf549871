package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.{Scored, TopK}

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
}
