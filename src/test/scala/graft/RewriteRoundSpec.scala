package graft

import org.scalatest.funsuite.AnyFunSuite

class RewriteRoundSpec extends AnyFunSuite {

  test("rewrites simple and nested round calls, leaves words alone") {
    assert(SparkEntry.rewriteRound("SELECT round(x, 2) FROM t") ===
      "SELECT (floor((x) * 100 + 0.5) / 100) FROM t")
    assert(SparkEntry.rewriteRound("round(sum(a * (1 - b)), 6)") ===
      "(floor((sum(a * (1 - b))) * 1000000 + 0.5) / 1000000)")
    // nested round
    assert(SparkEntry.rewriteRound("round(round(x, 4) + y, 2)") ===
      "(floor(((floor((x) * 10000 + 0.5) / 10000) + y) * 100 + 0.5) / 100)")
    // not a round call
    assert(SparkEntry.rewriteRound("workaround(x, 2)") === "workaround(x, 2)")
  }

  test("every oracle SQL is free of native round() after rewrite") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.toLowerCase.matches("(?s).*(?<![a-z0-9_])round\\(.*"),
        s"$name still contains native round()")
    }
  }

  test("floor-rounding is a pure function of the binary double at the " +
    "observed boundary value") {
    // The sf0.001 x08 flake: repr is "0.5186875" but the binary value is
    // just below the half — Spark's native round HALF_UPs the repr
    // (0.518688) while DuckDB rounds the binary (0.518687). The shared
    // floor formula gives the binary answer deterministically.
    val x = 0.4 * 0.16 + 0.3 * 1.0 + 0.3 * (4.125 / 8.0)
    assert(x.toString === "0.5186875")
    assert(x * 1e6 < 518687.5) // binary value sits below the half
    assert(math.floor(x * 1e6 + 0.5) / 1e6 === 0.518687)
  }
}
