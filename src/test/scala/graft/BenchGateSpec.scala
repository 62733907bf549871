package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench plausibility gate (round-5 verdict #1): steal-based
  * contention detection is blind to I/O and page-cache interference,
  * so implausible per-query times are caught against the pinned
  * per-query ledger instead. These cases replay round 5's actual
  * failure: x39 recorded 13.1 s in the artifact vs 0.39 s reproduced,
  * while every other query ran near its ledger value.
  */
class BenchGateSpec extends AnyFunSuite {

  private val ledger = Map(
    "q01" -> 0.40, "q02" -> 0.25, "q05" -> 2.50, "q15" -> 3.50,
    "x02" -> 2.20, "x39" -> 0.35, "x55" -> 1.90)

  test("a lone I/O-contention spike is flagged (the r5 x39 shape)") {
    val times = ledger.updated("x39", 13.10) // everything else on-trend
    assert(Bench.suspects(times, ledger) == Seq("x39"))
  }

  test("two simultaneous spikes are both flagged (r5 had x39 AND x55)") {
    val times = ledger.updated("x39", 13.10).updated("x55", 11.51)
    assert(Bench.suspects(times, ledger) == Seq("x39", "x55"))
  }

  test("a uniformly slower box flags nothing — the gate is trend-normalized") {
    // every query 4x the ledger (older CPU / cold page cache): each
    // raw ratio exceeds 3x, but no query breaks from the RUN'S trend
    val times = ledger.view.mapValues(_ * 4.0).toMap
    assert(Bench.suspects(times, ledger).isEmpty)
  }

  test("sub-half-second times are never suspect, whatever the ratio") {
    // a 0.02 s query ballooning to 0.4 s is 20x but still noise-scale
    val times = ledger + ("q99" -> 0.40)
    val led = ledger + ("q99" -> 0.02)
    assert(Bench.suspects(times, led).isEmpty)
  }

  test("queries absent from the ledger (new this round) are never suspect") {
    val times = ledger + ("x63" -> 30.0)
    assert(Bench.suspects(times, ledger).isEmpty)
  }

  test("an empty ledger disables the gate instead of throwing") {
    assert(Bench.suspects(ledger, Map.empty).isEmpty)
  }

  test("failed queries (negative time) are ignored by the gate") {
    val times = ledger.updated("x39", -13.10)
    assert(Bench.suspects(times, ledger).isEmpty)
  }

  test("loadLedger parses the flat JSON object Bench emits") {
    val f = java.nio.file.Files.createTempFile("ledger", ".json")
    java.nio.file.Files.writeString(f,
      """{"q01_pending_scan":0.45,"x39_json_roundtrip":0.31,"x55":1.96}""")
    val m = Bench.loadLedger(f.toString)
    assert(m == Map("q01_pending_scan" -> 0.45, "x39_json_roundtrip" -> 0.31,
      "x55" -> 1.96))
    assert(Bench.loadLedger("/nonexistent/ledger.json").isEmpty)
  }
}
