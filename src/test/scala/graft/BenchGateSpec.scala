package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression gate (Bench.flagRegressions /
  * Bench.readBaseline). The round-8 incident is the regression test:
  * q_leakage_split's best slipped 1.57 s → 4.01 s on unchanged code,
  * but its three measured runs spanned 17.2/12.1/4.2 s (external
  * machine load) and the 13 s spread swallowed the flag. The fix is
  * the isolated re-time pass: its tight spread REPLACES the
  * contaminated suite spread in the gate.
  */
class BenchGateSpec extends AnyFunSuite {
  import Bench.{GateEntry, flagRegressions, readBaseline}

  private val prev = Map("q_leakage_split" -> 1.57, "q_minhash_est" -> 0.78)

  test("round-8 masked slip: 13s suite spread + tight iso spread → flagged") {
    val e = GateEntry("q_leakage_split", best = 4.01, spread = 13.0,
      isoSpread = Some(0.12), sf2Best = None)
    assert(flagRegressions(Seq(e), prev, Map.empty) ===
      Seq(("q_leakage_split", 4.01, 1.57, "sf")))
  }

  test("without isolation the same slip is (documentedly) blind") {
    // This is the pre-fix behavior: the gate alone cannot distinguish
    // a real 2.5x slip from a 13 s contention band. retimeSuspects
    // exists precisely because this must stay un-flaggable from the
    // suite numbers alone.
    val e = GateEntry("q_leakage_split", best = 4.01, spread = 13.0,
      isoSpread = None, sf2Best = None)
    assert(flagRegressions(Seq(e), prev, Map.empty).isEmpty)
  }

  test("noise within the band is not flagged") {
    val e = GateEntry("q_leakage_split", best = 1.70, spread = 0.2,
      isoSpread = None, sf2Best = None)
    assert(flagRegressions(Seq(e), prev, Map.empty).isEmpty)
  }

  test("under 30% growth is not flagged even beyond the spread floor") {
    val e = GateEntry("q_minhash_est", best = 1.05, spread = 0.01,
      isoSpread = None, sf2Best = None)
    // 1.05 > 0.78 + 0.25 but 1.05 > 0.78 * 1.3 = 1.014 — flagged;
    // and a +0.2 s delta stays under the 250 ms floor regardless of %
    assert(flagRegressions(Seq(e), prev, Map.empty).nonEmpty)
    val noise = GateEntry("q_minhash_est", best = 0.98, spread = 0.01,
      isoSpread = None, sf2Best = None)
    // 0.98 < 0.78 + 0.25: sub-floor scheduler noise never flags
    assert(flagRegressions(Seq(noise), prev, Map.empty).isEmpty)
  }

  test("sf2 drift catches what main-SF interference masks") {
    // main-SF spread too wide to flag, no iso runs recorded — but the
    // short sf0.01 pass stayed clean and shows a real 2x drift.
    val e = GateEntry("q_leakage_split", best = 4.01, spread = 13.0,
      isoSpread = None, sf2Best = Some(0.9))
    val out = flagRegressions(Seq(e), prev, Map("q_leakage_split" -> 0.4))
    // the sf2-fired flag reports the sf2 numbers, labeled as such
    assert(out === Seq(("q_leakage_split", 0.9, 0.4, "sf2")))
  }

  test("sf2 drift floor: +0.25s and 1.5x both required") {
    val e = GateEntry("q", best = 1.0, spread = 0.1, isoSpread = None,
      sf2Best = Some(0.44))
    // 0.44 > 0.3*1.5=0.45 is false → no flag
    assert(flagRegressions(Seq(e), Map.empty, Map("q" -> 0.3)).isEmpty)
    // 0.5 clears 1.5x but NOT the 250 ms floor (0.5 < 0.3+0.25):
    // the 0.1-0.4 s sf2 band is fixed-overhead noise, not plan cost
    val e2 = e.copy(sf2Best = Some(0.5))
    assert(flagRegressions(Seq(e2), Map.empty, Map("q" -> 0.3)).isEmpty)
    val e3 = e.copy(sf2Best = Some(0.6))
    assert(flagRegressions(Seq(e3), Map.empty, Map("q" -> 0.3)).nonEmpty)
  }

  test("failed queries (best = -1) never flag") {
    val e = GateEntry("q_leakage_split", best = -1.0, spread = 0.0,
      isoSpread = None, sf2Best = None)
    assert(flagRegressions(Seq(e), prev, Map.empty).isEmpty)
  }

  test("readBaseline: canonical shape with sf2") {
    val (best, sf2) = readBaseline(
      """{"n":9,"queries":{"a":1.5,"b":2},"sf2":{"a":0.3}}""")
    assert(best === Map("a" -> 1.5, "b" -> 2.0))
    assert(sf2 === Map("a" -> 0.3))
  }

  test("readBaseline: legacy driver snapshot (queries under parsed)") {
    // the round-8 gate compared against an EMPTY map because only the
    // top-level key was tried on this shape
    val (best, sf2) = readBaseline(
      """{"n":7,"rc":0,"parsed":{"metric":"total","queries":{"a":1.57}}}""")
    assert(best === Map("a" -> 1.57))
    assert(sf2.isEmpty)
  }

  test("readBaseline: garbage is fail-soft") {
    assert(readBaseline("not json{{{") === (Map.empty, Map.empty))
    assert(readBaseline("""{"queries":[1,2]}""") === (Map.empty, Map.empty))
  }

  test("readSkipped: rotation file parse and fail-soft") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gate")
    val p = dir.resolve("skipped.json")
    java.nio.file.Files.writeString(p, """["q_a","q_b"]""" + "\n")
    assert(Bench.readSkipped(p) === Set("q_a", "q_b"))
    assert(Bench.readSkipped(dir.resolve("absent.json")) === Set.empty)
    java.nio.file.Files.writeString(p, "[]\n")
    assert(Bench.readSkipped(p) === Set.empty)
  }
}
