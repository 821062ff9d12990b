package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for Bench's measurement-integrity helpers (no Spark
  * session — these are pure functions over artifact text / maps).
  */
class BenchSpec extends AnyFunSuite {

  test("parseArtifact reads both raw and driver-wrapped artifact shapes") {
    val raw = """{"metric":"total","queries":{"q1":1.5,"g05":3.25},""" +
      """"min_queries":{"q1":1.25,"g05":3.0},"sf":"/d"}"""
    assert(Bench.parseArtifact(raw) == Map("q1" -> 1.25, "g05" -> 3.0))
    // Driver wrapper: quote-escaped tail, min_queries preferred.
    val wrapped = """{"n":12,"tail":"{\"queries\":{\"q1\":2.0},""" +
      """\"min_queries\":{\"q1\":1.75},\"sf\":\"/d\"}"}"""
    assert(Bench.parseArtifact(wrapped) == Map("q1" -> 1.75))
  }

  test("overCommittedNames flags >2x-of-committed-min with a 0.2s floor") {
    val prev = Map("g05" -> 3.0, "q_fast" -> 0.05, "q_ok" -> 1.0)
    val times = Map(
      "g05" -> 9.4, // the round-12 case: 3.1x committed min -> flagged
      "q_fast" -> 0.15, // 3x but under the absolute floor -> not flagged
      "q_ok" -> 1.9, // under 2x -> not flagged
      "q_new" -> 50.0) // no committed baseline -> never flagged
    assert(Bench.overCommittedNames(times, prev) == Seq("g05"))
    // Boundary: exactly 2x is NOT flagged (strict inequality).
    assert(Bench.overCommittedNames(Map("a" -> 2.0), Map("a" -> 1.0)).isEmpty)
  }

  test("committedBenchLastMins picks the newest UNCONTENDED committed bench_last") {
    // This repo always carries committed bench_last.json history
    // recorded against /root/testdata/sf0.1, and the suite runs from
    // the repo root with git available — so the current-code baseline
    // must resolve non-empty here. A different data dir must yield
    // empty (scale runs never compare against sf0.1 minima). No
    // assume-guards: a vacuous skip would leave both round-13
    // regressions unpinned (r03's stale 0.87s g08 flagging every
    // modern run over_committed; round 12's contended driver copy at
    // HEAD silently becoming the baseline with 3x-inflated minima).
    val mins = Bench.committedBenchLastMins("/root/testdata/sf0.1")
    assert(mins.nonEmpty, "expected a committed uncontended bench_last")
    assert(mins.contains("g05_edge_weights"))
    assert(mins.values.forall(_ > 0.0))
    // Cross-check against HEAD's copy read independently: when HEAD's
    // artifact is contended it must have been SKIPPED; when clean it
    // must be exactly what was chosen.
    val headText = scala.sys.process.Process(
      Seq("git", "show", "HEAD:bench_last.json")).!!
    val headMins = Bench.parseArtifact(headText)
    if (headText.contains("\"contended\":false")) assert(mins == headMins)
    else assert(mins != headMins, "contended HEAD artifact must be skipped")
    assert(Bench.committedBenchLastMins("/tmp/no_such_sf_dir").isEmpty)
  }
}
