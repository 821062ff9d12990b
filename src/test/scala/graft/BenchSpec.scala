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
}
