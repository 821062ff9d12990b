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
    // Deterministic FIXTURE repo (round-13 ADVICE: the live-checkout
    // formulation asserted repo state, not code — it failed on shallow
    // clones, worktrees, or histories whose last 10 artifacts are all
    // contended). Two commits: a clean artifact, then a newer CONTENDED
    // one — the helper must skip the contended HEAD and return the
    // older clean minima.
    val repo = java.nio.file.Files.createTempDirectory("benchspec-git").toFile
    def sh(cmd: String*): Unit =
      assert(scala.sys.process.Process(cmd, repo).!(
        scala.sys.process.ProcessLogger(_ => ())) == 0, cmd.mkString(" "))
    def commit(text: String, msg: String): Unit = {
      java.nio.file.Files.writeString(
        new java.io.File(repo, "bench_last.json").toPath, text)
      sh("git", "add", "-A"); sh("git", "commit", "-qm", msg)
    }
    sh("git", "init", "-q")
    sh("git", "config", "user.email", "t@test")
    sh("git", "config", "user.name", "t")
    val sfKey = Bench.normSfDir("/root/testdata/sf0.1")
    commit(s"""{"queries":{"g05_edge_weights":2.0},"min_queries":""" +
      s"""{"g05_edge_weights":1.5},"contended":false,"sf":"$sfKey"}""", "clean")
    commit(s"""{"queries":{"g05_edge_weights":9.4},"min_queries":""" +
      s"""{"g05_edge_weights":9.0},"contended":true,"sf":"$sfKey"}""", "contended")
    // Trailing-slash spelling of the same dir must still match (the
    // normalization half of the same ADVICE round).
    val mins = Bench.committedBenchLastMins("/root/testdata/sf0.1/",
      repo.toString)
    assert(mins == Map("g05_edge_weights" -> 1.5),
      s"expected the older CLEAN artifact's minima, got $mins")
    // A different data dir yields empty — scale runs never compare
    // against sf0.1 minima.
    assert(Bench.committedBenchLastMins("/tmp/no_such_sf_dir",
      repo.toString).isEmpty)
    // Best-effort secondary on the real checkout: when resolvable, the
    // chosen artifact is positive-valued and uncontended by contract.
    val real = Bench.committedBenchLastMins("/root/testdata/sf0.1")
    assert(real.values.forall(_ > 0.0))
  }
}
