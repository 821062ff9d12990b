package graft.tools

import graft.SparkSpec
import graft.config.HgnConfig

/** Pins the detector-comparison tool (VERDICT round 12 #7) on the
  * reference's Quakers dataset: table shape, cross-detector
  * consistency, the singleton baseline's sign, and the artifact's
  * best-Q-first ordering.
  */
class DetectorEvalSpec extends SparkSpec {

  test("detector eval on Quakers: consistent table, sane baselines, sorted JSON") {
    implicit val s = spark
    val conf = HgnConfig.fromFile("confs/quakers.yml")
      .copy(saveCommunities = false)
    val rows = DetectorEval.run(conf, lpaIters = 3)
    val byTag = rows.map(r => r.labeling -> r).toMap
    assert(rows.map(_.labeling).toSet == Set("hgn", "cc", "lpa", "singleton"))
    // Every detector is scored against the SAME original edge set.
    assert(rows.map(_.m).distinct == Seq(174L),
      s"m drifted: ${rows.map(r => r.labeling -> r.m)}")
    // Intra-community edges can never exceed m; CC counts ALL edges
    // intra (components are closed under edges).
    assert(rows.forall(r => r.e_intra_total >= 0 && r.e_intra_total <= r.m))
    assert(byTag("cc").e_intra_total == 174L)
    // Singleton partition: no intra edges, Q strictly negative on a
    // non-empty edge set; the deletion-loop communities must beat it.
    assert(byTag("singleton").e_intra_total == 0L)
    assert(byTag("singleton").q_micro < 0L)
    assert(byTag("hgn").q_micro > byTag("singleton").q_micro)
    // The artifact emits detectors best-Q-first.
    val json = DetectorEval.toJson("confs/quakers.yml", 3, rows)
    val qs = """"q_micro":(-?\d+)""".r.findAllMatchIn(json)
      .map(_.group(1).toLong).toSeq
    assert(qs == qs.sorted.reverse, json)
    assert(json.startsWith("""{"graph":"confs/quakers.yml","lpa_iters":3,"""))
  }
}
