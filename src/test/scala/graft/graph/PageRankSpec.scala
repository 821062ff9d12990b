package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  private implicit def s: org.apache.spark.sql.SparkSession = spark

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  test("cycle graph is uniform and conserves mass up to floor deficit") {
    // 4-cycle: perfect symmetry => every vertex keeps exactly 1/4.
    val pr = PageRank.run(edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),
      iters = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.size == 4)
    assert(pr.values.toSet.size == 1) // uniform
    val expected = 1000000000000L / 4
    // Uniform start is the fixed point; deficit only from per-round
    // integer floors: |pr - scale/4| <= iters ulp-ish slack.
    assert(math.abs(pr(1L) - expected) <= 16)
  }

  test("star center outranks leaves; ranking is deterministic") {
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val a = PageRank.run(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.run(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b) // bit-identical across runs (integer math)
    assert(a(1L) > a(2L))
    assert(Set(2L, 3L, 4L, 5L).map(a).size == 1) // leaves symmetric
  }

  test("weighted with uniform weights reduces exactly to unweighted") {
    import spark.implicits._
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    val unweighted = PageRank.run(edges(es: _*), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (w <- Seq(1L, 7L)) {
      val weighted = PageRank.runWeighted(
        es.map { case (a, b) => (a, b, w) }.toDF("src", "dst", "w"),
        iters = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(weighted == unweighted, s"uniform w=$w diverged")
    }
  }

  test("weight skew shifts mass toward the heavy edge") {
    import spark.implicits._
    // 2 and 3 are symmetric around 1 except edge weight: 1-2 heavy.
    val e = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val pr = PageRank.runWeighted(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(2L) > pr(3L))
  }

  test("fixed-point iterate tracks the real-valued iterate") {
    // Random-ish small graph; compare against a driver-side double
    // implementation of the same 3 iterations. The integer contraction
    // floors each contribution, so pr_fp <= ceil(real) and the gap is
    // bounded by iters * maxdeg ulps — assert agreement to 1e-6 relative.
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L),
      (2L, 6L), (6L, 7L), (7L, 1L))
    val got = PageRank.run(edges(es: _*), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val sym = es ++ es.map { case (a, b) => (b, a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    var pr = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val contrib = sym.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => 0.85 * pr(u) / deg(u) }.sum).toMap
      pr = pr.keys.map(v => v -> (0.15 / n + contrib(v))).toMap
    }
    for ((v, fp) <- got)
      assert(math.abs(fp / 1e12 - pr(v)) < 1e-6,
        s"vertex $v: fp=${fp / 1e12} real=${pr(v)}")
  }
}
