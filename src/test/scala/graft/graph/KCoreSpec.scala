package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class KCoreSpec extends SparkSpec {

  private implicit def s: SparkSession = spark

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  private def coreMap(e: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Long] =
    KCore.run(e, k).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference peeling: sequential, obviously-correct fixpoint loop. */
  private def brute(pairs: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val canon = pairs.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    var adj = canon.flatMap(p => Seq(p, p.swap))
      .groupMap(_._1)(_._2).map { case (v, ns) => v -> ns.toSet }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (v, ns) if ns.size < k => v }.toSet
      changed = drop.nonEmpty
      adj = (adj -- drop).map { case (v, ns) => v -> (ns -- drop) }
        .filter(_._2.nonEmpty)
    }
    adj.map { case (v, ns) => v -> ns.size }
  }

  test("kcore: triangle with a pendant chain, k=2") {
    // Triangle 1-2-3 survives k=2; the chain 3-4-5 peels away entirely
    // (5 first, then 4 cascades below degree 2).
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(coreMap(e, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: K5 is its own 4-core; path graph has empty 2-core") {
    val k5 = edges((for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)): _*)
    assert(coreMap(k5, 4) == (1L to 5L).map(_ -> 4L).toMap)
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(coreMap(path, 2).isEmpty)
  }

  test("kcore: duplicate / reversed / self-loop edges are canonicalized") {
    val messy = edges((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(coreMap(messy, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: delta-round broadcast budget covers frontier + loss + removed buffer") {
    val max = KCore.BroadcastFrontierMax
    // The round's worst-case broadcast rows are k*frontier + removedBuf
    // (loss ids ≤ (k-1)*frontier surviving neighbors + removedBuf
    // uncompacted removed ids; see the object doc).
    assert(KCore.deltaBroadcastBudgetOk(1000L, 3, 0L))
    assert(KCore.deltaBroadcastBudgetOk(max / 3, 3, 0L))
    assert(!KCore.deltaBroadcastBudgetOk(max / 3 + 1, 3, 0L))
    // A large uncompacted removed buffer shrinks the frontier budget...
    assert(!KCore.deltaBroadcastBudgetOk(max / 3, 3, max / 2))
    assert(KCore.deltaBroadcastBudgetOk((max / 2) / 3, 3, max / 2))
    // ...and alone can exceed it (the round-19 ADVICE hazard).
    assert(!KCore.deltaBroadcastBudgetOk(0L, 3, max + 1))
    // k=1: frontier vertices have 0 surviving neighbors; budget is the
    // frontier itself plus the buffer. No overflow at any magnitude.
    assert(KCore.deltaBroadcastBudgetOk(max, 1, 0L))
    assert(!KCore.deltaBroadcastBudgetOk(Long.MaxValue, 1000000, 0L))
  }

  test("kcore: differential vs sequential peeling; core(k+1) within core(k)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val n = 80
    val pairs = (1 to 600).map { _ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
    }
    val e = pairs.toDF("src", "dst")
    var prevIds: Option[Set[Long]] = None
    for (k <- Seq(2, 4, 6, 8)) {
      val got = coreMap(e, k)
      val want = brute(pairs, k).map { case (v, d) => v -> d.toLong }
      assert(got == want, s"k=$k")
      prevIds.foreach(p => assert(got.keySet.subsetOf(p), s"k=$k not nested"))
      prevIds = Some(got.keySet)
    }
  }
}
