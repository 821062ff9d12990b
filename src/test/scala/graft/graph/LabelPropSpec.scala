package graft.graph

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {

  test("LPA separates two cliques joined by a bridge; isolated keeps own label") {
    import spark.implicits._
    implicit val s = spark
    // K3 {1,2,3} — bridge 3-4 — K3 {4,5,6}; 7 isolated. Hand-traced
    // through 3 synchronous rounds with the (count DESC, label ASC)
    // winner rule: the cliques converge to labels 1 and 3 and the
    // bridge does NOT merge them (connected components would).
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val v = (1L to 7L).toDF("id")
    val got = LabelProp.run(v, e, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L, 7L -> 7L))
  }

  test("LPA is deterministic across runs and partitionings") {
    import spark.implicits._
    implicit val s = spark
    val rng = new scala.util.Random(5)
    val e = (1 to 300).map { _ =>
      val a = rng.nextInt(40).toLong; val b = rng.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("src", "dst")
    val v = (0L until 40L).toDF("id")
    val a = LabelProp.run(v, e, 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = LabelProp.run(v.repartition(7), e.repartition(5), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }
}
