package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("range join: inclusive containment, bin-boundary points, no dup matches") {
    import spark.implicits._
    // bucketLen 10: interval [8, 22] spans bins 0..2; points at 8 and 22
    // (inclusive edges), 10 and 20 (bin boundaries), 7 and 23 (outside).
    val pts = Seq(("a", 7L, 1L), ("a", 8L, 2L), ("a", 10L, 3L),
      ("a", 20L, 4L), ("a", 22L, 5L), ("a", 23L, 6L), ("b", 10L, 7L))
      .toDF("k", "pt", "pid")
    val ivs = Seq(("a", 8L, 22L, 100L)).toDF("k", "s", "e", "iid")
    val got = RangeJoin.pointsInIntervals(pts, ivs, Seq("k"), "pt", "s", "e",
        bucketLen = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == Seq((2L, 100L), (3L, 100L), (4L, 100L), (5L, 100L)))
    assert(got.length == got.distinct.length) // single bin per point: no dups
  }

  test("range join: overlapping intervals each match (1:N), other keys don't") {
    import spark.implicits._
    val pts = Seq(("a", 15L, 1L)).toDF("k", "pt", "pid")
    val ivs = Seq(("a", 10L, 20L, 1L), ("a", 14L, 16L, 2L),
      ("a", 16L, 30L, 3L), ("b", 10L, 20L, 4L)).toDF("k", "s", "e", "iid")
    val got = RangeJoin.pointsInIntervals(pts, ivs, Seq("k"), "pt", "s", "e", 7L)
      .select("iid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("range join: differential vs the naive range predicate") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val pts = (1 to 400).map(i =>
      (s"k${rng.nextInt(5)}", rng.nextInt(10000).toLong, i.toLong))
      .toDF("k", "pt", "pid")
    val ivs = (1 to 120).map { i =>
      val s = rng.nextInt(9500).toLong
      (s"k${rng.nextInt(5)}", s, s + rng.nextInt(400).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
    val fast = RangeJoin.pointsInIntervals(pts, ivs, Seq("k"), "pt", "s", "e",
      bucketLen = 300L).select("k", "pid", "iid")
    val naive = pts.join(ivs, Seq("k"))
      .filter(col("s") <= col("pt") && col("pt") <= col("e"))
      .select("k", "pid", "iid")
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("range join: pathological fan-out rejected loudly") {
    import spark.implicits._
    val pts = Seq(("a", 5L, 1L)).toDF("k", "pt", "pid")
    val ivs = Seq(("a", 0L, 100000L, 1L)).toDF("k", "s", "e", "iid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointsInIntervals(pts, ivs, Seq("k"), "pt", "s", "e",
        bucketLen = 10L, maxFanout = 100L)
    }
    assert(e.getMessage.contains("fan-out"))
  }
}
