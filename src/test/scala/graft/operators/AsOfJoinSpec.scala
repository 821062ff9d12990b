package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def df(rows: (String, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("k", "ts", "v")
  }

  test("as-of: most recent at-or-before match per key, inclusive ties") {
    val left = df(("a", 10L, 1.0), ("a", 20L, 2.0), ("b", 5L, 3.0))
    val right = df(("a", 10L, 100.0), ("a", 15L, 150.0), ("b", 9L, 900.0))
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("ts", "v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble))).toMap
    assert(got(("a", 10L)) == ((Some(10L), Some(100.0)))) // equal ts matches
    assert(got(("a", 20L)) == ((Some(15L), Some(150.0)))) // latest prior
    assert(got(("b", 5L)) == ((None, None))) // right row is in the future
  }

  test("as-of: carried columns always come from the same right row") {
    import spark.implicits._
    val left = df(("a", 30L, 0.0))
    // The LATEST right row has a null v: per-column carry would mix
    // ts=20's null-v with ts=10's v — same-row carry must emit (20, null).
    val right = Seq(("a", 10L, Some(5.0)), ("a", 20L, Option.empty[Double]))
      .toDF("k", "ts", "v")
    val r = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("ts", "v")).head()
    assert(r.getAs[java.lang.Long]("asof_ts") == 20L)
    assert(r.getAs[java.lang.Double]("asof_v") == null)
  }

  test("as-of: duplicate right (key, ts) rows are rejected loudly") {
    val left = df(("a", 10L, 1.0))
    val right = df(("a", 5L, 1.0), ("a", 5L, 2.0))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
    }
    assert(e.getMessage.contains("duplicate"))
    // assumeUniqueRight skips the check (caller's contract then).
    AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"),
      assumeUniqueRight = true).collect()
  }

  test("as-of: differential vs the naive range-join formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (s"k${rng.nextInt(7)}", rng.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "ts", "v")
    val right = (1 to 200).map(i =>
      (s"k${rng.nextInt(7)}", i * 5L, i * 1.0)) // unique ts per key by construction
      .toDF("k", "ts", "v").dropDuplicates("k", "ts")
    val fast = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("ts", "v"))
      .select(col("k"), col("ts"), col("v"), col("asof_ts"), col("asof_v"))
    // Reference: range join + max-ts pick (the O(pairs) formulation the
    // operator exists to avoid).
    val pairs = left.as("l").join(right.as("r"),
      col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left")
    val best = pairs.groupBy(col("l.k").as("k"), col("l.ts").as("ts"),
        col("l.v").as("v"))
      .agg(max(struct(col("r.ts"), col("r.v"))).as("m"))
      .select(col("k"), col("ts"), col("v"),
        col("m.ts").as("asof_ts"), col("m.v").as("asof_v"))
    assert(fast.except(best).isEmpty && best.except(fast).isEmpty)
  }
}
