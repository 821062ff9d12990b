package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed cases for the curation operators. */
class CurationSpec extends SparkSpec {

  test("contamination: overlap fraction against the benchmark shingle set") {
    import spark.implicits._
    // 2-shingles: doc 1 = {a b, b c}; doc 2 = {x y}; benchmark = {b c, c d}.
    val docs = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    val bench = Seq((100L, "b c d")).toDF("doc_id", "text")
    val got = Curation.contaminationScores(docs, bench, 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("contamination"))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((1L, 0L, 0.0))) // zero-overlap docs still reported
  }

  test("sequence packing: start-offset bins per shard") {
    import spark.implicits._
    // Shard s1 in doc_id order: 3, 4, 2 tokens; budget 5 →
    // offsets 0, 3, 7 → bins 0, 0, 1. Shard s2 independent: offset 0.
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "d e f g", "s1"), (3L, "h i", "s1"),
      (4L, "z z z z z z", "s2")).toDF("doc_id", "text", "source")
    val got = Curation.packSequences(docs, budget = 5L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("shard"), r.getAs[Long]("start_offset"),
          r.getAs[Long]("bin"))).toMap
    assert(got(1L) == (("s1", 0L, 0L)))
    assert(got(2L) == (("s1", 3L, 0L)))
    assert(got(3L) == (("s1", 7L, 1L)))
    assert(got(4L) == (("s2", 0L, 0L)))
    // Every token is in exactly one bin: totals preserved.
    val packed = Curation.packSequences(docs, 5L)
    assert(packed.agg(sum("n_tokens")).collect()(0).getLong(0) == 15L)
  }

  test("sequence packing: two-phase prefix-sum distributes a single shard") {
    import spark.implicits._
    val n = 400
    val docs = (1 to n).map(i =>
      (i.toLong, ("w " * (i % 7 + 1)).trim, "only")).toDF("doc_id", "text", "source")

    // Any monotone sub-shard split yields bit-identical offsets: the
    // numSubShards=1 run IS the old single-window formulation.
    val reference = Curation.packSequences(docs, 16L, numSubShards = 1)
    val twoPhase = Curation.packSequences(docs, 16L, numSubShards = 8)
    assert(twoPhase.except(reference).isEmpty && reference.except(twoPhase).isEmpty)

    // The single-task-per-shard bottleneck is gone — asserted on the
    // EXECUTED PLAN, not on runtime task metrics (ADVICE round 6: the
    // SparkListener formulation depended on async metric delivery and a
    // 10 s poll — flaky on a loaded VM). The deterministic property is
    // the partitioning of the running-sum window's exchange: the cumsum
    // window partitions by (shard, sub), so a shard's rows hash across
    // the numSubShards groups instead of funnelling through one
    // partition. (Whether AQE later coalesces tiny 400-row sub-shards is
    // a size policy, not this plan property.)
    twoPhase.collect()
    val plan = twoPhase.queryExecution.executedPlan.toString
    val winPart = """hashpartitioning\(shard#\d+,\s*sub#\d+""".r
    assert(winPart.findFirstIn(plan).isDefined,
      s"running-sum window does not partition by (shard, sub):\n$plan")
  }

  test("sequence packing: extreme doc_id spans don't overflow under ANSI") {
    import spark.implicits._
    // Span (hi - lo) exceeds Long range: long-space subtraction would
    // throw ARITHMETIC_OVERFLOW; the double-space range split must not.
    val docs = Seq(
      (Long.MinValue / 2, "a b c", "s"),
      (Long.MaxValue / 2, "d e", "s")).toDF("doc_id", "text", "source")
    val got = Curation.packSequences(docs, budget = 4L, numSubShards = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("start_offset"), r.getAs[Long]("bin"))).toMap
    assert(got(Long.MinValue / 2) == ((0L, 0L)))
    assert(got(Long.MaxValue / 2) == ((3L, 0L)))
  }

  test("importance weights: exact integer ratios, above-global-cut select") {
    import spark.implicits._
    // Two words in distinct hash buckets (guarded below): "ml" is
    // target-heavy, "web" raw-only.
    assert(Hashing.h60("ml") % 1024 != Hashing.h60("web") % 1024)
    val docs = Seq(
      (1L, "ml ml"), (2L, "web web"), (3L, "ml web")).toDF("doc_id", "text")
    val got = Curation.importanceWeights(docs, col("doc_id") === 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("score_micro"),
          r.getAs[Long]("per_tok_micro"), r.getAs[Boolean]("selected"))).toMap
    // ml bucket: tgt 2, raw 1 → w = 3e6 div 2 = 1_500_000.
    // web bucket: tgt 0, raw 3 → w = 1e6 div 4 = 250_000.
    // global cut = (1e6 * 3) div 5 = 600_000.
    assert(got(1L) == ((2L, 3000000L, 1500000L, true)))
    assert(got(2L) == ((2L, 500000L, 250000L, false)))
    assert(got(3L) == ((2L, 1750000L, 875000L, true)))
  }
}
