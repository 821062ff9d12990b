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

  test("weighted sample: k per group, weight-proportional, loud on bad weight") {
    import spark.implicits._
    // 200 groups, each with one heavy (w=10000) and one light (w=1) doc.
    // A-ES: P[heavy wins a group] = 10000/10001; the hash-derived race
    // is deterministic, so assert the aggregate skew, not exact picks.
    val docs = (0 until 200).flatMap { g =>
      Seq((g.toLong * 2, s"g$g", 10000L), (g.toLong * 2 + 1, s"g$g", 1L))
    }.toDF("doc_id", "source", "n_chars")
    val won = Curation.weightedSample(docs, k = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(won.length == 200) // exactly k=1 winners per group
    assert(won.forall(_._3 == 1L))
    val heavyWins = won.count(_._2 % 2 == 0)
    assert(heavyWins >= 190, s"heavy docs won only $heavyWins/200")
    // Determinism: a second run picks the identical sample.
    val again = Curation.weightedSample(docs, k = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(won.sorted.toSeq == again.sorted.toSeq)
    // k larger than the group: every doc sampled, ranks 1..n.
    val all = Curation.weightedSample(docs, k = 5)
    assert(all.count() == 400L)
    // Non-positive weight fails loudly instead of silently dropping.
    val bad = Seq((1L, "g", 0L)).toDF("doc_id", "source", "n_chars")
    val e = intercept[Exception] {
      Curation.weightedSample(bad, k = 1).collect()
    }
    assert(e.getMessage.contains("non-positive"))
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

  test("bloom contamination: no false negatives vs the exact semi-join") {
    // The contract that makes the bloom path SAFE to substitute for p19
    // at scale: every exact hit is a bloom positive (over-flag only),
    // checked per-doc on real table data with the p19 corpus/bench split.
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val exact = Curation.contaminationScores(corpus, bench, 3)
      .select(col("doc_id"), col("n_sh"), col("n_hits"))
    val bloom = Curation.bloomContamination(corpus, bench, 3)
      .select(col("doc_id"), col("n_sh").as("b_n_sh"), col("n_maybe"))
    val joined = exact.join(bloom, Seq("doc_id")).collect()
    assert(joined.length == exact.count())
    joined.foreach { r =>
      assert(r.getAs[Long]("n_sh") == r.getAs[Long]("b_n_sh"))
      assert(r.getAs[Long]("n_maybe") >= r.getAs[Long]("n_hits"),
        s"false negative at doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("bloom contamination: planted duplicate fully flags, disjoint doc clean") {
    import spark.implicits._
    // doc 1 IS the benchmark text → every shingle a bloom positive; doc 2
    // is disjoint — with only 2 benchmark shingles (≤6 of 64512 bits set)
    // the deterministic probes land clean, so n_maybe is exactly 0.
    val corpus = Seq((1L, "a b c d"), (2L, "p q r s")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val got = Curation.bloomContamination(corpus, bench, 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_maybe"))).toMap
    assert(got(1L) == ((2L, 2L)))
    assert(got(2L) == ((2L, 0L)))
  }

  test("mixture equalization: integer rates, hash-deterministic keeps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b")).toDF("doc_id", "source")
      .withColumn("text", lit("x"))
    val got = Curation.equalizeMixture(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_source"), r.getAs[Long]("rate_micro"),
          r.getAs[Boolean]("kept"))).toMap
    // min source size 2: a → rate 2e6 div 4 = 500000; b → 1e6 (keep all).
    (1L to 4L).foreach { id =>
      val expect = Hashing.h60(s"mix:$id") % 1000000L < 500000L
      assert(got(id) == ((4L, 500000L, expect)))
    }
    (5L to 6L).foreach(id => assert(got(id) == ((2L, 1000000L, true))))
  }

  test("temperature mixture: sqrt-law rates, boost capped, gentler than equalization") {
    import spark.implicits._
    // Sources sized 4 and 1: sqrt masses 2000:1000 (milli), shares
    // 2/3:1/3 over N=5. Small source's boosted share (5/3 docs vs 1)
    // caps at rate 1e6; big source keeps (1e6·2000·5) div (3000·4) =
    // 833333 — GENTLER than equalization's (1e6·1) div 4 = 250000.
    val docs = (1L to 4L).map((_, "a")).:+((5L, "b"))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val got = Curation.temperatureMixture(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_source"), r.getAs[Long]("rate_micro"),
          r.getAs[Boolean]("kept")))).toMap
    (1L to 4L).foreach { id =>
      val expect = Hashing.h60(s"tmix:$id") % 1000000L < 833333L
      assert(got(id) == ((4L, 833333L, expect)))
    }
    assert(got(5L) == ((1L, 1000000L, true)))
    val eq = Curation.equalizeMixture(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rate_micro")).toMap
    assert(eq(1L) == 250000L && got(1L)._2 > eq(1L),
      "T=1/2 must down-weight the big source less than equalization")
  }

  test("temperature mixture: rate arithmetic survives billion-doc sources") {
    import spark.implicits._
    // The round-13 int64 formulation overflowed once 10^6·s_milli·n_total
    // passed 2^63 (~5.4M docs): here the numerator is ~4.6·10^23, so the
    // decimal(38,0) path must both not throw under ANSI and match the
    // exact BigInt rate.
    val counts = Seq(("big", 6000000000L), ("small", 1000000L))
    val got = Curation.temperatureRates(counts.toDF("source", "n_source"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("s_milli"), r.getAs[Long]("rate_micro"))).toMap
    val sMilli = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble * 1e6)).toLong }.toMap
    val sumS = BigInt(sMilli.values.sum)
    val nTotal = BigInt(counts.map(_._2).sum)
    counts.foreach { case (s, n) =>
      val exact = (BigInt(1000000) * sMilli(s) * nTotal) / (sumS * BigInt(n))
      val expect = exact.min(BigInt(1000000)).toLong
      assert(got(s) == ((sMilli(s), expect)), s"source $s")
    }
    // sanity: the big source is down-weighted, the small one boosted-to-cap
    assert(got("big")._2 < 1000000L && got("small")._2 == 1000000L)
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

  test("source top-k: keeps the k best per source, deterministic ties") {
    import spark.implicits._
    // Same strictly-ordered corpus as the ccnet-buckets test: within
    // source A quality order is doc 1 > 2 > 3 > 4 > 5 > 6.
    val docs = Seq(
      (1L, "common common common common", "A"),
      (2L, "common common common rare1", "A"),
      (3L, "common common rare1 rare2", "A"),
      (4L, "common rare1 rare2 rare3", "A"),
      (5L, "rare1 rare2 rare3 rare4", "A"),
      (6L, "rare2 rare3 rare4 rare5", "A"),
      (11L, "common common common common", "B"),
      (12L, "common common rare4 rare5", "B"),
      (13L, "rare1 rare2 rare5 rare3", "B")).toDF("doc_id", "text", "source")
    val got = Curation.sourceTopK(docs, k = 2, minCount = 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("doc_id")).toMap
    assert(got.size == 4) // 2 per source, nothing else survives
    assert(got(("A", 1L)) == 1L && got(("A", 2L)) == 2L)
    assert(got(("B", 1L)) == 11L && got(("B", 2L)) == 12L)
    // tie at the cut: a duplicate of doc 2's text takes rank by doc_id
    val dup = docs.union(Seq((0L, "common common common rare1", "A"))
      .toDF("doc_id", "text", "source"))
    val got2 = Curation.sourceTopK(dup, k = 2, minCount = 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("doc_id")).toMap
    assert(got2(("A", 2L)) == 0L) // the lower doc_id wins the tied slot
  }

  test("source top-k: custom score column ranks instead of the LM score") {
    import spark.implicits._
    // Cap by document LENGTH (a recency/length/external-score stand-in):
    // within each source the longest docs win, regardless of what the
    // unigram-LM ranking would have said.
    val docs = Seq(
      (1L, "short", "A"), (2L, "a bit longer text", "A"),
      (3L, "the longest document text of source a", "A"),
      (11L, "tiny", "B"), (12L, "b side much longer document", "B"))
      .toDF("doc_id", "text", "source")
    val got = Curation.sourceTopK(docs, k = 1,
        scoreCol = Some(length(col("text")))).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"))).toMap
    assert(got("A") == ((3L, 37L)))
    assert(got("B") == ((12L, 27L)))
  }

  test("contamination spans: planted leak located, split leaks split, clean doc zero") {
    import spark.implicits._
    val bench = Seq((100L, "b1 b2 b3 b4")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x y b1 b2 b3 b4 z w q"),          // one mid-doc leak
      (2L, "clean words only here nothing"),   // clean
      (3L, "b1 b2 b3 b4"),                     // whole doc = benchmark
      (4L, "b1 b2 b3 m n o p q b2 b3 b4"))     // two separated leaks
      .toDF("doc_id", "text")
    val got = Curation.contaminationSpans(corpus, bench, spanL = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_contam_spans"),
          r.getAs[Long]("contam_words"), r.getAs[Double]("contam_frac"))))
      .toMap
    assert(got(1L) == ((9L, 1L, 4L, 4.0 / 9)))   // span 3..6 exactly
    assert(got(2L) == ((5L, 0L, 0L, 0.0)))
    assert(got(3L) == ((4L, 1L, 4L, 1.0)))
    assert(got(4L) == ((11L, 2L, 6L, 6.0 / 11))) // 1..3 and 9..11
  }

  test("shuffle shards: permutation, contiguous per-shard ranks, deterministic") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val got = Curation.shuffleShards(docs, numShards = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("shard_pos")))
    assert(got.length == 100)
    assert(got.map(_._1).toSet == (0L until 100L).toSet) // every doc once
    assert(got.forall(t => t._2 >= 0 && t._2 < 4))
    // ranks within each shard are exactly 1..size(shard)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard ranks not contiguous")
    }
    // hash balance: no shard takes more than half the corpus
    assert(got.groupBy(_._2).values.map(_.length).max < 50)
    // id-keyed determinism: a permuted input yields the identical layout
    val again = Curation.shuffleShards(
        docs.orderBy(rand(7)), numShards = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("shard_pos"))).sorted
    assert(again.toSeq == got.sorted.toSeq)
  }

  test("ccnet buckets: per-source thirds, ties to the better bucket") {
    import spark.implicits._
    // Source A: 6 docs built from words with frequencies chosen so the
    // per-token LM score strictly orders doc quality: 'common' appears
    // many times, 'rare*' words twice each (>= minCount), so docs with
    // more 'common' score higher. Source B: 3 docs, one per bucket.
    val a = Seq(
      (1L, "common common common common", "A"),
      (2L, "common common common rare1", "A"),
      (3L, "common common rare1 rare2", "A"),
      (4L, "common rare1 rare2 rare3", "A"),
      (5L, "rare1 rare2 rare3 rare4", "A"),
      (6L, "rare2 rare3 rare4 rare5", "A"))
    val b = Seq(
      (11L, "common common common common", "B"),
      (12L, "common common rare4 rare5", "B"),
      (13L, "rare1 rare2 rare5 rare3", "B"))
    val docs = (a ++ b).toDF("doc_id", "text", "source")
    val got = Curation.ccnetBuckets(docs, minCount = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    // A (n=6): k_head=2, k_mid=4 -> head={1,2}, middle={3,4}, tail={5,6}
    assert(got(1L) == "head"); assert(got(2L) == "head")
    assert(got(3L) == "middle"); assert(got(4L) == "middle")
    assert(got(5L) == "tail"); assert(got(6L) == "tail")
    // B (n=3): k_head=1, k_mid=2 -> one doc per bucket
    assert(got(11L) == "head"); assert(got(12L) == "middle")
    assert(got(13L) == "tail")
    // score ties: duplicate of doc 1's text joins it in head
    val dup = docs.union(Seq((7L, "common common common common", "A"))
      .toDF("doc_id", "text", "source"))
    val got2 = Curation.ccnetBuckets(dup, minCount = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(got2(1L) == "head" && got2(7L) == "head")
  }
}
