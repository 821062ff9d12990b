package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * after dedup/quality: benchmark decontamination and sequence packing.
  * Both compose codegen'd primitives ([[Shingles.hashedWordShingles]],
  * window aggregates) — no UDFs, no driver collection.
  */
object Curation {

  /** Benchmark-contamination scores: for every document, the fraction of
    * its distinct hashed word `n`-shingles that occur anywhere in
    * `benchmark` — the standard n-gram-overlap decontamination signal
    * (docs overlapping an eval set must not reach training).
    *
    * Output: `(doc_id, n_sh, n_hits, contamination)` for every input doc
    * (zero-overlap docs included).
    *
    * Scale: the benchmark's distinct shingle set is tiny relative to the
    * corpus (eval suites are few MB against 100 TB) → the semi-join
    * broadcasts; the per-doc hit count is a map-side-combinable agg on
    * an 8-byte key. The corpus text is never shuffled.
    */
  def contaminationScores(docs: DataFrame, benchmark: DataFrame, n: Int,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    def hs(d: DataFrame) = d.select(col("doc_id"),
      Shingles.hashedWordShingles(col("text"), n, mode).as("hs"))
    // ONE shingling pass over the corpus (the dominant narrow-stage cost):
    // n_sh rides along the exploded rows, and a LEFT join against the
    // marked benchmark set counts hits while keeping zero-hit docs —
    // shingling never exceeds the explode fan-out it already pays.
    val docSh = hs(docs).select(col("doc_id"), size(col("hs")).cast("long").as("n_sh"),
      explode(col("hs")).as("h"))
    val benchSet = hs(benchmark).select(explode(col("hs")).as("h")).distinct()
      .withColumn("__hit", lit(1))
    docSh.join(benchSet, Seq("h"), "left")
      .groupBy("doc_id", "n_sh").agg(count(col("__hit")).as("n_hits"))
      .select(col("doc_id"), col("n_sh"), col("n_hits"))
      .withColumn("contamination",
        col("n_hits").cast("double") / col("n_sh").cast("double"))
  }

  /** Concatenate-then-chunk sequence packing: documents of each shard
    * are laid out in `doc_id` order and chunked into fixed `budget`-token
    * context windows; a document's bin is the window its START offset
    * falls in (how packed pretraining data is actually built — documents
    * straddle chunk boundaries rather than leaving tail padding).
    *
    * Output: `(shard, doc_id, n_tokens, start_offset, bin)`.
    *
    * Scale: a naive `sum().over(Window.partitionBy(shard))` funnels each
    * shard through ONE window task — fine when shards are output-file
    * sized, a single-task bottleneck when one "source" is 10 TB (VERDICT
    * round 5 "What's wrong" #1). This is the classic two-phase
    * distributed prefix-sum instead:
    *
    *   1. an order-preserving range split of each shard's `doc_id` span
    *      into `numSubShards` sub-shards (boundaries from a per-shard
    *      min/max — one tiny broadcastable aggregate, no quantile
    *      collection);
    *   2. the running sum WITHIN each (shard, sub-shard) — parallel
    *      windows, `shards × numSubShards` tasks;
    *   3. per-sub-shard totals rolled into per-sub-shard starting
    *      offsets (a window over the shards × numSubShards totals table
    *      — trivially small) broadcast-joined back and added.
    *
    * The sub-shard boundaries don't affect the answer — any monotone
    * split yields bit-identical offsets (p20's oracle replays the
    * single-window formulation and still hash-matches).
    */
  def packSequences(docs: DataFrame, budget: Long,
      shardCol: String = "source", tokenCount: Column => Column =
        c => TextAnalysis.tokenCount(c),
      numSubShards: Int = 64): DataFrame =
    packSequencesFrom(
      docs.select(col(shardCol).as("shard"), col("doc_id"),
        tokenCount(col("text")).as("n_tokens")),
      budget, numSubShards)

  /** [[packSequences]] over a PRECOMPUTED `(shard, doc_id, n_tokens)`
    * relation — the entry point for token grains that aren't a per-row
    * column expression (e.g. [[Bpe.docTokenCounts]], where the subword
    * count comes from a distinct-word merge replay rather than the text
    * column itself). Same two-phase distributed prefix sum, same output.
    */
  def packSequencesFrom(base: DataFrame, budget: Long,
      numSubShards: Int = 64): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(numSubShards >= 1, s"numSubShards must be >= 1, got $numSubShards")
    // Order-preserving sub-shard index: proportional position of doc_id
    // inside the shard's [lo, hi] id span. Double arithmetic (no ANSI
    // overflow for extreme id ranges) is fine here — the map only has to
    // be DETERMINISTIC and MONOTONE in doc_id, not exact.
    val ranges = base.groupBy("shard")
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    // Cast BEFORE subtracting: a long-space `doc_id - lo` would throw
    // ARITHMETIC_OVERFLOW under default-ANSI when a shard's id span
    // exceeds Long range; in double space it merely loses precision,
    // which this map is allowed to do.
    val subExpr = least(lit(numSubShards - 1),
      floor((col("doc_id").cast("double") - col("lo").cast("double")) /
        (col("hi").cast("double") - col("lo").cast("double") + 1d) *
        numSubShards))
      .cast("int")
    val withSub = base.join(broadcast(ranges), Seq("shard"))
      .withColumn("sub", subExpr)
    val wIn = Window.partitionBy(col("shard"), col("sub"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = withSub.withColumn("local_offset",
      coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    // Totals derive from `within`, not `withSub`: both consumers then
    // share the scan→tokenCount→join→exchange subtree (ReuseExchange),
    // so the dominant cost — tokenizing the corpus — runs once, not
    // twice. max(local_offset + n_tokens) is the group's token sum:
    // the cumsum is non-decreasing (n_tokens ≥ 0), so the last row's
    // exclusive offset plus its own count is the total.
    val totals = within.groupBy("shard", "sub")
      .agg(max(col("local_offset") + col("n_tokens")).as("sub_total"))
    val wTot = Window.partitionBy(col("shard")).orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("sub_offset", coalesce(sum(col("sub_total")).over(wTot), lit(0L)))
      .select(col("shard"), col("sub"), col("sub_offset"))
    within.join(broadcast(offsets), Seq("shard", "sub"))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        (col("local_offset") + col("sub_offset")).as("start_offset"))
      .withColumn("bin", expr(s"start_offset div $budget"))
  }

  /** Bloom-filter decontamination — the 100 TB scale path of
    * [[contaminationScores]]. The benchmark's distinct hashed shingles
    * are folded into a FIXED-SIZE bit array (`words` 63-bit BIGINT
    * words; bit 63 stays unused so the DuckDB oracle's checked `<<`
    * never overflows), and every corpus shingle is tested with `probes`
    * double-hashed probes. Output: `(doc_id, n_sh, n_maybe, maybe_frac)`
    * — `n_maybe >= ` the exact `n_hits` of [[contaminationScores]]
    * (no false negatives, a guaranteed-safe over-flag; the FP rate is
    * `(bits_set/m)^probes`, sized by `words`).
    *
    * Why it exists: the exact semi-join broadcasts the benchmark's
    * distinct-shingle SET, which for a large eval registry (or a
    * "never train on these documents" blocklist of billions of
    * shingles) outgrows broadcast limits. The bloom bitmap is
    * `words × 8` bytes REGARDLESS of benchmark size — always
    * broadcastable — and membership is integer bit math, no string
    * set lookup.
    *
    * Probe `i` position: `(h + i*step) mod m` with
    * `step = 1 + (h mod (m-1))` — double hashing; all arithmetic stays
    * `< 2^60 + probes·m`, exact in BIGINT on both engines.
    */
  def bloomContamination(docs: DataFrame, benchmark: DataFrame, n: Int,
      words: Int = 1024, probes: Int = 3,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    require(words >= 1, s"words must be >= 1, got $words")
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val m = words.toLong * 63L
    def hs(d: DataFrame) = d.select(col("doc_id"),
      Shingles.hashedWordShingles(col("text"), n, mode).as("hs"))
    def positions(h: Column): Column = {
      val step = lit(1L) + pmod(h, lit(m - 1L))
      array((0 until probes).map(i => pmod(h + lit(i.toLong) * step, lit(m))): _*)
    }
    val bloom = hs(benchmark).select(explode(col("hs")).as("h")).distinct()
      .select(explode(positions(col("h"))).as("pos"))
      .select(expr("pos div 63").as("w"),
        expr("shiftleft(1L, cast(pos % 63 as int))").as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
    val docSh = hs(docs).select(col("doc_id"),
      size(col("hs")).cast("long").as("n_sh"), explode(col("hs")).as("h"))
    val probed = docSh
      .select(col("doc_id"), col("n_sh"), col("h"),
        explode(positions(col("h"))).as("pos"))
      .select(col("doc_id"), col("n_sh"), col("h"),
        expr("pos div 63").as("w"),
        expr("shiftleft(1L, cast(pos % 63 as int))").as("bit"))
    // A shingle is a bloom POSITIVE iff all `probes` probe bits are set
    // (duplicate probe positions hit or miss identically, so the
    // sum==probes test is exact even when the double-hash cycle repeats
    // a position within one shingle).
    val perShingle = probed.join(broadcast(bloom), Seq("w"), "left")
      .withColumn("hit",
        coalesce(col("bits").bitwiseAND(col("bit")) === col("bit"), lit(false)))
      .groupBy("doc_id", "n_sh", "h")
      .agg((sum(when(col("hit"), 1).otherwise(0)) === probes).as("maybe"))
    perShingle.groupBy("doc_id", "n_sh")
      .agg(sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"))
      .select(col("doc_id"), col("n_sh"), col("n_maybe"),
        (col("n_maybe").cast("double") / col("n_sh").cast("double"))
          .as("maybe_frac"))
  }

  /** Mixture equalization sampling: down-sample every source to the size
    * of the SMALLEST source with a deterministic hash-Bernoulli keep —
    * the stateless way to re-balance a multi-source corpus mix (no
    * window, no shuffle of the data itself, replayable on any subset).
    *
    * Per-source rate is `(1e6 * min_n) div n_source` micro-units; a doc
    * is kept when `h60("mix:" || doc_id) mod 1e6 < rate_micro` — i.i.d.
    * uniform in doc content terms but bit-deterministic, so the same doc
    * keeps/drops identically across engines, runs, and partitionings.
    *
    * Output: `(doc_id, source, n_source, rate_micro, kept)` for every
    * input doc (callers filter `kept`).
    *
    * Scale: the per-source count table is |sources| rows → broadcast;
    * the keep decision is a narrow codegen'd map. Nothing about the
    * corpus shuffles.
    */
  def equalizeMixture(docs: DataFrame, sourceCol: String = "source")
      : DataFrame = {
    val counts = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_source"))
    val minN = counts.agg(min(col("n_source")).as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("source"), col("n_source"),
        expr("(1000000 * min_n) div n_source").as("rate_micro"))
    docs.select(col("doc_id"), col(sourceCol).as("source"))
      .join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_source"), col("rate_micro"),
        (pmod(Hashing.h60(concat(lit("mix:"), col("doc_id").cast("string"))),
          lit(1000000L)) < col("rate_micro")).as("kept"))
  }

  /** Temperature-based mixture reweighting at T = 1/2 — the softened
    * domain-sampling law large-LM data recipes use between "natural"
    * (T=1, proportional) and "equalized" (T→0, [[equalizeMixture]]):
    * source s is sampled with share ∝ n_s^T, so big sources are
    * down-weighted sub-linearly and small sources boosted without
    * being equalized up to parity. T = 1/2 is chosen because it is the
    * one classic temperature with an INTEGER-EXACT cross-engine form:
    * n^0.5 = sqrt, and `floor(sqrt(n · 10^6))` (milli-precision
    * integer sqrt) is bit-identical in any IEEE engine — sqrt is
    * correctly rounded, no `pow`/`ln` drift — so the keep decision
    * hash-gates exactly. Expected kept total = corpus size (shares
    * renormalized over sqrt masses), rates capped at 1: sources whose
    * boosted share exceeds their size keep everything (no
    * upsampling — this is a filter, not a replicator).
    *
    * Determinism: per-source rate_micro is exact integer floor
    * division; the per-doc decision is the p38 hash-Bernoulli
    * (`h60("tmix:" || doc_id) % 10^6 < rate_micro`) — bit-stable
    * across engines, runs, and partitionings.
    *
    * Output: `(doc_id, source, n_source, rate_micro, kept)` for every
    * input doc (callers filter `kept`).
    *
    * Scale: |sources|-row broadcast rate table; narrow codegen'd keep
    * decision; nothing about the corpus shuffles. The rate numerator
    * `10^6 · s_milli · n_total ≈ 10^9 · n_total^1.5` needs up to
    * ~36 decimal digits at 10^18 docs — past int64 at ~5·10^6 docs —
    * so the arithmetic runs in decimal(38,0) on the Spark side and
    * HUGEINT in the DuckDB oracle: exact integer division in both
    * engines at any realistic corpus size, result always ≤ 10^6 so
    * the final rate is a plain BIGINT.
    */
  def temperatureMixture(docs: DataFrame, sourceCol: String = "source")
      : DataFrame = {
    val counts = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_source"))
    val rates = temperatureRates(counts)
    docs.select(col("doc_id"), col(sourceCol).as("source"))
      .join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_source"),
        col("rate_micro"),
        (pmod(Hashing.h60(concat(lit("tmix:"), col("doc_id").cast("string"))),
          lit(1000000L)) < col("rate_micro")).as("kept"))
  }

  /** The T=1/2 rate table from a `(source, n_source)` count relation —
    * factored out of [[temperatureMixture]] so the arithmetic is
    * testable at counts no spec could materialize as rows. decimal(38,0)
    * keeps the ~10^9·n^1.5 numerator exact far past the int64 ceiling
    * (~5.4M docs would ARITHMETIC_OVERFLOW under ANSI); `div` on
    * decimals is integral division returning BIGINT.
    */
  private[graft] def temperatureRates(counts: DataFrame): DataFrame = {
    val sm = counts.withColumn("s_milli",
      floor(sqrt(col("n_source").cast("double") * 1e6)).cast("long"))
    val tot = sm.agg(sum(col("s_milli")).as("sum_s"),
      sum(col("n_source")).as("n_total"))
    sm.crossJoin(broadcast(tot))
      .select(col("source"), col("n_source"), col("s_milli"),
        least(lit(1000000L),
          expr("cast(1000000 as decimal(38,0)) * s_milli * n_total" +
            " div (cast(sum_s as decimal(38,0)) * n_source)"))
          .as("rate_micro"))
  }

  /** Weighted sample WITHOUT replacement, k docs per group, inclusion
    * probability proportional to `weight` — the exponential-race /
    * A-ES construction (Efraimidis & Spirakis 2006): each row draws a
    * deterministic uniform `u` from its id hash, its race key is
    * `-ln(u) / w` (an `Exp(w)` variate), and the k smallest keys per
    * group win. One pass, no rejection loop, no driver RNG state.
    *
    * Determinism: `u` is hash-derived (`h60("ws:" || doc_id)`, micro
    * resolution), `-ln(u)` is floored to integer MICRO-nats before the
    * divide (the repo's p27/p40 fixed-point-ln convention — a 1-ulp
    * cross-engine `ln` difference only flips the floor with ~1e-10
    * probability), and the divide is integer floor division at nano
    * resolution, so the race key is a BIGINT both engines compute
    * identically; ties (~nil at nano resolution) break on doc_id.
    *
    * Output: `(group, doc_id, weight, samp_rank)` — the k winners per
    * group, `samp_rank` 1..k by race key.
    *
    * Scale: key derivation is a narrow codegen map (no `ln` table, no
    * UDF); the per-group top-k is ONE hash-partition on the group key
    * with `WindowGroupLimit` pruning candidates map-side before the
    * exchange — a group never globally sorts, and nothing beyond k rows
    * per group per partition shuffles. At 100 TB this is the cheapest
    * correct shape for "sample k docs per source, long docs more often".
    */
  def weightedSample(docs: DataFrame, k: Int,
      groupCol: String = "source", weightCol: String = "n_chars")
      : DataFrame = {
    require(k >= 1, s"weightedSample needs k >= 1, got $k")
    val keyed = docs.select(
      col(groupCol).as("group"), col("doc_id"),
      checkedWeight(col(weightCol), col("doc_id")).as("weight"))
      .withColumn("race_nano", raceKey(col("doc_id"), col("weight")))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("race_nano"), col("doc_id"))
    keyed.withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter(col("samp_rank") <= k)
      .select(col("group"), col("doc_id"), col("weight"), col("samp_rank"))
  }

  /** Loud failure on a NULL or non-positive weight (the race-key
    * division would yield a silent NULL that Spark's window sorts
    * NULLS FIRST — always sampled — while DuckDB sorts NULLS LAST —
    * never sampled: a silent cross-engine divergence) — the repo's
    * raise_error convention. The NULL arm is explicit because
    * `NULL <= 0` is NULL, which `when` treats as false and would have
    * slipped past the guard.
    */
  private[graft] def checkedWeight(weight: Column, id: Column): Column =
    when(weight.isNull || weight <= 0, raise_error(concat(
      lit("weightedSample: NULL or non-positive weight for doc_id="),
      id.cast("string"))).cast("long"))
      .otherwise(weight.cast("long"))

  /** The A-ES race key of one row as an integer column — shared by the
    * batch [[weightedSample]] and its streaming twin (smaller key wins;
    * a per-group bottom-k of these keys IS a weighted sample without
    * replacement). `u ∈ (0, 1]` is hash-derived at micro resolution,
    * `-ln(u)` floors to integer micro-nats (the p27/p40 fixed-point-ln
    * convention), and the divide by `weight` is integer floor division
    * at nano resolution — a BIGINT both engines compute identically.
    */
  def raceKey(docId: Column, weight: Column): Column = {
    val uMicro = pmod(Hashing.h60(concat(lit("ws:"), docId.cast("string"))),
      lit(1000000L)) + 1L
    val eMicro = floor(-log(uMicro.cast("double") / 1e6) * 1e6).cast("long")
    val num = eMicro * 1000000L
    // Integer floor division without an `expr` string: (num - num % w)
    // is exactly divisible by w, so the double `/` is exact (correctly
    // rounded IEEE division of a representable quotient; num ≤ ~1.4e13
    // is far inside 2^53).
    ((num - pmod(num, weight)) / weight).cast("long")
  }

  /** DSIR-style importance weighting (arXiv:2302.03169 shape): score
    * every document by how much its hashed-token distribution looks like
    * a small trusted TARGET slice of the corpus versus the raw rest,
    * then select docs whose mean per-token weight clears parity.
    *
    * Token features are hashed into `buckets` buckets (hash n-grams →
    * fixed feature space, the DSIR trick that makes the estimator
    * corpus-size-independent). Per-bucket weight is the add-one-smoothed
    * target/raw count ratio in EXACT integer micro-units —
    * `(1e6 * (tgt+1)) div (raw+1)` — instead of a float log-likelihood
    * ratio: monotone in the same ratio, but bit-reproducible in the
    * DuckDB oracle (no cross-engine `ln` rounding).
    *
    * Output: `(doc_id, n_tokens, score_micro, per_tok_micro, selected)`.
    *
    * Scale: ONE tokenize+hash pass (round 20 — the weight build and the
    * per-doc score used to each re-run the explode+hash over the full
    * token stream, 2x the dominant stage): the pass collapses to a
    * `(doc_id, b) → cnt` histogram behind a lineage cut, bounded by
    * docs × min(tokens, buckets) rows — far below the token stream.
    * The bucket totals are a re-aggregate of the histogram
    * (`Σ cnt` per bucket ≡ the token-grain count, exactly), the weight
    * table is exactly `buckets` rows — broadcast — and the per-doc
    * score is `Σ cnt·w_micro` ≡ the per-token sum in the same exact
    * integer arithmetic. Two small-key shuffles; corpus text never
    * shuffles.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 1024,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toks = docs.select(col("doc_id"), isTarget.as("tgt"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    // `tgt` is a function of doc_id, so carrying it in the grouping key
    // adds no groups.
    val hist = graft.plans.Lineage.cut(
      toks.select(col("doc_id"), col("tgt"), (mode(col("w")) % buckets).as("b"))
        .groupBy("doc_id", "tgt", "b").agg(count(lit(1)).as("cnt")))
    val counts = hist.groupBy("b").agg(
      sum(when(col("tgt"), col("cnt")).otherwise(0L)).as("tgt_n"),
      sum(when(!col("tgt"), col("cnt")).otherwise(0L)).as("raw_n"))
    val weights = counts.select(col("b"),
      expr("(1000000 * (tgt_n + 1)) div (raw_n + 1)").as("w_micro"))
    // Selection cut: a doc is selected when its mean per-token weight
    // beats the CORPUS-WIDE target/raw ratio in the same micro-units
    // (above-average target-likeness) — one 1-row broadcast, same exact
    // integer arithmetic.
    val globalCut = counts.agg(
        expr("(1000000 * (sum(tgt_n) + 1)) div (sum(raw_n) + 1)")
          .as("cut_micro"))
    hist.join(broadcast(weights), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("w_micro") * col("cnt")).as("score_micro"))
      .crossJoin(broadcast(globalCut))
      .select(col("doc_id"), col("n_tokens"), col("score_micro"),
        expr("score_micro div n_tokens").as("per_tok_micro"),
        (expr("score_micro div n_tokens") >= col("cut_micro")).as("selected"))
  }

  /** Per-source quality cap — keep only the `k` highest-quality docs of
    * each source (the FineWeb-style per-domain limit that stops one
    * crawl domain from dominating the mixture). Quality is the same
    * corpus-self-derived unigram-LM score as [[ccnetBuckets]] (integer
    * micro-nats per token, true floor division), ties broken by doc_id
    * so the cut is deterministic.
    *
    * Scale: rank-within-source is `row_number <= k`, which Spark plans
    * with a WindowGroupLimit below the shuffle — every partition keeps
    * at most k rows per source BEFORE the exchange (plan-asserted in
    * PlanSpec), so a billion-doc domain ships k·partitions rows, not
    * its whole posting. That pushdown only exists when the plan FILTERS
    * on the rank, so this returns the survivors (with their ranks), not
    * an all-rows audit flag — callers wanting the cut list anti-join
    * the result against the input.
    */
  def sourceTopK(docs: DataFrame, k: Int, minCount: Long = 2,
      sourceCol: String = "source", scoreCol: Option[Column] = None)
      : DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    def floorDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    // Ranking key: the corpus-self-derived unigram-LM score by default;
    // real pipelines also cap by recency, length, or an externally
    // computed model score — `scoreCol` ranks by any expression over the
    // input row instead (higher = kept), same output schema and the same
    // WindowGroupLimit pushdown (the rank filter is what Spark plans the
    // partial group-limit from, regardless of the ordering key).
    val scored = scoreCol match {
      case Some(c) =>
        docs.select(col("doc_id"), col(sourceCol).as("source"),
          c.cast("long").as("score_micro"))
      case None => TextAnalysis.unigramQuality(docs, minCount)
        .select(col("doc_id"),
          floorDiv(col("lp_micro_sum"), col("n_tokens")).as("score_micro"))
        .join(docs.select(col("doc_id"), col(sourceCol).as("source")),
          Seq("doc_id"))
    }
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("source"), col("score_micro"), col("rank"))
  }

  /** Benchmark-contamination SPANS — the positional completion of
    * [[contaminationScores]]: not just what fraction of a training doc
    * overlaps the benchmark, but WHERE. Every corpus-doc position whose
    * word `spanL`-gram appears anywhere in the benchmark is flagged and
    * island-merged into maximal spans (same machinery as the duplicate-
    * span family — [[Dedup.positionalGrams]]/[[Dedup.mergeIslands]]), so
    * a decontamination pass can cut exactly the leaked regions (feed
    * the spans to a [[Dedup.dupSpansCut]]-style rebuild) instead of
    * dropping whole documents that mention one benchmark sentence.
    *
    * Output per corpus doc: `(doc_id, n_words, n_contam_spans,
    * contam_words, contam_frac)` — zero rows for clean docs included.
    *
    * Scale: the benchmark side collapses to its DISTINCT gram-hash set
    * (for a real eval suite, thousands of 8-byte keys — Catalyst
    * broadcasts the semi-join); the corpus side is one row per word,
    * and the island window partitions by doc_id. Nothing is ever
    * corpus × benchmark.
    */
  def contaminationSpans(docs: DataFrame, benchmark: DataFrame, spanL: Int,
      idCol: String = "doc_id", textCol: String = "text",
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    val posts = Dedup.positionalGrams(docs, spanL, idCol, textCol, mode)
    val benchGrams = Dedup.positionalGrams(benchmark, spanL, idCol, textCol, mode)
      .select("h").distinct()
    val spans = Dedup.mergeIslands(
      posts.join(benchGrams, Seq("h"), "left_semi")
        .select("doc_id", "n_words", "pos"), spanL)
    val perDoc = spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_contam_spans"),
        sum(col("e") - col("s") + 1L).as("contam_words"))
    docs.select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_contam_spans"), lit(0L)).as("n_contam_spans"),
        coalesce(col("contam_words"), lit(0L)).as("contam_words"),
        (coalesce(col("contam_words"), lit(0L)).cast("double") /
          col("n_words").cast("double")).as("contam_frac"))
  }

  /** The CUT completion of [[contaminationSpans]] — remove exactly the
    * leaked regions and rebuild the text, instead of dropping whole
    * documents that mention one benchmark sentence: every corpus
    * position whose `spanL`-gram appears in the benchmark is flagged,
    * island-merged, and cut via the same relational rebuild as
    * [[Dedup.dupSpansCut]]. Output `(doc_id, n_words, cut_words,
    * text_cut)` for EVERY input doc (`text_cut` empty when the whole
    * doc was benchmark material).
    *
    * Scale: identical shape to its two parents — the benchmark
    * collapses to its distinct gram-hash set (broadcast semi-join), the
    * corpus side is one row per word, and the rebuild hash-partitions
    * on doc_id. Nothing is ever corpus × benchmark.
    */
  def contaminationSpansCut(docs: DataFrame, benchmark: DataFrame,
      spanL: Int, idCol: String = "doc_id", textCol: String = "text",
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    val posts = Dedup.positionalGrams(docs, spanL, idCol, textCol, mode)
    val benchGrams = Dedup.positionalGrams(benchmark, spanL, idCol, textCol,
        mode)
      .select("h").distinct()
    val spans = Dedup.mergeIslands(
      posts.join(benchGrams, Seq("h"), "left_semi")
        .select("doc_id", "n_words", "pos"), spanL)
    Dedup.rebuildWithoutSpans(docs, spans, idCol, textCol)
  }

  /** Deterministic global training shuffle + shard assignment: every doc
    * gets `(shard, shard_pos)` where shard = its 60-bit salted id-hash
    * mod `numShards` and shard_pos = its hash rank WITHIN the shard —
    * the reproducible "shuffle the corpus, write S shards, stream each
    * shard in order" layout a trainer consumes. Keyed on the id, not
    * the text, so re-running after an edit moves only the edited doc.
    *
    * Scale: the only wide operation is one window partitioned by shard
    * ordered by (h, doc_id) — with production shard counts (thousands)
    * each partition holds n/S rows, and Spark sorts them with the same
    * shuffle a `repartition(S).sortWithinPartitions` layout-write would
    * need anyway; hash uniformity keeps shard sizes within ±O(√(n/S)).
    * No global rank is ever computed (a total-order row_number would
    * serialize on one partition).
    */
  def shuffleShards(docs: DataFrame, numShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    import org.apache.spark.sql.expressions.Window
    val h = Hashing.h60(concat(lit("shuf:"), col(idCol).cast("string")))
    docs.select(col(idCol).as("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(numShards.toLong)))
      .withColumn("shard_pos",
        row_number().over(
          Window.partitionBy("shard").orderBy("h", "doc_id"))
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("shard_pos"))
  }

  /** CCNet-style per-source quality buckets (Wenzek et al. 2020 shape):
    * score every doc with the corpus-self-derived unigram LM
    * ([[TextAnalysis.unigramQuality]], integer micro-nats), then split
    * each source into head / middle / tail thirds by per-source score
    * thresholds. The bucket is the curation signal: head = most
    * LM-probable (cleanest) third of its source, tail = least.
    *
    * All integer-exact: the per-doc score is floor(lp_micro_sum /
    * n_tokens) via the pmod identity (true floor division — lp sums are
    * negative, and Spark `div` / DuckDB `//` disagree on negative
    * truncation), and thresholds come from a per-(source, score) count
    * relation with a descending cumulative window — score values are
    * bounded (micro-nats per token), so that relation is tiny no matter
    * the corpus size, and no window ever spans a source's documents.
    * t_head = score of the ceil(n/3)-ranked doc (desc), t_mid = score
    * of the ceil(2n/3)-ranked doc; bucket by score ≥ threshold, so
    * score ties land in the better bucket on both engines identically.
    */
  def ccnetBuckets(docs: DataFrame, minCount: Long = 2,
      sourceCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def floorDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val scored = TextAnalysis.unigramQuality(docs, minCount)
      .select(col("doc_id"),
        floorDiv(col("lp_micro_sum"), col("n_tokens")).as("score_micro"))
      .join(docs.select(col("doc_id"), col(sourceCol).as("source")),
        Seq("doc_id"))
    val hist = scored.groupBy("source", "score_micro")
      .agg(count(lit(1)).as("c"))
    val wDesc = Window.partitionBy("source").orderBy(col("score_micro").desc)
    val cum = hist
      .withColumn("cum", sum("c").over(wDesc))
      .withColumn("n", sum("c").over(Window.partitionBy("source")))
    // threshold at rank k (desc) = the k-th-ranked doc's score = the
    // LARGEST score whose desc-cumulative count reaches k (cum grows as
    // score descends; the first group to reach k holds that doc).
    def thresholdAt(kExpr: Column): Column =
      max(when(col("cum") >= kExpr, col("score_micro")))
    val thresholds = cum.groupBy("source").agg(
      thresholdAt(expr("(n + 2) div 3")).as("t_head"),
      thresholdAt(expr("(2 * n + 2) div 3")).as("t_mid"))
    scored.join(broadcast(thresholds), Seq("source"))
      .select(col("doc_id"), col("source"), col("score_micro"),
        when(col("score_micro") >= col("t_head"), lit("head"))
          .when(col("score_micro") >= col("t_mid"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
