package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketch operators. First resident: an HLL-style
  * approximate distinct counter built ENTIRELY from relational algebra
  * and integer arithmetic — no UDAF, no binary sketch blobs, and no
  * float ACCUMULATION, so results are order-independent across
  * partitions, bit-identical run to run, and replayable by the DuckDB
  * oracle (the reference has no sketches; this is the 100 TB
  * cardinality primitive — exact `countDistinct` shuffles every
  * distinct key, a register sketch shuffles ≤ `m` rows per group).
  *
  * Construction (Flajolet-Martin / HyperLogLog family, PCSA-style
  * least-significant-set-bit rank):
  *   - `bucket = h mod m`, `rest = h div m` over the 60-bit [[Hashing]]
  *     value (integer `div`, never `/` — Spark's `/` promotes longs to
  *     doubles and loses bits past 2^53);
  *   - `rho(rest)` = 1-based position of the lowest set bit (the
  *     geometric observable) = `bit_count(shiftright(rest XOR (rest-1),
  *     1)) + 1` — pure integer ops both engines share; `rest = 0`
  *     (prob 2^-52 per row) saturates at [[MaxRho]];
  *   - register `M_j = max(rho)` per (group, bucket): a map-side
  *     combinable MAX aggregate — the sketch IS the shuffle row;
  *   - the harmonic denominator stays a LONG: `sum(2^(MaxRho - M_j))`
  *     plus `2^MaxRho` per never-hit register (≤ 2^62, exact); the only
  *     float ops are one cast and one constant division from identical
  *     inputs — deterministic on any IEEE engine, and the constant is
  *     interpolated into the oracle SQL as the same shortest-round-trip
  *     double literal rather than re-derived there.
  *
  * Small-range correction included (the raw harmonic mean overshoots
  * badly below ~5/2·m distinct keys): when empty registers remain and
  * the floored raw estimate is under `5/2·m`, the estimate switches to
  * linear counting `m·ln(m/V)` (V = empty registers) — the standard
  * HLL regime switch, still deterministic cross-engine (integer
  * threshold compare, one `ln` of the same double; ulp-boundary
  * collisions on `floor` are negligible at ≤ m distinct ratios, same
  * policy as the micro-nat LM scores).
  */
object Sketches {

  /** Saturation rank: after `div 256` a 60-bit hash keeps 52 usable
    * bits => lowest-set-bit ranks 1..52, with `rest = 0` pinned here.
    */
  val MaxRho: Int = 53

  /** Registers per sketch (fixed so the oracle SQL and the ±6.5%
    * (= 1.04/sqrt(256)) error band are stable).
    */
  val NumBuckets: Int = 256

  /** Raw-HLL alpha_256 × m² × 2^MaxRho — the whole constant numerator,
    * materialized ONCE here so Spark and the oracle SQL share the exact
    * same double (re-deriving it in SQL could differ in the last ulp).
    */
  val EstNumerator: Double =
    0.7213 / (1.0 + 1.079 / NumBuckets) * NumBuckets * NumBuckets *
      math.pow(2.0, MaxRho)

  /** 1-based lowest-set-bit position of a non-negative long column;
    * [[MaxRho]] when zero. `x XOR (x-1)` masks the lowest set bit and
    * everything below it; the shift drops the bit itself; `bit_count`
    * of the remaining low-mask is the 0-based position.
    */
  private[pipeline] def lsbRank(x: Column): Column =
    when(x === 0, lit(MaxRho))
      .otherwise(bit_count(shiftright(x.bitwiseXOR(x - 1), 1)) + 1)

  // Scala-side mirrors of the column math, for executor-side consumers
  // (the streaming sketch state keeps raw registers between triggers).
  // Each must stay bit-agreed with its column twin — pinned by
  // SketchesSpec's streaming==batch differential.

  /** Scala twin of [[lsbRank]]. */
  def rho(rest: Long): Int =
    if (rest == 0L) MaxRho else java.lang.Long.numberOfTrailingZeros(rest) + 1

  /** (bucket, rho) of a 60-bit hash — the register update for one key. */
  def observe(h: Long): (Int, Int) =
    ((h % NumBuckets).toInt, rho(h / NumBuckets))

  /** Estimate from a full register array (0 = never hit): the same
    * integer harmonic denominator + linear-counting switch as the
    * column/SQL formulation, value for value.
    */
  def estimateFromRegisters(registers: Array[Int]): Long = {
    require(registers.length == NumBuckets,
      s"expected $NumBuckets registers, got ${registers.length}")
    var denom = 0L
    var empty = 0L
    registers.foreach { r =>
      if (r == 0) { empty += 1; denom += 1L << MaxRho }
      else denom += 1L << (MaxRho - r)
    }
    val raw = math.floor(EstNumerator / denom.toDouble).toLong
    if (empty > 0 && raw < 5L * NumBuckets / 2)
      math.floor(NumBuckets.toDouble *
        math.log(NumBuckets.toDouble / empty.toDouble)).toLong
    else raw
  }

  /** `(group, bucket, rho, bn)` register rows — the sketch itself. */
  private def registerRows(df: DataFrame, groupCol: String, keyCol: String,
      mode: Hashing.HashMode): DataFrame =
    df.select(col(groupCol), mode(col(keyCol)).as("h"))
      .select(col(groupCol), expr(s"h % $NumBuckets").as("bucket"),
        expr(s"h div $NumBuckets").as("rest"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(lsbRank(col("rest"))).as("rho"), count(lit(1)).as("bn"))

  /** Estimate per residual grouping of `(… bucket, rho …)` register
    * rows: the integer harmonic denominator + linear-counting switch,
    * with any `extra` aggregates (e.g. row counts) carried through.
    */
  private def estimateOver(regs: DataFrame, groupCols: Seq[Column],
      extra: Seq[Column], estName: String): DataFrame = {
    val m = NumBuckets
    regs.groupBy(groupCols: _*)
      .agg(
        (lit(m.toLong) - count(lit(1))).as("v"),
        ((sum(expr(s"shiftleft(1L, $MaxRho - rho)")) +
          (lit(m.toLong) - count(lit(1))) * lit(1L << MaxRho)).as("denom")
          +: extra): _*)
      .withColumn("raw",
        floor(lit(EstNumerator) / col("denom").cast("double")).cast("long"))
      .withColumn(estName,
        when(col("v") > 0 && col("raw") < lit(5L * m / 2),
          floor(lit(m.toDouble) *
            log(lit(m.toDouble) / col("v").cast("double"))).cast("long"))
          .otherwise(col("raw")))
      .drop("v", "denom", "raw")
  }

  /** Approximate distinct count of `keyCol` per `groupCol`.
    *
    * Output: `(<groupCol>, n_rows, est_distinct)` — `est_distinct` is
    * the floored raw-HLL estimate of `countDistinct(keyCol)`.
    */
  def approxDistinct(df: DataFrame, groupCol: String, keyCol: String,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame =
    estimateOver(registerRows(df, groupCol, keyCol, mode),
      Seq(col(groupCol)), Seq(sum(col("bn")).as("n_rows")), "est_distinct")
      .select(col(groupCol), col("n_rows"), col("est_distinct"))

  /** Deterministic bottom-k sample per group — the OTHER classic
    * mergeable sketch: keep the `k` rows with the smallest key hashes.
    * Content-keyed like [[TextAnalysis.splitAssign]] (re-ingestion
    * yields the same sample; exact duplicates hash together), uniform
    * over distinct keys, and mergeable by construction (bottom-k of a
    * union = bottom-k of the parts' bottom-ks — samples from shards
    * combine without re-scanning).
    *
    * Output: the input row plus `(h, sample_rank)`, `sample_rank ∈
    * 1..k` ordered by `(h, tieCol)` — `tieCol` must be unique per row
    * (an id) so ranks among EXACT-duplicate keys are still
    * deterministic.
    *
    * Scale: per-group top-k by a window — Spark plans the rank filter
    * as `WindowGroupLimit` (partial per-partition limit before the
    * shuffle, then final), so no group ever sorts more than the
    * surviving candidates; there is no global sort.
    */
  def bottomKSample(df: DataFrame, groupCol: String, keyCol: String,
      tieCol: String, k: Int,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col(tieCol))
    df.withColumn("__h", mode(col(keyCol)))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .withColumnRenamed("__h", "h")
  }

  /** Nearest-rank quantiles extracted from a bottom-k sample — the
    * second half of the mergeable QUANTILE sketch (see
    * [[quantileSketch]]; split out so merged shard samples can be
    * queried directly). For each group with `m ≤ k` sampled rows and
    * each requested probability `p_bp` (basis points, 1..10000), emits
    * the value at 1-based rank `max(1, ceil(p·m))` of the sample
    * ordered by `(value, h, tie)` — pure integer arithmetic
    * (`(p_bp·m + 9999) div 10000`), so the estimate is deterministic
    * and oracle-replayable; no interpolation, no floats.
    *
    * Output: `(<groupCol>, p_bp, q_est)`, one row per group × prob.
    *
    * Scale: everything here is SKETCH-sized — `≤ k` rows per group
    * enter the rank window, the probe relation is a broadcast of
    * `|probs|` literals, and the final join keys on the group. The only
    * data-sized work happened upstream in [[bottomKSample]].
    */
  def quantilesOfSample(sample: DataFrame, groupCol: String,
      valueCol: String, tieCol: String, probsBp: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probsBp.nonEmpty && probsBp.forall(p => p >= 1 && p <= 10000),
      s"probabilities must be basis points in 1..10000, got $probsBp")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col("h"), col(tieCol))
    val ranked = sample
      .select(col(groupCol), col(valueCol), col("h"), col(tieCol))
      .withColumn("vrank", row_number().over(w).cast("long"))
    val m = sample.groupBy(col(groupCol)).agg(count(lit(1)).as("m"))
    val spark = sample.sparkSession
    import spark.implicits._
    val probs = probsBp.sorted.map(_.toLong).toDF("p_bp")
    m.crossJoin(broadcast(probs))
      .withColumn("want_rank",
        greatest(lit(1L), expr("(p_bp * m + 9999) div 10000")))
      .join(ranked, Seq(groupCol))
      .filter(col("want_rank") === col("vrank"))
      .select(col(groupCol), col("p_bp"),
        col(valueCol).cast("long").as("q_est"))
  }

  /** Mergeable rank/quantile sketch — the cardinality-family primitive
    * next to [[approxDistinct]] (HLL) and [[bottomKSample]]: quantile
    * estimates of `valueCol` per group from a deterministic bottom-k
    * row sample. The sketch IS the bottom-k sample (content-keyed on
    * `keyCol`), so it inherits its properties wholesale: mergeable by
    * construction (bottom-k of a union = bottom-k of the parts'
    * bottom-ks — shard sketches combine with no re-scan, then
    * [[quantilesOfSample]] reads the merged sample), deterministic
    * across re-ingestion, uniform over distinct keys. Estimation error
    * is the classic sample-quantile bound `~ 1.04·sqrt(p(1-p)/k)` in
    * probability units; groups with `m ≤ k` rows are EXACT nearest-rank
    * quantiles. All arithmetic is integer (basis-point ranks), so the
    * DuckDB oracle replays it value for value — no KLL-style float
    * compactors needed for a gateable, mergeable estimate.
    */
  def quantileSketch(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, tieCol: String, k: Int, probsBp: Seq[Int],
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame =
    quantilesOfSample(bottomKSample(df, groupCol, keyCol, tieCol, k, mode),
      groupCol, valueCol, tieCol, probsBp)

  /** Sketch ALGEBRA — the property that makes register sketches the
    * distributed cardinality tool: registers of a union are the
    * bucket-wise MAX of the parts' registers (no re-scan of the data),
    * and an intersection estimate follows by inclusion-exclusion.
    * Estimates `ga`, `gb`, their union and intersection from ONE
    * register pass over the two groups' rows: a single GROUPING SETS
    * aggregation produces the per-group registers AND the union
    * registers together, then one estimate pass + a conditional pivot
    * replaces the former three-estimates-plus-crossJoins shape.
    *
    * Output: one row `(est_a, est_b, est_union, est_inter)`;
    * `est_inter` can go slightly negative on near-disjoint sets (the
    * standard inclusion-exclusion artifact — left signed rather than
    * clamped so callers see the noise floor). A group absent from the
    * data estimates 0 (empty sketch), never NULL.
    */
  def approxDistinctPair(df: DataFrame, groupCol: String, keyCol: String,
      ga: String, gb: String,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    val regs = registerRows(
      df.filter(col(groupCol).isin(ga, gb)), groupCol, keyCol, mode)
    // (group, bucket) rows re-grouped once with GROUPING SETS
    // ((group, bucket), (bucket)): the per-group registers pass through
    // (max over one row) and the (bucket)-only set IS the union sketch.
    val tagged = regs
      .groupingSets(
        Seq(Seq(col(groupCol), col("bucket")), Seq(col("bucket"))),
        col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("rho"),
        // grouping() is only legal inside the aggregate list.
        when(grouping(col(groupCol)) === 1, lit("__union"))
          .otherwise(col(groupCol).cast("string")).as("tag"))
    val ests = estimateOver(tagged, Seq(col("tag")), Seq.empty, "est")
    // Pivot the ≤3 estimate rows into one; a group with no rows at all
    // has no register rows => no estimate row => empty sketch => 0.
    ests.agg(
      coalesce(max(when(col("tag") === ga, col("est"))), lit(0L))
        .as("est_a"),
      coalesce(max(when(col("tag") === gb, col("est"))), lit(0L))
        .as("est_b"),
      coalesce(max(when(col("tag") === "__union", col("est"))), lit(0L))
        .as("est_union"))
      .withColumn("est_inter",
        col("est_a") + col("est_b") - col("est_union"))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): `depth × width`
    * counter matrix as a relational table `(cm_row, pos, cnt)` — the
    * frequency-sketch sibling of the HLL register relation. Probe `i`'s
    * position for key hash `h` is `(h + i·step) mod width` with
    * `step = 1 + (h mod (width-1))` — the same exact-integer
    * double-hashing as [[Curation.bloomContamination]], replayable in
    * DuckDB.
    *
    * Mergeable by construction: counters of a union = per-cell SUM of
    * the parts' counters (spec-pinned), so shard sketches combine
    * without re-scanning — THE point at 100 TB: the sketch is
    * `depth × width` rows regardless of corpus size, a broadcastable
    * standing summary that answers any later frequency probe without
    * touching the data again.
    */
  def countMinSketch(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 2048,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1, width >= 2, got $depth x $width")
    val rows = df.select(mode(col(keyCol)).as("h"))
      .select(col("h"), explode(array((0 until depth).map(lit): _*)).as("cm_row"))
      .select(col("cm_row"),
        pmod(col("h") + col("cm_row") * (lit(1L) + pmod(col("h"), lit(width - 1L))),
          lit(width.toLong)).as("pos"))
    rows.groupBy(col("cm_row"), col("pos")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinSketch]]: for each
    * distinct value of `keyCol` in `keys`, the minimum over the sketch's
    * `depth` probed counters — `est_n >= ` the true occurrence count
    * ALWAYS (counters only over-count on collision; spec-pinned).
    *
    * Output: `(<keyCol>, est_n)`.
    *
    * Scale: the sketch is `depth × width` rows → broadcast; each probe
    * row carries only `(key, cm_row, pos)`.
    */
  def countMinLookup(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 2048,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"need depth >= 1, width >= 2, got $depth x $width")
    val probes = keys.select(col(keyCol)).distinct()
      .withColumn("h", mode(col(keyCol)))
      .select(col(keyCol), col("h"),
        explode(array((0 until depth).map(lit): _*)).as("cm_row"))
      .select(col(keyCol), col("cm_row"),
        pmod(col("h") + col("cm_row") * (lit(1L) + pmod(col("h"), lit(width - 1L))),
          lit(width.toLong)).as("pos"))
    probes.join(broadcast(sketch), Seq("cm_row", "pos"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }
}
