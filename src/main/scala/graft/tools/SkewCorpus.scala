package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-corpus generator + measurement for the stop-shingle-cap
  * evidence (round 13): the committed scale tables show the capped
  * Jaccard route COSTING ~1.8x over uncapped on the synthetic corpus —
  * correctly recorded as "no skew for the cap to bite on". This tool
  * constructs the corpus shape the cap exists for and measures both
  * routes on it.
  *
  * Construction (`run`): every `everyK`-th document gains one fixed
  * boilerplate block of `bpWords` words appended to its text — the
  * shared-footer/license-banner/navigation-chrome shape real web
  * corpora have. Against the catalog's (n=3, τ=0.3):
  *
  *   - for MEDIAN-length docs the block is ~40% of the doc's shingles —
  *     above the 30% of most-common shingles the τ=0.3 prefix filter
  *     excludes — so boilerplate shingles LAND IN THE PREFIX and the
  *     uncapped candidate self-join fans out quadratically in the
  *     boilerplate class size (df per block shingle = |class|);
  *   - for a median-length pair sharing ONLY the block, J = b/(2n−b)
  *     ≈ 0.25 < τ, but the corpus has 10-word docs too, and there the
  *     block DOMINATES: two unrelated short docs sharing the chrome
  *     legitimately clear τ. Those chrome-induced pairs are the
  *     classic dedup false-positive — "similar" because of navigation
  *     footers, not content — and the df-cap drops exactly them (the
  *     block's postings exceed any cap < |class|), which is the
  *     CCNet-style stop-shingle behavior a production pipeline wants.
  *
  * So the two routes' answers legitimately differ on this corpus, in a
  * fully characterized way; `measure` ASSERTS the characterization
  * instead of assuming it: capped ⊆ uncapped, and every uncapped-only
  * pair is chrome-induced (both members boilerplated). What the cap
  * buys: bounded candidate volume (cost measured here) plus immunity
  * to the chrome pair-inflation, at zero loss of content near-dups.
  *
  * Usage:
  *   runMain graft.tools.SkewCorpus <srcSfDir> <outDir> [everyK=5]
  *     [bpWords=37] [capDf=5] [runs=3]   (runs=0 skips measure)
  *
  * `measure` times `Dedup.jaccardPairsPrefix` (the p04 plan) vs
  * `Dedup.jaccardPairsCapped` (the p46 plan) on the skewed documents
  * and prints one JSON line. Pick `capDf` ABOVE the corpus' organic
  * max df and BELOW the chrome class size (sf0.1: organic max df 25,
  * class ≥ 250 at everyK ≤ 20, so capDf=30) — then the cap provably
  * drops only the block's postings. Data goes under outDir (e.g.
  * /tmp/graft_skew); regenerable, never committed.
  */
object SkewCorpus {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewCorpus <srcSfDir> <outDir> " +
      "[everyK] [bpWords] [measure]")
    val srcDir = args(0)
    val outDir = args(1)
    val everyK = if (args.length > 2) args(2).toInt else 5
    val bpWords = if (args.length > 3) args(3).toInt else 37
    val capDf = if (args.length > 4) args(4).toLong else 5L
    val runs = if (args.length > 5) args(5).toInt else 3
    val spark = graft.Hgn.session("graft-skewcorpus", Map(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, outDir, everyK, bpWords)
    if (runs > 0) println(measure(spark, outDir, runs = runs, capDf = capDf))
    spark.stop()
  }

  /** The fixed boilerplate block: deterministic words disjoint from the
    * corpus vocabulary (testdata words never contain '~' or the `bpw`
    * stem), so block shingles are exactly the shared-df class.
    */
  def boilerplate(bpWords: Int): String =
    (0 until bpWords).map(i => s"bpw$i").mkString(" ")

  /** Write the skewed documents table (other tables are not read by the
    * dedup family, so only documents.parquet is materialized).
    */
  def run(spark: SparkSession, srcDir: String, outDir: String,
      everyK: Int, bpWords: Int): Unit = {
    require(everyK >= 2, s"everyK must be >= 2, got $everyK")
    require(bpWords >= 3, s"bpWords must be >= 3 (one 3-shingle), got $bpWords")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    docs.withColumn("text",
        when(col("doc_id") % everyK === 0,
          concat(col("text"), lit(" " + boilerplate(bpWords))))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    println(s"[skewcorpus] wrote documents x(1/$everyK boilerplated, " +
      s"$bpWords words) from $srcDir to $outDir")
  }

  /** Time the uncapped prefix-filtered route vs the capped route on the
    * skewed corpus, assert the characterization (capped ⊆ uncapped;
    * every uncapped-only pair is chrome-induced, i.e. both members
    * carry the block), and return a JSON line with wall seconds, pair
    * counts, and the boilerplate class size. Each route runs `runs`
    * times; min is reported (same convention as Bench minima).
    */
  def measure(spark: SparkSession, dir: String, runs: Int = 3,
      n: Int = 3, threshold: Double = 0.3, capDf: Long = 5L): String = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue
      var rows = 0L
      var i = 0
      while (i < runs) {
        val t0 = System.nanoTime()
        rows = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      (best, rows)
    }
    val uncapped = graft.pipeline.Dedup.jaccardPairsPrefix(docs, n, threshold)
    val capped = graft.pipeline.Dedup.jaccardPairsCapped(docs, n, threshold, capDf)
    val (tU, nU) = time(() => uncapped.count())
    val (tC, nC) = time(() => capped.count())
    // Characterize the difference instead of assuming equality: the cap
    // must lose NOTHING except chrome-induced pairs. Jaccard values are
    // exact rationals of longs computed identically in both plans, so
    // set algebra on (id_a, id_b, jaccard) rows is well-defined.
    val extraC = capped.exceptAll(uncapped).count()
    require(extraC == 0, s"capped produced $extraC pairs uncapped lacks")
    val bpIds = docs.filter(col("text").contains("bpw0"))
      .select(col("doc_id").as("bid"))
    val uncappedOnly = uncapped.exceptAll(capped).cache()
    val nOnly = uncappedOnly.count()
    val nonChrome = uncappedOnly
      .join(bpIds, col("id_a") === col("bid"), "left_anti").count() +
      uncappedOnly.join(bpIds, col("id_b") === col("bid"), "left_anti").count()
    uncappedOnly.unpersist()
    val bpClass = bpIds.count()
    require(nonChrome == 0,
      s"$nonChrome uncapped-only pairs are NOT chrome-induced — cap lost content dups")
    f"""{"uncapped_sec":$tU%.2f,"capped_sec":$tC%.2f,"pairs":$nU,""" +
      f""""pairs_capped":$nC,"capped_subset":true,"uncapped_only":$nOnly,""" +
      f""""uncapped_only_all_chrome":true,"bp_class":$bpClass,"dir":"$dir"}"""
  }
}
