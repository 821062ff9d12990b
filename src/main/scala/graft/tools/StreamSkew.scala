package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.pipeline.Dedup
import graft.streaming.StreamingOps

/** Streaming twin of [[SkewCorpus.measure]] — the hot-bucket hazard AT
  * INGEST, measured: the s14 pipeline (narrow band-bucket map →
  * `lshCandidatesStream`) over a [[SkewCorpus]]-staged corpus, uncapped
  * vs `maxBucket`-capped. The boilerplate class's short documents share
  * near-identical MinHash signatures, so they pile into the same
  * (band, bucket) keys: uncapped, that one hot bucket holds the whole
  * class as keyed state and emits O(class²) candidate pairs over the
  * stream's lifetime — the exact skew SkewCorpus measured in batch
  * (12.2M chrome pairs at 10x), now as unbounded state. The cap bounds
  * both, and the characterization is ASSERTED, not assumed: capped
  * candidates ⊆ uncapped, and the VERIFIED content pair sets (pairs
  * with at least one non-boilerplated member, exact Jaccard ≥ τ) are
  * IDENTICAL — the cap drops only chrome.
  *
  * Usage:
  *   runMain graft.tools.StreamSkew <skewDir> [maxBucket=16] [files=8]
  *
  * `skewDir` is a [[SkewCorpus]] output dir. Prints one JSON line with
  * wall seconds, candidate-pair counts, verified content-pair counts,
  * and the end-of-drain cumulative state row count per route
  * (`numRowsTotal` at the final progress). Streaming queries drain with
  * `Trigger.AvailableNow` over `files` staged parquet files
  * (maxFilesPerTrigger=1 — cross-micro-batch state really exercised).
  */
object StreamSkew {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamSkew <skewDir> [maxBucket] [files]")
    val dir = args(0)
    val maxBucket = if (args.length > 1) args(1).toInt else 16
    val files = if (args.length > 2) args(2).toInt else 8
    val (n, bands, rows, thr) = (3, 24, 2, 0.5)
    val spark = graft.Hgn.session("graft-streamskew", Map(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    docs.repartition(files).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/stream_in")

    // Parquet sink, not a memory sink: the UNCAPPED route's emission is
    // quadratic in the hot-bucket class (the hazard being measured) —
    // tens of millions of pairs at 10x skew OOM a driver-held table.
    def route(name: String, cap: Int): (Double, Long, Long) = {
      val out = s"$dir/pairs_$name"
      val ckpt = s"$dir/ckpt_$name"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      Seq(out, ckpt).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/stream_in")
      val buckets = Dedup.minHashBandBuckets(stream, n, bands, rows)
        .as[StreamingOps.BandEvent](org.apache.spark.sql.Encoders.product)
      val t0 = System.nanoTime()
      val q = StreamingOps.lshCandidatesStream(buckets, cap)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      // numRowsTotal at the final progress: keyed state is cumulative
      // across micro-batches under AvailableNow, so the last progress's
      // total IS the end-of-drain state row count (round-14 ADVICE: the
      // old field summed memoryUsedBytes of only the final micro-batch —
      // neither a row count nor a peak).
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      (wall, spark.read.parquet(out).dropDuplicates().count(), stateRows)
    }

    val (tU, pairsU, stateU) = route("skew_uncapped", Int.MaxValue)
    val (tC, pairsC, stateC) = route("skew_capped", maxBucket)

    // capped ⊆ uncapped (exact candidate-set algebra on drained sinks)
    val capPairs = spark.read.parquet(s"$dir/pairs_skew_capped")
      .dropDuplicates()
    val uncapPairs = spark.read.parquet(s"$dir/pairs_skew_uncapped")
      .dropDuplicates()
    val extra = capPairs.exceptAll(uncapPairs).count()
    require(extra == 0, s"capped emitted $extra pairs uncapped lacks")
    // verified CONTENT pairs identical: chrome-only is all the cap drops
    val bpIds = docs.filter(col("text").contains("bpw0"))
      .select(col("doc_id").as("bid"))
    def contentVerified(cands: org.apache.spark.sql.DataFrame): Long = {
      // content pair = at least one member NOT boilerplated (marker
      // left-joins + filter: an exceptAll against a self-derived frame
      // trips conflicting-reference resolution)
      Dedup.verifyJaccardPairs(docs, cands, n, thr)
        .join(bpIds.select(col("bid").as("id_a"), lit(1).as("bpa")),
          Seq("id_a"), "left")
        .join(bpIds.select(col("bid").as("id_b"), lit(1).as("bpb")),
          Seq("id_b"), "left")
        .filter(col("bpa").isNull || col("bpb").isNull)
        .count()
    }
    // The verify join is where the emitted volume bites: every candidate
    // pair attaches two full shingle sets and computes exact Jaccard —
    // timed per route so the cap's downstream saving is measured, not
    // inferred.
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (cvU, tvU) = timed(contentVerified(uncapPairs))
    val (cvC, tvC) = timed(contentVerified(capPairs))
    require(cvC == cvU,
      s"cap lost content near-dups: $cvC verified vs $cvU uncapped")
    def j(d: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    println(s"""{"uncapped_sec":${j(tU)},"capped_sec":${j(tC)},""" +
      s""""pairs":$pairsU,"pairs_capped":$pairsC,""" +
      s""""state_rows_total":$stateU,"state_rows_total_capped":$stateC,""" +
      s""""content_verified":$cvU,"content_verified_capped":$cvC,""" +
      s""""verify_sec":${j(tvU)},"verify_sec_capped":${j(tvC)},""" +
      s""""max_bucket":$maxBucket,"dir":"$dir"}""")
    spark.stop()
  }
}
