package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup, TextAnalysis}

/** Production corpus-curation entry point — the full training-data
  * pipeline (quality gate → exact dedup → near-dedup group resolution →
  * benchmark decontamination → split assignment → sequence packing) as
  * ONE tool over parquet, the curation counterpart of
  * [[AnnIndex]] (each stage already exists as an oracle-gated operator;
  * this wires the composition a real corpus run executes and reports
  * per-stage yield).
  *
  * ```
  * runMain graft.tools.Curate <docs.parquet> <outDir> \
  *     [benchmark.parquet|-] [jaccardT=0.8] [maxContam=0.2] [packBudget=512] \
  *     [decontam=exact|bloom]
  * ```
  *
  * `docs.parquet` needs `(doc_id: long, text: string, source: string)`.
  * `benchmark.parquet|-` is an eval set to decontaminate against (`-`
  * skips the stage). Writes `outDir/curated` (surviving docs + `split`)
  * and `outDir/packed` (train-split sequence packing), and prints ONE
  * JSON line of per-stage counts and wall times.
  *
  * Scale: every stage is the oracle-gated distributed operator — no
  * stage collects documents to the driver. Stages are localCheckpointed
  * between counts so the per-stage yield report costs one job per stage
  * instead of re-executing the whole upstream chain each time
  * (checkpoint ≈ the materialization a multi-day 100 TB run would do to
  * parquet between stages anyway).
  */
object Curate {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Runs the pipeline; returns per-stage doc counts and seconds. */
  def run(spark: SparkSession, docsPath: String, outDir: String,
      benchmarkPath: Option[String], jaccardT: Double = 0.8,
      maxContam: Double = 0.2, packBudget: Long = 512L,
      shingleN: Int = 3, decontamMode: String = "exact"): Map[String, Double] = {
    require(decontamMode == "exact" || decontamMode == "bloom",
      s"decontam mode must be 'exact' or 'bloom', got '$decontamMode'")
    val stats = scala.collection.mutable.LinkedHashMap[String, Double]()
    def stage(name: String)(f: => DataFrame): DataFrame = {
      val ((df, n), sec) = timed {
        val cut = f.localCheckpoint()
        (cut, cut.count())
      }
      stats(s"${name}_docs") = n.toDouble
      stats(s"${name}_sec") = sec
      df
    }

    val docs = stage("input") {
      spark.read.parquet(docsPath).select("doc_id", "text", "source")
    }

    val quality = stage("quality") {
      docs.filter(TextAnalysis.qualityOk(col("text")) &&
        TextAnalysis.repetitionRatio(col("text"), shingleN) < lit(0.9))
    }

    val exact = stage("exact_dedup") {
      val canon = Dedup.exact(quality)
        .select(col("canonical_id").as("doc_id"))
      quality.join(canon, Seq("doc_id"), "left_semi")
    }

    val near = stage("near_dedup") {
      val pairs = Dedup.jaccardPairsPrefix(exact, shingleN, jaccardT)
      val canon = Dedup.resolveDupGroups(exact, pairs)
      exact.join(canon.filter(col("doc_id") === col("canonical_id"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
    }

    val decontam = benchmarkPath match {
      case None => near
      case Some(bp) => stage("decontam") {
        val bench = spark.read.parquet(bp).select("doc_id", "text")
        // "bloom" is the fixed-size-bitmap scale path for benchmark /
        // blocklist shingle sets too big to broadcast exactly: it
        // over-flags only (maybe_frac >= the exact contamination), so
        // the kept set is a SUBSET of exact-mode's — the safe direction
        // for decontamination (spec-pinned in CurateSpec).
        val keep = decontamMode match {
          case "bloom" => Curation.bloomContamination(near, bench, shingleN)
            .filter(col("maybe_frac") <= maxContam)
          case _ => Curation.contaminationScores(near, bench, shingleN)
            .filter(col("contamination") <= maxContam)
        }
        near.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      }
    }

    val curated = stage("split") {
      decontam.withColumn("split", TextAnalysis.splitAssign(col("text")))
    }

    val (_, writeSec) = timed {
      curated.write.mode(SaveMode.Overwrite).parquet(s"$outDir/curated")
      Curation.packSequences(curated.filter(col("split") === "train"),
        packBudget)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/packed")
    }
    stats("write_pack_sec") = writeSec
    stats.toMap
  }

  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val outDir = args(1)
    val benchmark = args.lift(2).filter(_ != "-")
    val jaccardT = args.lift(3).map(_.toDouble).getOrElse(0.8)
    val maxContam = args.lift(4).map(_.toDouble).getOrElse(0.2)
    val packBudget = args.lift(5).map(_.toLong).getOrElse(512L)
    val decontamMode = args.lift(6).getOrElse("exact")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        graft.SessionTuning.autoShufflePartitions(docsPath, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = run(spark, docsPath, outDir, benchmark, jaccardT,
      maxContam, packBudget, decontamMode = decontamMode)
    val fields = stats.map { case (k, v) =>
      val vs = if (k.endsWith("_docs")) v.toLong.toString
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      s""""$k":$vs"""
    }
    println(fields.mkString("{", ",", "}"))
    spark.stop()
  }
}
