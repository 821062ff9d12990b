package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Bmp, Hashing, Multimodal, Vid, Wav}
import graft.pipeline.Multimodal.Asset

/** Media-codec scale bench at ASSET VOLUME (round-14 VERDICT "what's
  * wrong" #2 / ask #3): the catalog's p47/p60/p61/p62 rows cost ~0.1 s
  * because the planted per-doc assets are tiny, so nothing measured the
  * codecs at realistic payload sizes. This tool scales BOTH levers —
  * doc count via a [[ScaleUp]]'d directory and payload size via
  * `payloadMult` (image dims ×m per axis, frames-per-video ×m, samples-
  * per-clip ×m·100) — MATERIALIZES the scaled assets to parquet
  * (generation excluded from timing; on a cluster assets live on
  * storage), then times the four decode passes over the parquet:
  *
  *   - `bmp_decode`  — full pixel checksum decode ([[Multimodal.decodeBmpAssets]], p47's codec)
  *   - `bmp_embed`   — decode + 2×2 region-pooled embedding (p22/p47)
  *   - `wav_decode`  — PCM16 full-clip stats ([[Multimodal.decodeWavAssets]], p60)
  *   - `wav_frames`  — framed features ([[Multimodal.wavFrameFeatures]], p61)
  *   - `vid_sample`  — demux-seek stride sampling ([[Multimodal.sampleVideoFrames]], p62)
  *
  * All passes are single narrow mapPartitions over the asset column —
  * the claim under test is that wall scales at-or-below linearly in
  * total payload bytes (a superlinear bend means a buffer/GC issue).
  * Prints one JSON line: asset counts, total payload bytes per
  * modality, and min-of-`runs` seconds per pass.
  *
  * ```
  * runMain graft.tools.MediaScale <sfDir> <scratchDir> [payloadMult=1] [runs=3]
  * ```
  */
object MediaScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val scratch = args(1)
    val m = args.lift(2).map(_.toInt).getOrElse(1)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    require(m >= 1, s"payloadMult must be >= 1, got $m")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning.autoConfs(sfDir, cpus.toInt)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]

    // Scaled generators: same deterministic per-doc geometry as the
    // catalog's planted corpora, every size lever ×m.
    val bmp = ids.mapPartitions(_.map { id =>
      val h = Hashing.h60(id.toString)
      val (w0, h0) = Multimodal.bmpDims(h)
      Asset(id, Bmp.encode(w0 * m, h0 * m, Multimodal.bmpPixel(h)),
        "image/bmp")
    })
    val wav = ids.mapPartitions(_.map { id =>
      val h = Hashing.h60(id.toString)
      val (n0, rate) = Multimodal.wavGeom(h)
      Asset(id, Wav.encode(rate, n0 * m * 100, Multimodal.wavSample(h)),
        "audio/wav")
    })
    val vid = ids.mapPartitions(_.map { id =>
      val h = Hashing.h60(id.toString)
      val (w0, h0) = Multimodal.bmpDims(h)
      val frames = (0 until Multimodal.vidFrames(h) * m).map(f =>
        Bmp.encode(w0, h0, Multimodal.vidFramePixel(h, f)))
      Asset(id, Vid.encode(frames), "video/gvf1")
    })

    def stagePath(name: String) = s"$scratch/assets_$name"
    def stage(name: String, ds: Dataset[Asset]): (Long, Long) = {
      ds.write.mode("overwrite").parquet(stagePath(name))
      val st = spark.read.parquet(stagePath(name))
        .agg(count(lit(1)), sum(length(col("payload")))).head()
      (st.getLong(0), st.getLong(1))
    }
    val (nB, bytesB) = stage("bmp", bmp)
    val (nW, bytesW) = stage("wav", wav)
    val (nV, bytesV) = stage("vid", vid)

    def assetsOf(name: String): Dataset[Asset] =
      spark.read.parquet(stagePath(name)).as[Asset]
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val passes: Seq[(String, () => Unit)] = Seq(
      "bmp_decode" -> (() =>
        noop(Multimodal.decodeBmpAssets(assetsOf("bmp")).toDF())),
      "bmp_embed" -> (() =>
        noop(Multimodal.embedAssets(assetsOf("bmp"), 2).toDF())),
      "wav_decode" -> (() =>
        noop(Multimodal.decodeWavAssets(assetsOf("wav")).toDF())),
      "wav_frames" -> (() =>
        noop(Multimodal.wavFrameFeatures(assetsOf("wav"), 8).toDF())),
      "vid_sample" -> (() =>
        noop(Multimodal.sampleVideoFrames(assetsOf("vid"), 2).toDF())))
    // warmup once (JIT/codegen), then min of runs
    passes.foreach(_._2())
    val mins = passes.map { case (name, f) =>
      name -> (1 to runs).map(_ => time(f())).min
    }
    def j(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val times = mins.map { case (k, v) => s""""$k":${j(v)}""" }.mkString(",")
    println(s"""{"sf":"$sfDir","payload_mult":$m,"n_assets":$nB,""" +
      s""""bmp_bytes":$bytesB,"wav_bytes":$bytesW,"vid_bytes":$bytesV,""" +
      s"""$times}""")
    spark.stop()
  }
}
