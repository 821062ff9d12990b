package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingOps

/** Decompose s11_stream_join's wall (round-18 VERDICT ask #6): how much
  * of the stream-stream interval join's catalog cost is Structured
  * Streaming SESSION machinery (source listing, micro-batch planning,
  * state-store setup, sink commit) versus actual JOIN work?
  *
  * Routes, each warmup + min-of-`runs` in ONE session (the catalog's
  * measurement convention):
  *
  *   - `batch_join`      — the SAME join of the SAME staged inputs as a
  *                         plain batch query: the pure join-work floor.
  *   - `one_source`      — stateless single-source passthrough drain:
  *                         the minimal streaming-session fixed cost.
  *   - `two_source`      — stateless two-source (union) drain: fixed
  *                         cost with both sources' listing/planning.
  *   - `stream_join`     — the s11 operator itself
  *                         ([[StreamingOps.intervalJoin]]), single
  *                         micro-batch (all files in one trigger).
  *   - `stream_join_kb`  — same with `maxFilesPerTrigger=1` over
  *                         `files` staged files per side: the per-
  *                         micro-batch slope ((kb - 1b) / (batches-1))
  *                         prices each extra micro-batch of the JOIN
  *                         route (state round-trips included). Emitted
  *                         row counts are reported per route — the
  *                         multi-batch route can legitimately emit
  *                         fewer rows (random file split + watermark
  *                         advance drops late rows), it prices
  *                         machinery, not parity (the catalog's s11
  *                         single-batch drain IS the parity shape).
  *
  * Usage:
  *   runMain graft.tools.StreamJoinDecompose <sfDir> [files=4] [runs=3]
  *
  * Prints one JSON line with per-route min/median seconds, emitted
  * rows, micro-batch counts, and the derived fixed-vs-slope split.
  */
object StreamJoinDecompose {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: StreamJoinDecompose <sfDir> [files] [runs] [parts=<n>]")
    val sfDir = args(0)
    val flags = args.drop(1).filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v }.toMap
    val pos = args.drop(1).filterNot(_.contains("="))
    val files = pos.lift(0).map(_.toInt).getOrElse(4)
    val runs = pos.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // parts= overrides shuffle partitions — stream-stream join state
    // stores scale with it (4 stores x partitions), so this knob
    // isolates per-state-partition overhead from real join work.
    val conf0 = graft.SessionTuning.autoConfs(sfDir, cpus.toInt) ++
      flags.get("parts").map("spark.sql.shuffle.partitions" -> _)
    val spark = conf0
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("sjd").toString
    val ev = graft.Tables.normalizeEventTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/p1")
    ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"), col("value").as("v_value"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/v1")
    spark.read.parquet(s"$base/p1").repartition(files)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/pk")
    spark.read.parquet(s"$base/v1").repartition(files)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/vk")

    // maxFilesPerTrigger is a SOURCE option: 1 file per micro-batch on
    // the k-file staging exercises cross-batch join state.
    def readP(dir: String, onePerTrigger: Boolean = false) = {
      val r = spark.readStream
        .schema("p_id BIGINT, user_id BIGINT, p_ts TIMESTAMP")
      (if (onePerTrigger) r.option("maxFilesPerTrigger", "1") else r)
        .parquet(dir)
    }
    def readV(dir: String, onePerTrigger: Boolean = false) = {
      val r = spark.readStream
        .schema("v_id BIGINT, v_user BIGINT, v_ts TIMESTAMP, v_value DOUBLE")
      (if (onePerTrigger) r.option("maxFilesPerTrigger", "1") else r)
        .parquet(dir)
    }

    /** Drain `df` through a noop sink (fresh checkpoint per run so every
      * run replays all files); returns (sec, rows, microBatches).
      */
    def drain(df: DataFrame): (Double, Long, Long) = {
      val ckpt = java.nio.file.Files.createTempDirectory("sjd-ck").toString
      val t0 = System.nanoTime()
      val q = df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress
      (sec, progs.map(_.sink.numOutputRows).filter(_ > 0).sum,
        progs.count(_.numInputRows > 0).toLong)
    }

    def measure(f: => (Double, Long, Long)): (Double, Double, Long, Long) = {
      f // warmup
      val samples = (1 to runs).map(_ => f)
      val secs = samples.map(_._1).sorted
      (secs.head, secs(secs.length / 2), samples.head._2, samples.head._3)
    }

    def joined(p: DataFrame, v: DataFrame): DataFrame =
      StreamingOps.intervalJoin(p, v, "user_id", "v_user", "p_ts", "v_ts",
        "1 HOUR", "1 hour")

    val batch = measure {
      val t0 = System.nanoTime()
      val n = spark.read.parquet(s"$base/p1").as("p")
        .join(spark.read.parquet(s"$base/v1").as("v"),
          expr("user_id = v_user AND " +
            "v_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts")).count()
      ((System.nanoTime() - t0) / 1e9, n, 1L)
    }
    val oneSource = measure {
      drain(readP(s"$base/p1").select("p_id"))
    }
    val twoSource = measure {
      drain(readP(s"$base/p1").select(col("p_id").as("id"))
        .union(readV(s"$base/v1").select(col("v_id").as("id"))))
    }
    val join1 = measure {
      drain(joined(readP(s"$base/p1"), readV(s"$base/v1")))
    }
    val joinK = measure {
      drain(joined(readP(s"$base/pk", onePerTrigger = true),
        readV(s"$base/vk", onePerTrigger = true)))
    }

    def j(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def row(name: String, m: (Double, Double, Long, Long)) =
      s""""$name":{"min":${j(m._1)},"median":${j(m._2)},""" +
        s""""rows":${m._3},"batches":${m._4}}"""
    val slope =
      if (joinK._4 > join1._4)
        (joinK._1 - join1._1) / (joinK._4 - join1._4).toDouble
      else 0.0
    println(s"""{"tool":"streamjoindecompose","sf":"$sfDir",""" +
      s""""files":$files,"runs":$runs,""" +
      Seq(row("batch_join", batch), row("one_source", oneSource),
        row("two_source", twoSource), row("stream_join", join1),
        row("stream_join_kb", joinK)).mkString(",") +
      s""","per_batch_slope_sec":${j(slope)},""" +
      s""""fixed_over_join_work":${j(join1._1 - batch._1)}}""")
    spark.stop()
  }
}
