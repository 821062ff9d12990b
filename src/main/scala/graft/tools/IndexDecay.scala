package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Measures standing-index APPEND DECAY and its compaction recovery
  * (round-14 VERDICT "what's wrong" #1 / ask #2): [[Dedup.writeIndex]]
  * lays the three relations out range-partitioned + sorted, but every
  * [[Dedup.appendToIndex]] adds unsorted delta files and duplicate
  * keys — so gate cost after N hourly appends, and whether
  * [[Dedup.compactIndex]] actually restores the pristine cost, is the
  * first thing an operator of a 100 TB ingest asks.
  *
  * ```
  * runMain graft.tools.IndexDecay <corpusDir> <indexDir> \
  *     [appends=10] [appendDocs=1000] [deltaDocs=5000] [samples=3]
  * ```
  *
  * Protocol: build + persist the index from the (scaled) corpus; gate a
  * FIXED 5k-doc probe delta (min of `samples`, same shape as
  * [[DeltaGate]]); run `appends` appends of `appendDocs` DISTINCT new
  * docs each; gate again; [[Dedup.compactIndex]]; gate again and
  * re-assert the verdicts are IDENTICAL to the pre-compaction gate;
  * finally REBUILD the index from scratch over corpus ∪ appends (the
  * true pristine reference at the post-append size — the index
  * legitimately holds more docs than the fresh phase did) and gate
  * once more. Prints one JSON line with the four gate walls,
  * per-relation file counts before/after compaction, and the
  * compaction wall.
  */
object IndexDecay {

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val indexDir = args(1)
    val appends = args.lift(2).map(_.toInt).getOrElse(10)
    val appendDocs = args.lift(3).map(_.toInt).getOrElse(1000)
    val deltaDocs = args.lift(4).map(_.toInt).getOrElse(5000)
    val samples = args.lift(5).map(_.toInt).getOrElse(3)
    val (n, bands, rows, thr) = (3, 24, 2, 0.5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning.autoConfs(corpusDir, cpus.toInt)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseDocs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet").orderBy("doc_id")
    // Fixed probe delta, ids offset past any scaled corpus id.
    val delta = baseDocs.limit(deltaDocs)
      .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text"))
      .localCheckpoint()
    delta.count()

    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select("doc_id", "text")
    val nCorpus = corpus.count()
    val t0 = System.nanoTime()
    Dedup.writeIndex(Dedup.corpusIndex(corpus, n, bands, rows), indexDir)
    val buildSec = (System.nanoTime() - t0) / 1e9

    def gateOnce(): Double = {
      val g0 = System.nanoTime()
      Dedup.incrementalDedupAgainst(Dedup.readIndex(spark, indexDir),
          delta, n, bands, rows, thr, broadcastDelta = true)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - g0) / 1e9
    }
    def gate(): Double = (1 to samples).map(_ => gateOnce()).min
    def verdicts() =
      Dedup.incrementalDedupAgainst(Dedup.readIndex(spark, indexDir),
        delta, n, bands, rows, thr, broadcastDelta = true)
    def fileCounts(): Map[String, Int] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      Seq("keys", "buckets", "shingles").map { rel =>
        rel -> fs.listStatus(new org.apache.hadoop.fs.Path(s"$indexDir/$rel"))
          .count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
    }

    // Untimed warmup: the three phases run fresh -> appended ->
    // compacted in ONE JVM, so without this the fresh phase alone pays
    // JIT/codegen warmup and the decay reads smaller than it is.
    gateOnce()
    val gateFresh = gate()

    // N appends of DISTINCT new docs (a fresh 2nd-offset id range per
    // append — the hourly-crawl shape; each also duplicates nothing of
    // the probe delta, so gate verdicts stay comparable across phases).
    (0 until appends).foreach { i =>
      val batch = baseDocs.limit((i + 1) * appendDocs)
        .orderBy(col("doc_id").desc).limit(appendDocs)
        .select((col("doc_id") + 2000000000000L + i * 10000000L)
          .as("doc_id"), col("text"))
      Dedup.appendToIndex(indexDir, batch, n, bands, rows)
    }
    val filesBefore = fileCounts()
    val gateAppended = gate()
    val vBefore = verdicts().collect().map(_.toSeq).toSet

    val c0 = System.nanoTime()
    Dedup.compactIndex(spark, indexDir)
    val compactSec = (System.nanoTime() - c0) / 1e9
    val filesAfter = fileCounts()
    val gateCompacted = gate()
    val vAfter = verdicts().collect().map(_.toSeq).toSet
    require(vAfter == vBefore,
      s"compaction changed gate verdicts: ${vBefore.size} vs ${vAfter.size}")

    // The TRUE pristine reference for the compacted gate: a from-scratch
    // writeIndex over corpus ∪ all appended batches — the index now
    // legitimately holds more docs than the fresh phase did, so
    // gate_fresh alone understates how much compaction recovers.
    val appended = (0 until appends).map { i =>
      baseDocs.limit((i + 1) * appendDocs)
        .orderBy(col("doc_id").desc).limit(appendDocs)
        .select((col("doc_id") + 2000000000000L + i * 10000000L)
          .as("doc_id"), col("text"))
    }.reduce(_ union _)
    Dedup.writeIndex(
      Dedup.corpusIndex(corpus.union(appended), n, bands, rows), indexDir)
    val gateRebuilt = gate()
    val vRebuilt = verdicts().collect().map(_.toSeq).toSet
    require(vRebuilt == vBefore,
      s"rebuild changed gate verdicts: ${vBefore.size} vs ${vRebuilt.size}")

    def j(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def jm(m: Map[String, Int]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    println(s"""{"corpus":"$corpusDir","n_corpus":$nCorpus,""" +
      s""""appends":$appends,"append_docs":$appendDocs,""" +
      s""""n_delta":$deltaDocs,"index_build_sec":${j(buildSec)},""" +
      s""""gate_fresh_sec":${j(gateFresh)},""" +
      s""""gate_appended_sec":${j(gateAppended)},""" +
      s""""gate_compacted_sec":${j(gateCompacted)},""" +
      s""""gate_rebuilt_sec":${j(gateRebuilt)},""" +
      s""""compact_sec":${j(compactSec)},""" +
      s""""files_before":${jm(filesBefore)},"files_after":${jm(filesAfter)},""" +
      s""""verdicts_equal":true}""")
    spark.stop()
  }
}
