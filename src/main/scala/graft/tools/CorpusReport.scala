package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Bpe, Curation, Dedup, LangNb, TextAnalysis}

/** The corpus DATA CARD — the one-page report a data team ships with a
  * training corpus, composed entirely from the engine's oracle-gated
  * operators: volume (docs / words / chars / BPE tokens), source and
  * language mix, quality (gate pass rate, repetition, CCNet buckets),
  * duplication (exact groups, near-dup groups, dup-span words), and a
  * context-window packing estimate. One pass per family over the
  * corpus; every number is the operator's own output, so the card is
  * reproducible query by query.
  *
  * ```
  * runMain graft.tools.CorpusReport <docs.parquet> <outDir> \
  *     [merges=32] [packBudget=1024] [jaccardT=0.8]
  * ```
  *
  * Writes `outDir/report.json` and prints the same JSON line.
  */
object CorpusReport {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CorpusReport <docs.parquet> <outDir> " +
      "[merges=32] [packBudget=1024] [jaccardT=0.8]")
    val docsPath = args(0)
    val outDir = args(1)
    val flags = args.drop(2).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val merges = flags.getOrElse("merges", "32").toInt
    val packBudget = flags.getOrElse("packBudget", "1024").toLong
    val jaccardT = flags.getOrElse("jaccardT", "0.8").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning.autoConfs(docsPath, cpus.toInt)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val json = build(spark, docsPath, merges, packBudget, jaccardT)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(outDir))
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$outDir/report.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    println(json)
    spark.stop()
  }

  /** Builds the card; factored for the spec. */
  def build(spark: SparkSession, docsPath: String, merges: Int,
      packBudget: Long, jaccardT: Double): String = {
    val docs = spark.read.parquet(docsPath)
      .select("doc_id", "text", "source").localCheckpoint()

    // ---- volume
    val vol = docs.agg(
      count(lit(1)), countDistinct(col("source")),
      sum(TextAnalysis.tokenCount(col("text"))),
      sum(length(col("text")).cast("long"))).head()
    val (nDocs, nSources, nWords, nChars) =
      (vol.getLong(0), vol.getLong(1), vol.getLong(2), vol.getLong(3))
    val vocab = Bpe.train(docs, merges)
    val nTokens = Bpe.tokenSum(docs, vocab)

    // ---- source mix (top 10 by docs)
    val srcMix = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("source")).limit(10).collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").mkString(",")

    // ---- language mix (NB self-trained argmax labels)
    val langMix = LangNb.classifySelfTrained(docs)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("label")).collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").mkString(",")

    // ---- quality
    val q = docs.agg(
      sum(TextAnalysis.qualityOk(col("text")).cast("long")),
      avg(TextAnalysis.repetitionRatio(col("text"), 3))).head()
    val (qPass, repMean) = (q.getLong(0), q.getDouble(1))
    val buckets = Curation.ccnetBuckets(docs)
      .groupBy("bucket").agg(count(lit(1)).as("n")).collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted
      .mkString(",")

    // ---- duplication
    val exactGroups = Dedup.exact(docs)
    val ex = exactGroups.agg(count(lit(1)),
      sum(col("group_size") - 1L)).head()
    val (nDistinctTexts, nExactDupDocs) = (ex.getLong(0), ex.getLong(1))
    val pairs = Dedup.jaccardPairsPrefix(docs, 3, jaccardT)
    val groups = Dedup.resolveDupGroups(docs, pairs)
    val nearDupDocs = groups.filter(col("doc_id") =!= col("canonical_id"))
      .count()

    // ---- packing estimate (context windows at packBudget tokens)
    val bins = Curation.packSequencesFrom(
        docs.select(col("source").as("shard"), col("doc_id"))
          .join(Bpe.docTokenCounts(docs, vocab), Seq("doc_id"))
          .select(col("shard"), col("doc_id"), col("n_tokens")),
        packBudget)
      .select(col("shard"), col("bin")).distinct().count()

    def j(d: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    s"""{"corpus":"$docsPath","docs":$nDocs,"sources":$nSources,""" +
      s""""words":$nWords,"chars":$nChars,""" +
      s""""bpe_merges":${vocab.size},"bpe_tokens":$nTokens,""" +
      s""""source_mix":{$srcMix},"lang_mix":{$langMix},""" +
      s""""quality_pass":$qPass,"quality_pass_frac":${j(
        qPass.toDouble / nDocs)},""" +
      s""""repetition_mean":${j(repMean)},"ccnet_buckets":{$buckets},""" +
      s""""distinct_texts":$nDistinctTexts,""" +
      s""""exact_dup_docs":$nExactDupDocs,"near_dup_docs":$nearDupDocs,""" +
      s""""pack_budget":$packBudget,"pack_bins":$bins}"""
  }
}
