package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.Bpe

/** Train a BPE vocabulary over a documents table and persist the merge
  * table — the one-time artifact [[Curate]]'s `tokens=bpe:<dir>` mode
  * (and any token-grain consumer) loads.
  *
  * ```
  * runMain graft.tools.BpeTrain <docs.parquet> <vocabDir> [merges=64] \
  *     [encode=on] [trainer=auto|full|delta]
  * ```
  *
  * `trainer=delta` uses the incremental pair-count trainer
  * ([[Bpe.trainIncremental]] — per-round cost bounded by the words a
  * merge actually touches instead of every adjacent pair); merges are
  * byte-identical to the default full re-aggregate trainer, so the
  * saved vocabularies diff empty (BpeDeepSpec pins it; the round-17
  * BASELINE run diffs the two parquet artifacts at 2048 merges).
  *
  * `trainer=auto` (the default) picks by merge count: the measured
  * crossover (BASELINE "BPE trainer crossover", round 17) has the full
  * re-aggregate ~10% faster at <=25k merges (per-round job overhead
  * dominates) and the delta trainer 1.9x faster at 100k — so auto
  * selects delta at [[AutoDeltaThreshold]] (32768) merges and above,
  * making the incremental path the default in the production vocab
  * regime without penalizing small exploratory vocabularies.
  *
  * Prints one JSON line: corpus size, distinct words, merges trained,
  * wall seconds, and the corpus token total under the trained table
  * (the compression the vocabulary buys — word count is the 0-merge
  * upper bound times average word length). `encode=on` additionally
  * times the full token-id SEQUENCE export ([[Bpe.encode]], the
  * heaviest replay consumer) under the trained table — the round-16
  * production-depth measurement (merges=2048 exercises the batched
  * [[Bpe.wordStates]] replay the way a 32k-merge vocabulary would).
  */
object BpeTrain {

  /** Merge count at and above which `trainer=auto` picks the
    * incremental trainer — between the measured 25k (full wins by
    * ~10%) and 100k (delta wins 1.9x) crossover bracket, at the
    * production 32k-vocab point.
    */
  val AutoDeltaThreshold = 32768

  /** `auto` resolves by merge count; explicit flags pass through. */
  private[tools] def selectTrainer(flag: String, numMerges: Int): String =
    if (flag != "auto") flag
    else if (numMerges >= AutoDeltaThreshold) "delta"
    else "full"

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BpeTrain <docs.parquet> <vocabDir> [merges=64] [encode=on]")
    val docsPath = args(0)
    val vocabDir = args(1)
    val numMerges = args.lift(2).map { a =>
      require(a.startsWith("merges="), s"expected merges=<n>, got '$a'")
      a.stripPrefix("merges=").toInt
    }.getOrElse(64)
    val doEncode = args.lift(3).contains("encode=on")
    val trainerFlag = args.lift(4).map { a =>
      require(a.startsWith("trainer="), s"expected trainer=<t>, got '$a'")
      a.stripPrefix("trainer=")
    }.getOrElse("auto")
    require(Seq("auto", "full", "delta").contains(trainerFlag),
      s"trainer must be auto|full|delta, got '$trainerFlag'")
    val trainer = selectTrainer(trainerFlag, numMerges)
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

    val docs = spark.read.parquet(docsPath).select("doc_id", "text")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val merges =
      if (trainer == "delta") Bpe.trainIncremental(docs, numMerges)
      else Bpe.train(docs, numMerges)
    val trainSec = (System.nanoTime() - t0) / 1e9
    Bpe.saveVocab(spark, merges, vocabDir)
    val nWords = Bpe.wordFreqs(docs).count()
    val nTokens = Bpe.tokenSum(docs, merges)
    val encodeJson = if (!doEncode) "" else {
      val e0 = System.nanoTime()
      Bpe.encode(docs, merges)
        .write.mode("overwrite").format("noop").save()
      val encSec = (System.nanoTime() - e0) / 1e9
      s""","encode_sec":${String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(encSec))}"""
    }
    def j(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"docs":"$docsPath","n_docs":$nDocs,"trainer":"$trainer",""" +
      s""""n_distinct_words":$nWords,"merges":${merges.size},""" +
      s""""train_sec":${j(trainSec)},"corpus_tokens":$nTokens$encodeJson,""" +
      s""""vocab":"$vocabDir"}""")
    spark.stop()
  }
}
