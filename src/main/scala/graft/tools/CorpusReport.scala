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
  *     [merges=32] [packBudget=1024] [jaccardT=0.8] \
  *     [tokens=bpe:<vocabDir>] [langModel=<modelDir>] [groups=<dir>]
  * ```
  *
  * `tokens=bpe:` / `langModel=` pin the card to PERSISTED artifacts
  * ([[graft.tools.BpeTrain]] / [[LangNb.saveModel]]): the token and
  * language denominations then stay comparable card to card instead of
  * drifting with per-card retraining, and the card run prices
  * classification/replay — the recurring cost — not training (round-15
  * VERDICT ask #2). Without the flags the card self-trains both (the
  * exploratory mode).
  *
  * `groups=<dir>` pins the NEAR-DUP stat the same way (round-16 VERDICT
  * ask #6): the [[Curate]] `outDir/groups` artifact
  * `(doc_id, group_id, is_canonical)` is read instead of re-resolving
  * transitive near-dup groups in-card — the card's dominant cost at
  * scale. The artifact's doc set is the corpus the groups were resolved
  * over (Curate's post-exact-dedup relation); `dup_groups_src` records
  * the provenance, and CorpusReportSpec pins artifact == a fresh
  * resolve over that same corpus.
  *
  * Writes `outDir/report.json` and prints the same JSON line.
  */
object CorpusReport {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CorpusReport <docs.parquet> <outDir> " +
      "[merges=32] [packBudget=1024] [jaccardT=0.8] " +
      "[tokens=bpe:<vocabDir>] [langModel=<modelDir>] [groups=<dir>]")
    val docsPath = args(0)
    val outDir = args(1)
    val flags = args.drop(2).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val merges = flags.getOrElse("merges", "32").toInt
    val packBudget = flags.getOrElse("packBudget", "1024").toLong
    val jaccardT = flags.getOrElse("jaccardT", "0.8").toDouble
    val bpeVocabDir = flags.get("tokens").map { v =>
      require(v.startsWith("bpe:") && v.length > 4,
        s"tokens flag must be bpe:<vocab dir>, got '$v'")
      v.stripPrefix("bpe:")
    }
    val langModelDir = flags.get("langModel")
    val dupGroupsDir = flags.get("groups")
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

    val t0 = System.nanoTime()
    val built = build(spark, docsPath, merges, packBudget, jaccardT,
      bpeVocabDir, langModelDir, dupGroupsDir)
    val wall = (System.nanoTime() - t0) / 1e9
    // Wall is measured OUTSIDE build (session setup excluded, all card
    // queries included) and spliced into the JSON so scale rows don't
    // need external timing.
    val json = built.stripSuffix("}") +
      s""","wall_sec":${String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(wall))}}"""
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

  /** Builds the card; factored for the spec. `bpeVocabDir` /
    * `langModelDir` pin the token and language denominations to
    * persisted artifacts (loaded, never retrained); `None` self-trains.
    */
  def build(spark: SparkSession, docsPath: String, merges: Int,
      packBudget: Long, jaccardT: Double,
      bpeVocabDir: Option[String] = None,
      langModelDir: Option[String] = None,
      dupGroupsDir: Option[String] = None): String = {
    val docs = spark.read.parquet(docsPath)
      .select("doc_id", "text", "source").localCheckpoint()
    // Per-family stage walls, spliced into the JSON — the card's cost
    // must be attributable (round-17: the "near-dup resolve dominates"
    // hypothesis was WRONG at 30x; the measured dominator was the
    // doubled BPE token accounting, fixed below).
    val stageSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
    def staged[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      stageSecs(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // ---- volume
    val vol = docs.agg(
      count(lit(1)), countDistinct(col("source")),
      sum(TextAnalysis.tokenCount(col("text"))),
      sum(length(col("text")).cast("long"))).head()
    // An empty corpus has no card: every downstream fraction divides by
    // nDocs (NaN is invalid JSON) and avg() aggregates return NULL — fail
    // with a clear message instead (round-15 ADVICE).
    require(!vol.isNullAt(0) && vol.getLong(0) > 0,
      s"CorpusReport: no documents at $docsPath — nothing to report on")
    val (nDocs, nSources, nWords, nChars) =
      (vol.getLong(0), vol.getLong(1), vol.getLong(2), vol.getLong(3))
    val vocab = staged("bpe_vocab") { bpeVocabDir match {
      case Some(p) => Bpe.loadVocab(spark, p)
      case None => Bpe.train(docs, merges)
    } }
    // ONE per-doc token relation serves both the volume total and the
    // packing estimate below — the card previously replayed the vocab
    // over the corpus twice (tokenSum + docTokenCounts), and that
    // doubled accounting, not the dup resolve, dominated the 30x card.
    val docToks = staged("bpe_doc_tokens") {
      val dt = Bpe.docTokenCounts(docs, vocab).localCheckpoint()
      dt.count()
      dt
    }
    val nTokens = docToks.agg(coalesce(sum("n_tokens"), lit(0L)))
      .head().getLong(0)

    // ---- source mix (top 10 by docs)
    val srcMix = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("source")).limit(10).collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").mkString(",")

    // ---- language mix (NB argmax labels — persisted model when
    // pinned, self-trained otherwise)
    val langMix = staged("lang_mix") { langModelDir
      .map(p => LangNb.classifyPersisted(docs, p))
      .getOrElse(LangNb.classifySelfTrained(docs))
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("label")).collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").mkString(",") }

    // ---- quality
    val q = staged("quality") { docs.agg(
      sum(TextAnalysis.qualityOk(col("text")).cast("long")),
      avg(TextAnalysis.repetitionRatio(col("text"), 3))).head() }
    val (qPass, repMean) = (q.getLong(0), q.getDouble(1))
    val buckets = staged("ccnet_buckets") { Curation.ccnetBuckets(docs)
      .groupBy("bucket").agg(count(lit(1)).as("n")).collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted
      .mkString(",") }

    // ---- duplication
    val ex = staged("exact_dedup") { Dedup.exact(docs).agg(count(lit(1)),
      sum(col("group_size") - 1L)).head() }
    val (nDistinctTexts, nExactDupDocs) = (ex.getLong(0), ex.getLong(1))
    // Pinned near-dup stat: the Curate groups artifact replaces the
    // in-card transitive group resolution (pairs + CC — the card's
    // dominant cost at scale). Loud validation: an artifact with the
    // wrong shape must fail, not report 0.
    val (nearDupDocs, dupGroupsDocs) = staged("near_dup") { dupGroupsDir match {
      case Some(p) =>
        val g = spark.read.parquet(p)
        require(g.columns.toSet == Set("doc_id", "group_id", "is_canonical"),
          s"groups artifact at $p has columns ${g.columns.mkString(",")} — " +
            "expected (doc_id, group_id, is_canonical) from Curate")
        // A wrong-corpus or stale artifact must fail loudly, not report
        // a plausible-but-wrong stat (round-17 ADVICE): every doc the
        // artifact references must exist in the card corpus (cheap
        // anti-join — artifact-sized, not corpus²). The artifact's own
        // doc count is recorded in the JSON (`dup_groups_docs`) because
        // Curate resolves groups over its post-quality/post-exact-dedup
        // universe — pinned and in-card stats legitimately differ when
        // those stages bite, and the count makes that visible.
        val agg = g.join(docs.select("doc_id"), Seq("doc_id"), "left_anti")
          .agg(count(lit(1))).head.getLong(0)
        require(agg == 0L,
          s"groups artifact at $p references $agg doc_ids absent from " +
            s"$docsPath — a stale or wrong-corpus artifact; re-run Curate " +
            "over this corpus or drop the groups= flag")
        val c = g.agg(
          coalesce(sum((!col("is_canonical")).cast("long")), lit(0L)),
          count(lit(1))).head
        (c.getLong(0), c.getLong(1))
      case None =>
        val pairs = Dedup.jaccardPairsPrefix(docs, 3, jaccardT)
        (Dedup.resolveDupGroups(docs, pairs)
          .filter(col("doc_id") =!= col("canonical_id")).count(), nDocs)
    } }

    // ---- packing estimate (context windows at packBudget tokens)
    val bins = staged("packing") { Curation.packSequencesFrom(
        docs.select(col("source").as("shard"), col("doc_id"))
          .join(docToks, Seq("doc_id"))
          .select(col("shard"), col("doc_id"), col("n_tokens")),
        packBudget)
      .select(col("shard"), col("bin")).distinct().count() }

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
      s""""pack_budget":$packBudget,"pack_bins":$bins,""" +
      s""""bpe_vocab_src":"${bpeVocabDir.getOrElse("trained-in-card")}",""" +
      s""""lang_model_src":"${langModelDir.getOrElse("self-trained")}",""" +
      s""""dup_groups_src":"${dupGroupsDir.getOrElse("resolved-in-card")}",""" +
      s""""dup_groups_docs":$dupGroupsDocs,""" +
      s""""stage_sec":{${stageSecs.map { case (k, v) =>
        s""""$k":${j(v)}""" }.mkString(",")}}}"""
  }
}
