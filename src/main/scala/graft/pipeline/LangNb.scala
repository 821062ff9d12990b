package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained character-n-gram Naive Bayes language classifier —
  * the public-knowledge ancestor of fastText's language ID (Cavnar &
  * Trenkle 1994 n-gram categorization + multinomial NB): per-language
  * character-n-gram counts with Laplace smoothing, per-document argmax
  * of summed log-probabilities plus a class prior.
  *
  * All log-probabilities are quantized to integer micro-nats BEFORE
  * summation (`floor(1e6 * ln(p))` — the [[TextAnalysis.unigramQuality]]
  * fixed-point policy), so per-doc scores are order-independent integer
  * sums both engines agree on bit-for-bit, and the argmax (`score desc,
  * label asc`) is fully deterministic.
  *
  * Training labels come from wherever the caller has them — a labeled
  * seed corpus, or distant supervision from the
  * [[TextAnalysis.languageId]] stopword heuristic
  * ([[classifySelfTrained]]): the heuristic's crude split bootstraps a
  * model that scores EVERY character of a document instead of only its
  * function words.
  *
  * Scale shape: gram extraction is a narrow per-doc map; the model is
  * vocabulary-sized (distinct grams × labels — bounded by alphabet^n ×
  * languages, broadcastable at any corpus size); classification is one
  * map-side-combinable `(doc, gram)` aggregate joined against the
  * model and one per-doc argmax over `labels` rows. Nothing is ever
  * corpus × corpus.
  */
object LangNb {

  /** The trained model: `gramLp (gram, label, lp)` — Laplace-smoothed
    * integer micro-nat log-likelihoods, DENSE over (training vocab ×
    * labels); `priors (label, lp0)` — micro-nat class log-priors.
    */
  final case class Model(gramLp: DataFrame, priors: DataFrame)

  /** Character n-grams of lowered text (positions 1..len-n+1); empty
    * for docs shorter than n. Backed by the native one-pass
    * [[graft.functions.CharGrams]] expression — the interpreted
    * `substr`-per-position composite this wrapped through round 17 was
    * O(len²) per document (`substr` re-seeks UTF8 char boundaries from
    * byte 0 on every call) and was the measured dominator of the 30x
    * data card's lang_mix stage; see the expression's scaladoc.
    */
  def charGrams(text: Column, n: Int): Column =
    graft.functions.CharGrams(text, n)

  /** `(doc_id, gram)` occurrence rows — the corpus-sized path, through
    * the native one-pass [[graft.functions.CharGrams]] kernel (O(len)
    * per document and codegen-resident; the interpreted
    * `substr`-per-position composite was the measured dominator of the
    * 30x data card's lang_mix stage — see the expression's scaladoc).
    */
  private def grams(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(charGrams(col(textCol), n)).as("gram"))

  /** Per-(doc, gram) occurrence counts — the one corpus-sized pass both
    * training and classification aggregate from.
    */
  private def docGrams(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame =
    grams(docs, n, idCol, textCol)
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("occ"))

  /** Train from a `(doc_id, label)` relation. Laplace smoothing over
    * the TRAINING gram vocabulary: `lp(g, l) = floor(1e6 * ln((cnt+1) /
    * (tot_l + V)))`; grams unseen for a label get the `cnt = 0`
    * smoothed mass (the dense grid row), so no label is ever favored
    * just for having been joined.
    */
  def train(docs: DataFrame, labels: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): Model = {
    val lab = labels.select(col("doc_id"), col("label"))
    val dg = docGrams(docs, n, idCol, textCol)
    val gl = dg.join(lab, Seq("doc_id"))
      .groupBy("gram", "label").agg(sum("occ").as("cnt"))
    val labs = lab.select("label").distinct()
    val tot = gl.groupBy("label").agg(sum("cnt").as("tot"))
    val voc = dg.agg(countDistinct(col("gram")).as("v"))
    val dense = dg.select("gram").distinct()
      .crossJoin(broadcast(labs))
      .crossJoin(broadcast(voc))
      .join(broadcast(tot), Seq("label"), "left")
      .join(gl, Seq("gram", "label"), "left")
      .select(col("gram"), col("label"),
        floor(log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("tot"), lit(0L)) + col("v")).cast("double"))
          * lit(1000000d)).cast("long").as("lp"))
    val nd = lab.agg(count(lit(1)).as("n"))
    val priors = lab.groupBy("label").agg(count(lit(1)).as("nl"))
      .crossJoin(broadcast(nd))
      .select(col("label"),
        floor(log(col("nl").cast("double") / col("n").cast("double"))
          * lit(1000000d)).cast("long").as("lp0"))
    Model(dense, priors)
  }

  /** Score and argmax-classify `docs` under a trained model. Grams
    * outside the training vocabulary are ignored (standard multinomial
    * NB practice — smoothing mass exists only over the trained grid).
    * Output: `(doc_id, label, score_micro)` — one row per doc, ties
    * broken (score desc, label asc). Docs with no in-vocabulary grams
    * fall back to the prior argmax.
    */
  def classify(docs: DataFrame, model: Model, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The gram stream NEVER shuffles: each raw (doc_id, gram)
    // occurrence probes the broadcast (training vocab x labels) grid
    // directly — the inner join drops OOV grams map-side (subsuming
    // the round-17 OOV semi-join) — and the per-(doc, label) sum is
    // map-side-combined down to labels-many partial rows per doc per
    // partition before the ONLY corpus-sized exchange. The previous
    // shape paid a full (doc_id, gram) string-keyed shuffle aggregate
    // first, whose sole purpose was shrinking a join that broadcast
    // probing makes cheap anyway; summing lp per occurrence equals
    // sum(occ * lp), so scores are bit-identical (order-independent
    // integer micro-nat sums). On the 30x card corpus this halved the
    // dominant lang_mix stage. The grid is broadcastable by the
    // model's own scale contract; never let a missing-stats parquet
    // read plan it as the shuffled side.
    val ds = grams(docs, n, idCol, textCol)
      .join(broadcast(model.gramLp), Seq("gram"))
      .groupBy("doc_id", "label").agg(sum(col("lp")).as("gsum"))
    val scored = docs.select(col(idCol).as("doc_id"))
      .crossJoin(broadcast(model.priors))
      .join(ds, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (col("lp0") + coalesce(col("gsum"), lit(0L))).as("score_micro"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("label"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("doc_id", "label", "score_micro")
  }

  /** Distant supervision end to end: label every doc with the
    * [[TextAnalysis.languageId]] stopword heuristic, train NB on those
    * labels, re-classify the same corpus with the full character
    * model — `p64_lang_nb`'s operator semantics. A standing corpus
    * persists the model once ([[saveModel]]) and re-classifies with
    * [[classifyPersisted]] instead of re-training per call.
    */
  def classifySelfTrained(docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val labels = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.languageId(col(textCol)).as("label"))
    classify(docs, train(docs, labels, n, idCol, textCol), n, idCol, textCol)
  }

  // ------------------------------------------------ model persistence

  /** The parameters a persisted model was trained with — `params.json`
    * next to the two relations, validated on load: classifying with a
    * different gram size than the model's grid silently scores nothing
    * (no gram ever joins), so a mismatch must fail loudly. Same
    * lifecycle as [[Dedup.IndexParams]].
    */
  final case class ModelParams(n: Int, labels: Seq[String]) {
    // The json round-trip below splits on commas and strips bare
    // quotes — safe only for identifier-shaped labels. Enforce at
    // SERIALIZATION time (the save/train path), not construction: a
    // model persisted before this rule existed may carry other
    // punctuation (e.g. a dot) and must still LOAD — parse() warns
    // instead (round-17 ADVICE). A label with a comma/quote/bracket
    // would serialize to JSON that parse() silently mis-reads.
    def json: String = {
      labels.foreach(l => require(ModelParams.labelOk(l),
        s"LangNb label '$l' must match [A-Za-z0-9_.-]+ — the params.json " +
          "round-trip does not escape, so it would corrupt the file"))
      s"""{"n":$n,"labels":[${labels.map(l => s""""$l"""").mkString(",")}]}"""
    }
    def requireMatches(n: Int, what: String): Unit =
      require(this.n == n,
        s"$what with gram size n=$n but the persisted model was trained " +
          s"with n=${this.n} — no gram would ever join the model grid, " +
          "so every document would silently fall back to the prior argmax")
  }

  object ModelParams {
    private[pipeline] def labelOk(l: String): Boolean =
      l.nonEmpty && l.forall(c => c.isLetterOrDigit || c == '_' ||
        c == '-' || c == '.')
    private val Pat = """\{"n":(\d+),"labels":\[([^\]]*)\]\}""".r
    def parse(json: String): ModelParams = json.trim match {
      case Pat(n, ls) =>
        val labels = ls.split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
        // Accept-and-warn on load: a pre-rule persisted model must
        // still round-trip; only NEW saves enforce the charset.
        labels.filterNot(labelOk).foreach(l =>
          org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
            s"persisted LangNb label '$l' is outside [A-Za-z0-9_.-]+ — " +
              "loading as-is, but the unescaped params.json round-trip " +
              "may have mangled it; re-save to normalize"))
        ModelParams(n.toInt, labels)
      case other => throw new IllegalArgumentException(
        s"unparseable LangNb model params.json: $other")
    }
  }

  private def paramsPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/params.json")

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Persist a trained model: `gram_lp` range-partitioned + sorted on
    * the probe key (`gram` — the column classification joins on, so
    * row-group min/max stats are tight), `priors` (labels-sized), and
    * `params.json` written LAST (a params.json implies the relations
    * are complete; any pre-existing one is deleted FIRST so an
    * interrupted overwrite reads as absent, never as validated-current
    * — the [[Dedup.writeIndex]] crash-safety convention).
    */
  def saveModel(model: Model, n: Int, path: String): Unit = {
    val spark = model.gramLp.sparkSession
    fsOf(spark, path).delete(paramsPath(path), false)
    model.gramLp.repartitionByRange(col("gram"), col("label"))
      .sortWithinPartitions("gram", "label")
      .write.mode("overwrite").parquet(s"$path/gram_lp")
    model.priors.repartition(1).write.mode("overwrite")
      .parquet(s"$path/priors")
    val labels = model.priors.select("label").collect()
      .map(_.getString(0)).sorted.toSeq // labels-sized collect
    val out = fsOf(spark, path).create(paramsPath(path), true)
    try out.write(ModelParams(n, labels).json
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted model with its params. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String)
      : (Model, ModelParams) = {
    val fs = fsOf(spark, path)
    require(fs.exists(paramsPath(path)),
      s"no params.json under $path — not a saveModel-persisted LangNb model")
    val in = fs.open(paramsPath(path))
    val p = try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
      ModelParams.parse(new String(bytes.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
    (Model(spark.read.parquet(s"$path/gram_lp"),
      spark.read.parquet(s"$path/priors")), p)
  }

  /** Classify against a persisted model — gram size comes FROM the
    * model's own params, never from a caller flag that could drift.
    */
  def classifyPersisted(docs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (model, p) = loadModel(docs.sparkSession, path)
    classify(docs, model, p.n, idCol, textCol)
  }
}
