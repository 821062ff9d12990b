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
    * for docs shorter than n (guarded — Spark's `sequence` generates
    * DESCENDING ranges when stop < start).
    */
  def charGrams(text: Column, n: Int): Column = {
    val tx = lower(text)
    when(length(tx) >= n,
      transform(sequence(lit(1), length(tx) - (n - 1)),
        i => tx.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-(doc, gram) occurrence counts — the one corpus-sized pass both
    * training and classification aggregate from.
    */
  private def docGrams(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(charGrams(col(textCol), n)).as("gram"))
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
    val dg = docGrams(docs, n, idCol, textCol)
    val ds = dg.join(model.gramLp, Seq("gram"))
      .groupBy("doc_id", "label").agg(sum(col("occ") * col("lp")).as("gsum"))
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
    * model — `p64_lang_nb`'s operator.
    */
  def classifySelfTrained(docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val labels = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.languageId(col(textCol)).as("label"))
    classify(docs, train(docs, labels, n, idCol, textCol), n, idCol, textCol)
  }
}
