package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-retrieval operators over the document corpus. First resident:
  * BM25 top-k — the standard lexical ranking function (Robertson et al.,
  * TREC-3; the Lucene-default scoring shape), as a distributed Spark
  * plan over the same tokenizer the rest of the pipeline uses.
  *
  * Determinism policy (same as [[TextAnalysis.tfidfKeywords]] /
  * `unigramQuality`): IDF is quantized to integer micro-nats straight
  * off the `ln`, the tf-saturation fraction is pure rational double
  * arithmetic over integer inputs with an explicit expression shape
  * (IEEE-754 ops are correctly rounded, so Spark and DuckDB produce the
  * same bits), and each term's contribution is floored to an integer
  * BEFORE the per-document sum — so the final score is an
  * order-independent integer sum, bit-identical cross-engine.
  */
object Retrieval {

  /** BM25 top-`k` documents per query.
    *
    * `queries`: `(query_id: long, qtext: string)` — tokenized with the
    * corpus tokenizer; duplicate terms in a query count once (the
    * standard bag-of-DISTINCT-terms form).
    *
    * Per matched (query term, doc): with `N` docs, `T` total corpus
    * tokens, `dl` the doc's token count, `df` the term's document
    * frequency and `tf` its in-doc frequency,
    *
    *   idf_micro = floor(1e6 * ln((2N + 2) / (2df + 1)))     [integer]
    *   frac      = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) [double]
    *   term_score = floor(idf_micro * frac)                   [integer]
    *
    * (the `(2N+2)/(2df+1)` form is the Lucene `ln(1 + (N-df+.5)/(df+.5))`
    * rewritten over integers so the only float entering the expression
    * is the `ln` itself). Document score = SUM of term scores; ranking
    * tie-break `(score desc, doc_id)`.
    *
    * Output: `(query_id, doc_id, score_micro, rank)`, `rank <= k`.
    *
    * Scale: the query-term table is tiny → broadcast-semi-joined into
    * the term-frequency table, so only postings of QUERY terms flow
    * anywhere (the corpus-wide tf/df tables never materialize beyond
    * the one exploded-token aggregate); document length rides the same
    * aggregate via a doc-partitioned window; the final top-k is a
    * per-query `WindowGroupLimit`, never a global sort.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1Milli: Long = 1200L, bMilli: Long = 750L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000,
      s"k1Milli must be >= 0 and bMilli in [0,1000], got $k1Milli/$bMilli")
    // Each constant is produced by ONE correctly-rounded int→double
    // division (never by float addition like `k1 + 1`), so the DuckDB
    // oracle regenerates the identical bits via the same `x / 1000.0`.
    val k1 = k1Milli.toDouble / 1000d
    val k1p1 = (k1Milli + 1000L).toDouble / 1000d
    val b = bMilli.toDouble / 1000d
    val oneMinusB = (1000L - bMilli).toDouble / 1000d

    val tf = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    // Doc length from the SAME tf aggregate (no second corpus pass).
    val tfDl = tf.withColumn("dl",
      sum(col("tf")).over(Window.partitionBy(col("doc_id"))))

    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col("qtext")))).as("word"))

    // Only query-term postings leave the aggregate.
    val posting = tfDl.join(broadcast(qterms.select("word").distinct()),
      Seq("word"), "left_semi")
    val df = posting.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(
      countDistinct(col(idCol)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol))).as("t_tokens"))

    val scored = posting
      .join(broadcast(qterms), Seq("word"))
      .join(broadcast(df), Seq("word"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        floor(log((lit(2d) * col("n_docs") + lit(2d)) /
          (lit(2d) * col("df") + lit(1d))) * 1e6).cast("long"))
      .withColumn("frac",
        (col("tf") * lit(k1p1)) /
          (col("tf") + lit(k1) * (lit(oneMinusB) + lit(b) *
            (col("dl").cast("double") *
              (col("n_docs").cast("double") / col("t_tokens").cast("double"))))))
      .withColumn("term_score",
        floor(col("idf_micro").cast("double") * col("frac")).cast("long"))

    val byDoc = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    byDoc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
