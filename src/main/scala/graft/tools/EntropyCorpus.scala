package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic HIGH-ENTROPY corpus generator — the BPE-training
  * stress fixture (round-16 VERDICT asks #3/#5). The ScaleUp corpora
  * cannot exercise production tokenizer regimes: their word-bijected
  * vocabulary is tiny (310/930 distinct words at 10x/30x), so training
  * exhausts after a few hundred merges and every vocabulary-sized cost
  * term looks free. This tool emits a corpus with `nWords` distinct
  * pseudo-random words (lengths 10-17, hash-derived characters — near-
  * unique letter sequences, so each merge collapses only a handful of
  * positions and training sustains tens of thousands of rounds) spread
  * over `nDocs` documents of `wordsPerDoc` hash-sampled occurrences.
  *
  * ```
  * runMain graft.tools.EntropyCorpus <outDir> \
  *     [nWords=5000] [nDocs=50000] [wordsPerDoc=100]
  * ```
  *
  * Writes `<outDir>/documents.parquet` `(doc_id, text, source)`.
  * Everything is xxhash64-derived from (ids, positions) — no RNG, the
  * same arguments always regenerate the identical corpus — and pure
  * column algebra over `spark.range` (the [[PlantedCorpus]] pattern):
  * the vocabulary relation is `nWords` rows, the occurrence relation
  * `nDocs x wordsPerDoc` rows joined to it by word id, one per-doc
  * ordered aggregate — no driver-side arrays at any scale.
  */
object EntropyCorpus {

  // Mask to non-negative instead of abs(): abs(Long.MinValue) stays
  // negative (2^-64 per hash, but then chr(97 + h % 26) emits a
  // non-letter and (h % nWords) a wid that joins nothing).
  private def h(tag: String, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(lit(tag), a, b).bitwiseAND(lit(Long.MaxValue))

  /** The `nWords`-row vocabulary relation `(wid, word)`. */
  def vocabulary(spark: SparkSession, nWords: Long): DataFrame =
    spark.range(nWords).select(col("id").as("wid"))
      .withColumn("word",
        concat_ws("", transform(
          sequence(lit(0), (h("len", col("wid"), lit(0L)) % 8).cast("int") + 9),
          i => chr(lit(97) + h("chr", col("wid"), i.cast("long")) % 26))))

  def generate(spark: SparkSession, nWords: Long, nDocs: Long,
      wordsPerDoc: Int): DataFrame = {
    require(nWords >= 26 && nDocs >= 1 && wordsPerDoc >= 1)
    val vocab = vocabulary(spark, nWords)
    val occ = spark.range(nDocs).select(col("id").as("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(wordsPerDoc - 1))).as("p"))
      .select(col("doc_id"), col("p"),
        (h("w", col("doc_id"), col("p")) % nWords).as("wid"))
    occ.join(vocab, Seq("wid"))
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("p"), col("word")))),
        s => s.getField("word")), " ").as("text"))
      .withColumn("source", lit("entropy"))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val nWords = args.lift(1).map { a =>
      require(a.startsWith("nWords="), s"expected nWords=<n>, got '$a'")
      a.stripPrefix("nWords=").toLong
    }.getOrElse(5000L)
    val nDocs = args.lift(2).map { a =>
      require(a.startsWith("nDocs="), s"expected nDocs=<n>, got '$a'")
      a.stripPrefix("nDocs=").toLong
    }.getOrElse(50000L)
    val wordsPerDoc = args.lift(3).map { a =>
      require(a.startsWith("wordsPerDoc="),
        s"expected wordsPerDoc=<n>, got '$a'")
      a.stripPrefix("wordsPerDoc=").toInt
    }.getOrElse(100)
    val spark = graft.Hgn.session("graft-entropy",
      Map("spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, nWords, nDocs, wordsPerDoc)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    // Distinct-word count as GENERATED (hash collisions on short
    // lengths can merge a few surface forms; report the real number).
    val real = spark.read.parquet(s"$outDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    println(s"""{"tool":"entropy","n_words_requested":$nWords,""" +
      s""""n_distinct_words":$real,"n_docs":$nDocs,""" +
      s""""words_per_doc":$wordsPerDoc,"out":"$outDir"}""")
    spark.stop()
  }
}
