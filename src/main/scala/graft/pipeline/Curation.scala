package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * after dedup/quality: benchmark decontamination and sequence packing.
  * Both compose codegen'd primitives ([[Shingles.hashedWordShingles]],
  * window aggregates) — no UDFs, no driver collection.
  */
object Curation {

  /** Benchmark-contamination scores: for every document, the fraction of
    * its distinct hashed word `n`-shingles that occur anywhere in
    * `benchmark` — the standard n-gram-overlap decontamination signal
    * (docs overlapping an eval set must not reach training).
    *
    * Output: `(doc_id, n_sh, n_hits, contamination)` for every input doc
    * (zero-overlap docs included).
    *
    * Scale: the benchmark's distinct shingle set is tiny relative to the
    * corpus (eval suites are few MB against 100 TB) → the semi-join
    * broadcasts; the per-doc hit count is a map-side-combinable agg on
    * an 8-byte key. The corpus text is never shuffled.
    */
  def contaminationScores(docs: DataFrame, benchmark: DataFrame, n: Int,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    def hs(d: DataFrame) = d.select(col("doc_id"),
      Shingles.hashedWordShingles(col("text"), n, mode).as("hs"))
    // ONE shingling pass over the corpus (the dominant narrow-stage cost):
    // n_sh rides along the exploded rows, and a LEFT join against the
    // marked benchmark set counts hits while keeping zero-hit docs —
    // shingling never exceeds the explode fan-out it already pays.
    val docSh = hs(docs).select(col("doc_id"), size(col("hs")).cast("long").as("n_sh"),
      explode(col("hs")).as("h"))
    val benchSet = hs(benchmark).select(explode(col("hs")).as("h")).distinct()
      .withColumn("__hit", lit(1))
    docSh.join(benchSet, Seq("h"), "left")
      .groupBy("doc_id", "n_sh").agg(count(col("__hit")).as("n_hits"))
      .select(col("doc_id"), col("n_sh"), col("n_hits"))
      .withColumn("contamination",
        col("n_hits").cast("double") / col("n_sh").cast("double"))
  }

  /** Concatenate-then-chunk sequence packing: documents of each shard
    * are laid out in `doc_id` order and chunked into fixed `budget`-token
    * context windows; a document's bin is the window its START offset
    * falls in (how packed pretraining data is actually built — documents
    * straddle chunk boundaries rather than leaving tail padding).
    *
    * Output: `(shard, doc_id, n_tokens, start_offset, bin)`.
    *
    * Scale: the running offset is a window sum PARTITIONED BY SHARD —
    * packing is per-shard by construction (as in real pipelines, where
    * each output file is packed independently), so the cumulative sum
    * parallelizes across shards instead of forcing a global total order
    * through one task.
    */
  def packSequences(docs: DataFrame, budget: Long,
      shardCol: String = "source", tokenCount: Column => Column =
        c => TextAnalysis.tokenCount(c)): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(shardCol).as("shard"), col("doc_id"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"start_offset div $budget"))
  }
}
