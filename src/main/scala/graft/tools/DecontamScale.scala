package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** Fixed-benchmark decontamination scale bench (round-14 VERDICT
  * "what's wrong" #3 / ask #4): the catalog's p57/p59 rows derive the
  * benchmark from the SAME directory (`doc_id % 20 = 0`), so their
  * scale rows grow the benchmark with the corpus and only bound the
  * realistic case from above. Real eval suites do NOT grow with the
  * crawl — this tool holds the benchmark at its base-scale size
  * (`benchSfDir`, the 1× slice) while the corpus scales, and times the
  * span-detect (p57 twin) and span-cut (p59 twin) operators.
  *
  * ```
  * runMain graft.tools.DecontamScale <corpusDir> <benchSfDir> [L=4] [runs=3]
  * ```
  *
  * Prints one JSON line: corpus/bench doc counts, detected span rows,
  * and min-of-`runs` seconds for detect and cut.
  */
object DecontamScale {

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val benchSf = args(1)
    val spanL = args.lift(2).map(_.toInt).getOrElse(4)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
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

    // Corpus: the scaled directory's non-benchmark slice (the p57
    // filter, applied at every scale). Benchmark: the BASE directory's
    // benchmark slice, fixed across corpus scales. ScaleUp's copy-0
    // texts are verbatim base texts, so planted leaks exist at every
    // scale while copies k > 0 contribute clean (word-bijected) docs.
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .filter(col("doc_id") % 20 =!= 0).select("doc_id", "text")
      .localCheckpoint()
    val bench = spark.read.parquet(s"$benchSf/documents.parquet")
      .filter(col("doc_id") % 20 === 0).select("doc_id", "text")
      .localCheckpoint()
    val (nCorpus, nBench) = (corpus.count(), bench.count())

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def detect(): Unit =
      noop(Curation.contaminationSpans(corpus, bench, spanL))
    def cut(): Unit =
      noop(Curation.contaminationSpansCut(corpus, bench, spanL))
    detect(); cut() // warmup
    val dMin = (1 to runs).map(_ => time(detect())).min
    val cMin = (1 to runs).map(_ => time(cut())).min
    // contaminationSpans emits one row per INPUT doc (zeros included),
    // so the informative stats are the flagged subset and its volume.
    val st = Curation.contaminationSpans(corpus, bench, spanL)
      .agg(sum(when(col("n_contam_spans") > 0, 1L).otherwise(0L)),
        coalesce(sum("contam_words"), lit(0L))).head()
    val (flagged, contamWords) = (st.getLong(0), st.getLong(1))

    def j(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    println(s"""{"corpus":"$corpusDir","n_corpus":$nCorpus,""" +
      s""""bench":"$benchSf","n_bench":$nBench,"span_l":$spanL,""" +
      s""""flagged_docs":$flagged,"contam_words":$contamWords,""" +
      s""""detect_min_sec":${j(dMin)},"cut_min_sec":${j(cMin)}}""")
    spark.stop()
  }
}
