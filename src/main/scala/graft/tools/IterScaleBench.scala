package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{Betweenness, RMetrics}
import graft.queries.{GraphQueries, SessionCache}

/** Fresh-operator scale bench for the HGN iteration family (VERDICT
  * round 6 "Next round" #2): the catalog's g03/g04 entries read the
  * session-cached shared intermediates by design (the catalog measures
  * each operator's MARGINAL plan; the shared derived-graph chain is
  * amortized, exactly like a real pipeline run), so a subset bench
  * cannot expose how the UNDERLYING operators scale — the motif
  * join-chain behind g04 is the survey's flagged exponential risk and
  * needs its own fresh measurement at larger inputs.
  *
  *   sbt "runMain graft.tools.IterScaleBench <sfDir> [runs=3]"
  *
  * For the given directory, times FRESH (cache-evicted) executions of:
  *   - `edges`       — the co-purchase graph derivation (self-join +
  *                     distinct), the family's shared input;
  *   - `betweenness` — `Betweenness.run` (bounded shortest-path motif
  *     chain + min-path tie-break + edge explode/count), edges cached;
  *   - `rmetrics`    — `RMetrics.run` (2-hop neighborhoods + common-
  *     neighbor metrics), edges cached.
  *
  * Prints one JSON line with the min and median over `runs` passes
  * (min-of-runs is the capability number on this noisy VM —
  * BASELINE.md "Measurement variance").
  */
object IterScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning.autoConfs(sfDir, cpus.toInt)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("iterbench-ckpt").toString)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // One warmup + `runs` measured passes of `f`, with `prep` run before
    // every pass (un-timed): eviction + re-warming whatever the pass is
    // NOT supposed to measure.
    def measure(prep: => Unit)(f: => Unit): (Double, Double) = {
      prep; f // warmup (JIT, codegen, parquet footers)
      val samples = (1 to runs).map { _ =>
        prep
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (samples.head, samples(samples.length / 2))
    }

    def evict(): Unit = SessionCache.evict(spark)
    def warmEdges(): Unit = noop(GraphQueries.derivedEdges(spark, sfDir))

    // Same thresholds as the catalog (GraphQueries RL1/RL2).
    val results = Seq(
      "edges" -> measure { evict() } {
        noop(GraphQueries.derivedEdges(spark, sfDir))
      },
      "betweenness" -> measure { evict(); warmEdges() } {
        noop(Betweenness.run(
          GraphQueries.derivedGraph(spark, sfDir), maxLen = 2)(spark))
      },
      "rmetrics" -> measure { evict(); warmEdges() } {
        noop(RMetrics.run(
          GraphQueries.derivedGraph(spark, sfDir), 0.5, 0.85))
      })

    def jnum(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val fields = results.map { case (name, (mn, med)) =>
      s""""$name":{"min":${jnum(mn)},"median":${jnum(med)}}"""
    }.mkString(",")
    println(s"""{"tool":"iterscale","sf":"$sfDir","runs":$runs,$fields}""")
    spark.stop()
  }
}
