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
  *   sbt "runMain graft.tools.IterScaleBench <sfDir> [runs] \
  *       [maxLen=2] [cap=<n|none>] [capDiff=on]"
  *
  * For the given directory, times FRESH (cache-evicted) executions of:
  *   - `edges`       — the co-purchase graph derivation (self-join +
  *                     distinct), the family's shared input;
  *   - `betweenness` — `Betweenness.run` (bounded shortest-path motif
  *     chain + min-path tie-break + edge explode/count), edges cached —
  *     path bound `maxLen` and hub cap `cap` flag-settable (the g17
  *     k=3 configuration is `maxLen=3 cap=16`);
  *   - `rmetrics`    — `RMetrics.run` (2-hop neighborhoods + common-
  *     neighbor metrics), edges cached.
  *
  * `capDiff=on` additionally runs betweenness UNCAPPED at the same
  * `maxLen` (feasible at small SF where exact enumeration fits) and
  * reports the capped run's accuracy against it — edges compared, edges
  * whose count differs, and both walls — the cap-sensitivity evidence
  * for the hub cap's bias/cost trade (round-17 VERDICT ask #2).
  *
  * Prints one JSON line with the min and median over `runs` passes
  * (min-of-runs is the capability number on this noisy VM —
  * BASELINE.md "Measurement variance").
  */
object IterScaleBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args.lift(1).filter(!_.contains("=")).map(_.toInt).getOrElse(3)
    val flags = args.drop(1).filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val maxLen = flags.getOrElse("maxLen", "2").toInt
    val cap: Option[Long] = flags.get("cap").filter(_ != "none").map(_.toLong)
    val capDiff = flags.get("capDiff").contains("on")
    require(!capDiff || cap.nonEmpty, "capDiff=on needs a cap= to compare")
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
    val decompose = flags.get("decompose").contains("on")
    val decomposeRows: Seq[(String, (Double, Double))] =
      if (!decompose) Seq.empty
      else Seq(
        // Phase walls of the betweenness chain, each fresh-prepped:
        // distances (the BFS), candidates (BFS + pruned path
        // enumeration), spaths (+ min_by tie-break aggregate); the
        // full betweenness row below adds the explode+count.
        "distances" -> measure { evict(); warmEdges() } {
          noop(Betweenness.boundedDistances(
            GraphQueries.derivedGraph(spark, sfDir).adjacency, maxLen, cap))
        },
        "candidates" -> measure { evict(); warmEdges() } {
          noop(Betweenness.shortestPathCandidates(
            GraphQueries.derivedGraph(spark, sfDir), maxLen, cap))
        },
        "spaths" -> measure { evict(); warmEdges() } {
          noop(Betweenness.shortestPaths(
            GraphQueries.derivedGraph(spark, sfDir), maxLen, cap))
        })
    val results = decomposeRows ++ Seq(
      "edges" -> measure { evict() } {
        noop(GraphQueries.derivedEdges(spark, sfDir))
      },
      "betweenness" -> measure { evict(); warmEdges() } {
        noop(Betweenness.run(
          GraphQueries.derivedGraph(spark, sfDir), maxLen, cap)(spark))
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
    val capJson = if (!capDiff) "" else {
      import org.apache.spark.sql.functions.{col, abs => cabs, sum => csum,
        lit, count, coalesce}
      // Each timed run gets the same fresh prep as measure()'s passes
      // (evict + re-warm edges) so neither wall rides the other's
      // JIT/cache warming — the cross-warming bias the DeltaGate
      // decompose_order note documents.
      def timed(c: Option[Long]): (org.apache.spark.sql.DataFrame, Double) = {
        evict(); warmEdges()
        val g = GraphQueries.derivedGraph(spark, sfDir)
        val t0 = System.nanoTime()
        val df = Betweenness.run(g, maxLen, c)(spark)
        noop(df)
        (df, (System.nanoTime() - t0) / 1e9)
      }
      val (capped, cappedSec) = timed(cap)
      val (exact, exactSec) = timed(None)
      // Full outer on the edge key: the cap can DROP edges from the
      // result entirely (every geodesic through them routed via a
      // capped hub), not just lower counts.
      val cmp = capped.select(col("edges").as("e"),
          col("betweenness").cast("long").as("bc"))
        .join(exact.select(col("edges").as("e"),
          col("betweenness").cast("long").as("bx")), Seq("e"), "full_outer")
        .select(coalesce(col("bc"), lit(0L)).as("bc"),
          coalesce(col("bx"), lit(0L)).as("bx"))
        .agg(count(lit(1)).as("n"),
          csum((col("bc") =!= col("bx")).cast("long")).as("nd"),
          csum(cabs(col("bc") - col("bx"))).as("sad"),
          csum(col("bx")).as("tot")).head()
      s""","cap_diff":{"max_len":$maxLen,"cap":${cap.get},""" +
        s""""capped_sec":${jnum(cappedSec)},"exact_sec":${jnum(exactSec)},""" +
        s""""edges_compared":${cmp.getLong(0)},""" +
        s""""edges_differing":${cmp.getLong(1)},""" +
        s""""abs_count_diff":${cmp.getLong(2)},""" +
        s""""exact_count_total":${cmp.getLong(3)}}"""
    }
    println(s"""{"tool":"iterscale","sf":"$sfDir","runs":$runs,""" +
      s""""max_len":$maxLen,"cap":${cap.getOrElse(-1L)},$fields$capJson}""")
    spark.stop()
  }
}
