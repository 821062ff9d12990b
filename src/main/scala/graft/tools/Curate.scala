package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Dedup, TextAnalysis}

/** Production corpus-curation entry point — the full training-data
  * pipeline (quality gate → [PII scrub] → exact dedup → near-dedup
  * group resolution → benchmark decontamination → [mixture
  * equalization] → split assignment → sequence packing; bracketed
  * stages optional) as ONE tool over parquet, the curation counterpart of
  * [[AnnIndex]] (each stage already exists as an oracle-gated operator;
  * this wires the composition a real corpus run executes and reports
  * per-stage yield).
  *
  * ```
  * runMain graft.tools.Curate <docs.parquet> <outDir> \
  *     [benchmark.parquet|-] [jaccardT=0.8] [maxContam=0.2] [packBudget=512] \
  *     [decontam=exact|bloom] [pii=on|off] [equalize=on|off] \
  *     [minStopRatio=0.01] [domainCap=<k>] [spanCut=<L>] \
  *     [contamSpans=<L>] [buckets=keep:head,middle] \
  *     [mixture=equalize|temperature] [gateIndex=<dir>] [tokens=bpe:<dir>]
  * ```
  *
  * `tokens=bpe:<dir>` loads a [[graft.pipeline.Bpe]] vocabulary
  * (trained once with [[BpeTrain]]) and re-keys the run in SUBWORD
  * TOKENS: every stage's yield gains a `<stage>_tokens` stat (the
  * denomination training actually budgets in) and `outDir/packed` is
  * packed to `packBudget` TOKENS instead of whitespace words.
  *
  * `gateIndex=<dir>` gates the (internally deduped) batch against a
  * persisted standing [[Dedup.CorpusIndex]] (`Dedup.writeIndex`) with
  * the broadcast-delta plan — exact-key and verified-near duplicates of
  * the standing corpus are dropped; the corpus side never shuffles. The
  * gate's LSH parameters (shingle n, bands, rows, hash mode) are read
  * from the index's own `params.json`, never from CLI flags.
  *
  * `docs.parquet` needs `(doc_id: long, text: string, source: string)`.
  * `benchmark.parquet|-` is an eval set to decontaminate against (`-`
  * skips the stage). `pii=on` inserts the PII-scrub stage after the
  * quality gate (emails/IPv4s/phones redacted to typed placeholders —
  * BEFORE dedup, so documents differing only in their PII spans
  * coalesce; the yield row reports total redacted spans).
  *
  * `spanCut=<L>` inserts the Lee-et-al. exact-substring CUT after
  * near-dedup: duplicated `L`-gram spans are REMOVED from every
  * non-keeper doc and the text rebuilt ([[Dedup.dupSpansCut]]) — the
  * boilerplate that whole-doc dedup can't touch; docs cut to empty are
  * dropped, and the yield row reports total words removed. Surviving
  * text becomes the tokenizer's lowercased single-spaced view (the
  * convention every downstream text stage gates on anyway). When
  * `tokens=bpe:` is also on, the cut runs at the TOKEN grain instead
  * ([[Dedup.dupTokenSpansCutText]] — encode, cut duplicated token
  * `L`-grams, decode the surviving stream back to text; the grain Lee
  * et al. actually operate on) and the yield row reports
  * `span_cut_tokens_cut`.
  *
  * `contamSpans=<L>` (requires a benchmark) replaces the drop-based
  * decontamination with the SPAN-cut variant
  * ([[Curation.contaminationSpansCut]]): exactly the leaked regions are
  * removed and the text rebuilt, instead of dropping whole documents
  * that mention one benchmark sentence; fully-leaked docs cut to empty
  * are dropped.
  *
  * `buckets=keep:head[,middle[,tail]]` inserts the CCNet per-source
  * quality-bucket filter ([[Curation.ccnetBuckets]]) after
  * decontamination — the classic head/middle/tail pre-training knob.
  *
  * `mixture=equalize|temperature` inserts a mixture-rebalance stage
  * after the bucket filter: `equalize` down-samples every source to the
  * smallest source's size, `temperature` applies the gentler T = 1/2
  * sqrt-law reweighting ([[Curation.temperatureMixture]]); both are
  * deterministic hash-Bernoulli keeps (broadcast rate table, nothing
  * about the corpus shuffles). `equalize=on` remains as the legacy
  * spelling of `mixture=equalize`. Writes `outDir/curated` (surviving docs +
  * group-aware `split` — near-dup groups co-assign by construction),
  * `outDir/groups` (the dup-group artifact `(doc_id, group_id,
  * is_canonical)` for downstream audit/re-split), and `outDir/packed`
  * (train-split sequence packing), and prints ONE JSON line of
  * per-stage counts and wall times.
  *
  * Scale: every stage is the oracle-gated distributed operator — no
  * stage collects documents to the driver. Stages are localCheckpointed
  * between counts so the per-stage yield report costs one job per stage
  * instead of re-executing the whole upstream chain each time
  * (checkpoint ≈ the materialization a multi-day 100 TB run would do to
  * parquet between stages anyway).
  */
object Curate {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Runs the pipeline; returns per-stage doc counts and seconds.
    * `minStopwordRatio` is the quality gate's English-function-word
    * clause (round 13 — exposed because it is corpus-dependent: a
    * non-English or vocabulary-shifted corpus needs it relaxed, and a
    * silently-fixed threshold turned the 10x/30x scale measurement
    * into a no-op by rejecting every word-bijected copy at the door).
    */
  def run(spark: SparkSession, docsPath: String, outDir: String,
      benchmarkPath: Option[String], jaccardT: Double = 0.8,
      maxContam: Double = 0.2, packBudget: Long = 512L,
      shingleN: Int = 3, decontamMode: String = "exact",
      pii: Boolean = false, equalize: Boolean = false,
      minStopwordRatio: Double = 0.01,
      domainCap: Option[Int] = None,
      spanCut: Option[Int] = None,
      contamSpans: Option[Int] = None,
      bucketsKeep: Option[Set[String]] = None,
      mixture: Option[String] = None,
      gateIndex: Option[String] = None,
      bpeVocab: Option[String] = None): Map[String, Double] = {
    require(decontamMode == "exact" || decontamMode == "bloom",
      s"decontam mode must be 'exact' or 'bloom', got '$decontamMode'")
    require(contamSpans.isEmpty || benchmarkPath.nonEmpty,
      "contamSpans needs a benchmark to cut against")
    bucketsKeep.foreach { ks =>
      require(ks.nonEmpty && ks.subsetOf(Set("head", "middle", "tail")),
        s"buckets=keep: must name head/middle/tail, got $ks")
    }
    val mix = mixture.orElse(if (equalize) Some("equalize") else None)
    require(mix.forall(Set("equalize", "temperature")),
      s"mixture must be 'equalize' or 'temperature', got $mix")
    require(mixture.isEmpty || !equalize || mixture.contains("equalize"),
      "conflicting equalize=on and mixture= flags")
    val stats = scala.collection.mutable.LinkedHashMap[String, Double]()
    // tokens=bpe:<dir>: every stage's yield is ALSO reported in BPE
    // subword tokens (`<stage>_tokens`) — the denomination training
    // actually budgets in; a stage that drops 1% of docs but 30% of
    // tokens (long-doc-heavy cuts) is invisible in doc counts. Cost
    // shape (round-15 ADVICE — the old per-stage tokenSum re-exploded
    // the stage's full TEXT): the per-doc token relation is computed
    // from text only at `input` and after each text-REWRITING stage
    // (pii, span cuts); every filter-only stage's stat is one
    // doc_id-keyed join of two skinny (doc_id, n_tokens)-shaped
    // relations — no per-stage corpus text shuffle.
    val bpeMerges = bpeVocab.map(p => graft.pipeline.Bpe.loadVocab(spark, p))
    var tokCounts: DataFrame = null // standing (doc_id, n_tokens)
    def stage(name: String, rewritesText: Boolean = false)
        (f: => DataFrame): DataFrame = {
      val ((df, n), sec) = timed {
        val cut = f.localCheckpoint()
        (cut, cut.count())
      }
      stats(s"${name}_docs") = n.toDouble
      stats(s"${name}_sec") = sec
      bpeMerges.foreach { m =>
        if (tokCounts == null || rewritesText)
          tokCounts = graft.pipeline.Bpe.docTokenCounts(df, m)
            .localCheckpoint()
        stats(s"${name}_tokens") = df.select("doc_id")
          .join(tokCounts, Seq("doc_id"))
          .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0).toDouble
      }
      df
    }

    val docs = stage("input") {
      spark.read.parquet(docsPath).select("doc_id", "text", "source")
    }

    val quality = stage("quality") {
      docs.filter(
        TextAnalysis.qualityOk(col("text"),
          minStopwordRatio = minStopwordRatio) &&
        TextAnalysis.repetitionRatio(col("text"), shingleN) < lit(0.9))
    }

    // Optional PII scrub, BEFORE dedup: redaction normalizes documents
    // that differ only in their PII spans, so they coalesce downstream.
    // The stage rewrites text in place (yield = 100% by construction);
    // its informative stat is the number of redacted spans.
    val scrubbed = if (!pii) quality else {
      val s = stage("pii", rewritesText = true) {
        quality.withColumn("text", TextAnalysis.piiRedact(col("text")))
      }
      val spans = TextAnalysis.piiScrub(quality)
        .agg(sum(col("n_emails") + col("n_ipv4") + col("n_phones")))
        .head().getLong(0)
      stats("pii_redacted_spans") = spans.toDouble
      s
    }

    val exact = stage("exact_dedup") {
      val canon = Dedup.exact(scrubbed)
        .select(col("canonical_id").as("doc_id"))
      scrubbed.join(canon, Seq("doc_id"), "left_semi")
    }

    // The dup-group mapping is a first-class ARTIFACT, not a dedup
    // byproduct (VERDICT round 11 #8): it feeds the group-aware split
    // below (a near-copy of a training doc must never land in test) and
    // ships to outDir/groups so downstream consumers can audit or
    // re-split without re-resolving.
    val (groups, groupsSec) = timed {
      val pairs = Dedup.jaccardPairsPrefix(exact, shingleN, jaccardT)
      val g = Dedup.resolveDupGroups(exact, pairs).localCheckpoint()
      g
    }
    stats("groups_sec") = groupsSec

    val near = stage("near_dedup") {
      exact.join(groups.filter(col("doc_id") === col("canonical_id"))
        .select("doc_id"), Seq("doc_id"), "left_semi")
    }

    // Re-attach a cut relation's rebuilt text to the surviving rows of
    // `prev`, dropping docs cut to empty; records the total removed in
    // the cut's own grain (`cut_words` for word-grain cuts,
    // `cut_tokens` for the BPE token-grain cut). The cut relation is
    // checkpointed ONCE so the removed-count stat and the join don't
    // re-run the span machinery.
    def applyCut(name: String, prev: DataFrame, cutRel: DataFrame,
        cutCol: String = "cut_words"): DataFrame = {
      var cut: DataFrame = null
      val s = stage(name, rewritesText = true) {
        // checkpoint INSIDE the timed stage: the span machinery's
        // materialization is the stage's real cost — timing only the
        // re-attach join would report a ~0.2 s wall for a multi-second
        // cut (round-14 first-run artifact)
        cut = cutRel.localCheckpoint()
        prev.drop("text")
          .join(cut.filter(col("text_cut") =!= "")
            .select(col("doc_id"), col("text_cut").as("text")),
            Seq("doc_id"))
          .select("doc_id", "text", "source")
      }
      // coalesce: sum over an empty relation is NULL (an empty input
      // corpus must record 0 cut words, not NPE — round-14 ADVICE).
      stats(s"${name}_${cutCol.stripPrefix("cut_")}_cut") =
        cut.agg(coalesce(sum(cutCol), lit(0L))).head().getLong(0).toDouble
      s
    }

    // Optional standing-corpus gate (the round-14 incremental-dedup
    // surface via the CLI): the batch — already internally deduped — is
    // gated against a PERSISTED Dedup.CorpusIndex with the
    // broadcast-delta plan (the corpus side never shuffles); docs whose
    // content key or verified near-duplicate already exists in the
    // standing corpus are dropped. The caller appends the survivors
    // with Dedup.appendToIndex on whatever cadence ingestion runs.
    val gated = gateIndex match {
      case None => near
      case Some(path) => stage("corpus_gate") {
        // The gate's LSH parameters come FROM the index's params.json —
        // hardcoding them here silently missed every near-duplicate
        // whenever the index was built differently (round-14 ADVICE).
        val idx = Dedup.readIndex(spark, path)
        val p = idx.params.getOrElse(throw new IllegalArgumentException(
          s"standing index at $path has no params.json — rebuild it with " +
            "Dedup.writeIndex (legacy layouts cannot be validated)"))
        val verdicts = Dedup.incrementalDedupAgainst(
          idx, near.select("doc_id", "text"), p.n,
          numBands = p.numBands, rowsPerBand = p.rowsPerBand,
          threshold = jaccardT,
          mode = graft.pipeline.Hashing.HashMode.forName(p.mode),
          broadcastDelta = true)
        near.join(verdicts.filter(col("keep")).select("doc_id"),
          Seq("doc_id"), "left_semi")
      }
    }

    // Optional exact-substring span CUT (Lee et al. end to end): remove
    // duplicated spans from every non-keeper doc and rebuild — the
    // boilerplate whole-doc dedup can't touch. With tokens=bpe the cut
    // runs at the TOKEN grain (the grain Lee et al. actually cut at —
    // encode under the vocab, cut duplicated token L-grams, decode the
    // surviving stream back to text); L then counts subword tokens, not
    // words, so the same L bites on shorter surface repeats.
    val spanCutted = spanCut match {
      case None => gated
      case Some(l) => bpeMerges match {
        case Some(m) => applyCut("span_cut", gated,
          Dedup.dupTokenSpansCutText(gated, m, l), cutCol = "cut_tokens")
        case None =>
          applyCut("span_cut", gated, Dedup.dupSpansCut(gated, l))
      }
    }

    val decontam = benchmarkPath match {
      case None => spanCutted
      case Some(bp) =>
        val bench = spark.read.parquet(bp).select("doc_id", "text")
        contamSpans match {
          // Span-granular decontamination: cut exactly the leaked
          // regions and keep the rest of the document.
          case Some(l) => applyCut("contam_cut", spanCutted,
            Curation.contaminationSpansCut(spanCutted, bench, l))
          case None => stage("decontam") {
            // "bloom" is the fixed-size-bitmap scale path for benchmark /
            // blocklist shingle sets too big to broadcast exactly: it
            // over-flags only (maybe_frac >= the exact contamination), so
            // the kept set is a SUBSET of exact-mode's — the safe
            // direction for decontamination (spec-pinned in CurateSpec).
            val keep = decontamMode match {
              case "bloom" =>
                Curation.bloomContamination(spanCutted, bench, shingleN)
                  .filter(col("maybe_frac") <= maxContam)
              case _ =>
                Curation.contaminationScores(spanCutted, bench, shingleN)
                  .filter(col("contamination") <= maxContam)
            }
            spanCutted.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
          }
        }
    }

    // Optional CCNet quality-bucket filter: keep only the named
    // per-source thirds (head = cleanest) — the classic pre-training
    // data knob, applied to what survives dedup + decontamination.
    val bucketed = bucketsKeep match {
      case None => decontam
      case Some(ks) => stage("buckets") {
        decontam.join(
          Curation.ccnetBuckets(decontam)
            .filter(col("bucket").isin(ks.toSeq.sorted: _*))
            .select("doc_id"),
          Seq("doc_id"), "left_semi")
      }
    }

    // Optional mixture rebalance: `equalize` down-samples every source
    // to the smallest source's size; `temperature` applies the gentler
    // T = 1/2 sqrt-law. Both are deterministic hash-Bernoulli keeps —
    // a broadcast rate table + narrow map, nothing about the corpus
    // shuffles.
    val balanced = mix match {
      case None => bucketed
      case Some(m) => stage(m) {
        val kept = (m match {
          case "temperature" => Curation.temperatureMixture(bucketed)
          case _ => Curation.equalizeMixture(bucketed)
        }).filter(col("kept")).select("doc_id")
        bucketed.join(kept, Seq("doc_id"), "left_semi")
      }
    }

    // Optional per-source quality cap (p58 via the CLI path — the
    // FineWeb-style domain limit): keep only the `domainCap` highest
    // unigram-LM-scored docs of each surviving source, so one crawl
    // domain cannot dominate the mixture. Runs AFTER dedup/decontam/
    // equalize (cap what actually survives) and BEFORE the split.
    val capped = domainCap match {
      case None => balanced
      case Some(k) => stage("domain_cap") {
        balanced.join(Curation.sourceTopK(balanced, k).select("doc_id"),
          Seq("doc_id"), "left_semi")
      }
    }

    // Group-aware split (p45 semantics via the CLI path): the split is
    // keyed on each doc's dup-group CANONICAL member's content, so the
    // whole transitive near-dup group co-assigns — plain content-hash
    // splitAssign would let a surviving near-copy of a training doc
    // land in test. Canonical text is looked up in `exact` (the
    // relation `groups` was resolved over), so a canonical later
    // dropped by decontam/equalize still anchors its group's split.
    val curated = stage("split") {
      capped.join(
        TextAnalysis.groupSplitAssign(exact, groups)
          .select(col("doc_id"), col("split")),
        Seq("doc_id"))
    }

    val (_, writeSec) = timed {
      curated.write.mode(SaveMode.Overwrite).parquet(s"$outDir/curated")
      groups.select(col("doc_id"), col("canonical_id").as("group_id"),
          (col("doc_id") === col("canonical_id")).as("is_canonical"))
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/groups")
      // With tokens=bpe the pack budget is TOKEN-denominated: context
      // windows are subword-sized, so word-grain packing over- or
      // under-fills them wherever token/word ratios drift by source.
      val train = curated.filter(col("split") === "train")
      val packed = bpeMerges match {
        case None => Curation.packSequences(train, packBudget)
        case Some(m) => Curation.packSequencesFrom(
          train.select(col("source").as("shard"), col("doc_id"))
            .join(graft.pipeline.Bpe.docTokenCounts(train, m), Seq("doc_id"))
            .select(col("shard"), col("doc_id"), col("n_tokens")),
          packBudget)
      }
      packed.write.mode(SaveMode.Overwrite).parquet(s"$outDir/packed")
    }
    stats("write_pack_sec") = writeSec
    stats.toMap
  }

  /** Parse an `on|off` toggle flag, loudly rejecting typos. */
  private def toggled(flags: Map[String, String], key: String): Boolean =
    flags.get(key) match {
      case None | Some("off") => false
      case Some("on") => true
      case Some(other) => throw new IllegalArgumentException(
        s"$key must be 'on' or 'off', got '$other'")
    }

  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val outDir = args(1)
    // key=value toggles may appear anywhere after the two paths; the
    // remaining args keep their positional meaning.
    val (flagArgs, positional) = args.drop(2).partition(
      a => a.startsWith("pii=") || a.startsWith("equalize=") ||
        a.startsWith("minStopRatio=") || a.startsWith("domainCap=") ||
        a.startsWith("spanCut=") || a.startsWith("contamSpans=") ||
        a.startsWith("buckets=") || a.startsWith("mixture=") ||
        a.startsWith("gateIndex=") || a.startsWith("tokens="))
    val flags = flagArgs.map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val benchmark = positional.lift(0).filter(_ != "-")
    val jaccardT = positional.lift(1).map(_.toDouble).getOrElse(0.8)
    val maxContam = positional.lift(2).map(_.toDouble).getOrElse(0.2)
    val packBudget = positional.lift(3).map(_.toLong).getOrElse(512L)
    val decontamMode = positional.lift(4).getOrElse("exact")
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
    val stats = run(spark, docsPath, outDir, benchmark, jaccardT,
      maxContam, packBudget, decontamMode = decontamMode,
      pii = toggled(flags, "pii"), equalize = toggled(flags, "equalize"),
      minStopwordRatio = flags.get("minStopRatio").map(_.toDouble)
        .getOrElse(0.01),
      domainCap = flags.get("domainCap").map(_.toInt),
      spanCut = flags.get("spanCut").map(_.toInt),
      contamSpans = flags.get("contamSpans").map(_.toInt),
      bucketsKeep = flags.get("buckets").map { v =>
        require(v.startsWith("keep:"),
          s"buckets flag must be keep:<head,middle,tail subset>, got '$v'")
        v.stripPrefix("keep:").split(",").map(_.trim).toSet
      },
      mixture = flags.get("mixture"),
      gateIndex = flags.get("gateIndex"),
      bpeVocab = flags.get("tokens").map { v =>
        require(v.startsWith("bpe:") && v.length > 4,
          s"tokens flag must be bpe:<vocab dir>, got '$v'")
        v.stripPrefix("bpe:")
      })
    val fields = stats.map { case (k, v) =>
      val vs = if (k.endsWith("_docs")) v.toLong.toString
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      s""""$k":$vs"""
    }
    println(fields.mkString("{", ",", "}"))
    spark.stop()
  }
}
