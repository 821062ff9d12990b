package graft.tools

import graft.SparkSpec

/** End-to-end curation pipeline on the smoke corpus: stages compose,
  * yields are monotone non-increasing, and both outputs land.
  */
class CurateSpec extends SparkSpec {

  test("curate runs end to end with monotone stage yields") {
    val out = java.nio.file.Files.createTempDirectory("curate-spec").toString
    val stats = Curate.run(spark, "/root/testdata/sf0.001/documents.parquet",
      out, benchmarkPath = None, jaccardT = 0.8, packBudget = 256L)
    val n = Seq("input_docs", "quality_docs", "exact_dedup_docs",
      "near_dedup_docs", "split_docs").map(stats)
    assert(n.head > 0)
    // Each stage only ever drops documents (split adds a column only).
    assert(n.sliding(2).forall { case Seq(a, b) => b <= a })
    assert(stats("split_docs") == stats("near_dedup_docs"))
    val curated = spark.read.parquet(s"$out/curated")
    assert(curated.columns.toSet ==
      Set("doc_id", "text", "source", "split"))
    assert(curated.count() == stats("split_docs").toLong)
    val packed = spark.read.parquet(s"$out/packed")
    assert(packed.count() > 0)
  }

  test("curate emits the dup-group artifact and co-assigns near-dup splits") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Synthetic corpus with PLANTED near-dup pairs: doc 2i+1 is doc 2i
    // with one word substituted (Jaccard on 3-shingles well above 0.8
    // for these long docs), plus unrelated singleton docs. The CLI path
    // must (a) ship the groups artifact and (b) assign both members of
    // every surviving near-dup group... except near-dedup keeps only
    // canonicals — so the stronger CLI-path assertion is on the GROUPS
    // artifact + the split key: a doc's split equals its canonical's
    // content-hash split, which is exactly what makes a near-copy
    // unable to cross the train/test boundary.
    val body = (i: Int) => (0 until 40).map(w =>
      s"the word${(i * 53 + w * 7) % 23} is about token$w and it").mkString(" ")
    val pairs = (0 until 30).flatMap { i =>
      val t = s"doc $i " + body(i)
      Seq((i * 2L, t, "web"), (i * 2L + 1, t + " tail", "web"))
    }
    val singles = (100 until 120).map(i =>
      (i.toLong * 2, s"unique doc $i " + body(i + 1000), "books"))
    val docsP = java.nio.file.Files.createTempDirectory("curate-grp")
      .toString + "/docs.parquet"
    (pairs ++ singles).toDF("doc_id", "text", "source").write.parquet(docsP)

    val out = java.nio.file.Files.createTempDirectory("curate-grp-out").toString
    Curate.run(spark, docsP, out, benchmarkPath = None, jaccardT = 0.8)

    val groups = spark.read.parquet(s"$out/groups")
    assert(groups.columns.toSet == Set("doc_id", "group_id", "is_canonical"))
    // Every planted pair resolved into one group with one canonical.
    val gm = groups.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    (0 until 30).foreach { i =>
      assert(gm(i * 2L)._1 == gm(i * 2L + 1)._1,
        s"planted pair ${i * 2} / ${i * 2 + 1} not in one group")
    }
    assert(groups.filter(col("is_canonical")).count() ==
      groups.select("group_id").distinct().count())
    // CLI-path split is keyed on the canonical: recompute the expected
    // split from each surviving doc's group canonical's text and match.
    val canonSplit = spark.read.parquet(docsP)
      .join(groups.filter(col("is_canonical"))
        .select(col("doc_id"), col("group_id")), Seq("doc_id"))
      .select(col("group_id"),
        graft.pipeline.TextAnalysis.splitAssign(col("text")).as("want"))
    val got = spark.read.parquet(s"$out/curated")
      .join(groups.select(col("doc_id"), col("group_id")), Seq("doc_id"))
      .join(canonSplit, Seq("group_id"))
    assert(got.count() > 0)
    assert(got.filter(col("split") =!= col("want")).count() == 0,
      "a doc's split diverged from its group canonical's split")
  }

  test("curate decontamination stage drops overlapping docs") {
    val out = java.nio.file.Files.createTempDirectory("curate-spec2").toString
    // Benchmark = the corpus itself: every doc is 100% contaminated,
    // so the decontam stage must drop everything.
    val stats = Curate.run(spark, "/root/testdata/sf0.001/documents.parquet",
      out, benchmarkPath = Some("/root/testdata/sf0.001/documents.parquet"),
      maxContam = 0.5)
    assert(stats("decontam_docs") == 0.0)
  }

  test("bloom decontam keeps a subset of exact-mode survivors") {
    // The substitution contract: the bloom bitmap only OVER-flags
    // (maybe_frac >= exact contamination), so switching the stage to
    // bloom mode can only drop MORE — never leak a contaminated doc
    // that exact mode would have caught.
    import org.apache.spark.sql.functions.col
    val docsP = "/root/testdata/sf0.001/documents.parquet"
    // Benchmark = a 1-in-20 slice of the corpus (the standard leaked-
    // eval-set scenario), so exact mode keeps a nonempty remainder and
    // the subset relation is tested on real survivors.
    val benchP = java.nio.file.Files.createTempDirectory("curate-bench")
      .toString + "/bench.parquet"
    spark.read.parquet(docsP).filter(col("doc_id") % 20 === 0)
      .write.parquet(benchP)
    def survivors(mode: String): (Set[Long], Double) = {
      val out = java.nio.file.Files.createTempDirectory(s"curate-$mode").toString
      val stats = Curate.run(spark, docsP, out,
        benchmarkPath = Some(benchP), maxContam = 0.8, decontamMode = mode)
      val kept = spark.read.parquet(s"$out/curated")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      (kept, stats("decontam_docs"))
    }
    val (exactKept, _) = survivors("exact")
    val (bloomKept, bloomN) = survivors("bloom")
    assert(exactKept.nonEmpty)
    assert(bloomKept.nonEmpty && bloomKept.subsetOf(exactKept))
    assert(bloomN == bloomKept.size.toDouble)
  }

  test("optional pii and equalize stages compose into the full pipeline") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Synthetic corpus: a 4:1 source skew, and PII docs that differ ONLY
    // in their email span — identical after redaction, so the PII stage
    // placed BEFORE dedup must make them coalesce to one canonical doc.
    val filler = (i: Int) => s"doc $i body is about the data and it has " +
      s"plenty of plain words in it for the quality gate ${i * 37}"
    val big = (1 to 40).map(i => (i.toLong, filler(i), "web"))
    val small = (41 to 50).map(i => (i.toLong, filler(i), "books"))
    val piiDocs = Seq(
      (101L, "contact me at alice@example.com for the report and the data", "web"),
      (102L, "contact me at bob@other.org for the report and the data", "web"),
      (103L, "server is at 10.1.2.3 and the phone is 555-123-4567 for it", "web"))
    val docsP = java.nio.file.Files.createTempDirectory("curate-pii")
      .toString + "/docs.parquet"
    (big ++ small ++ piiDocs).toDF("doc_id", "text", "source")
      .write.parquet(docsP)

    val out = java.nio.file.Files.createTempDirectory("curate-pii-out").toString
    val stats = Curate.run(spark, docsP, out, benchmarkPath = None,
      pii = true, equalize = true)

    // PII stage: rewrites in place (yield 100%) and counts the spans
    // (2 emails + 1 IP + 1 phone).
    assert(stats("pii_docs") == stats("quality_docs"))
    assert(stats("pii_redacted_spans") == 4.0)
    // Docs 101/102 are identical post-redaction: exact dedup must merge
    // them (one doc fewer), which the unredacted pipeline cannot do.
    assert(stats("exact_dedup_docs") <= stats("pii_docs") - 1)
    // Equalize stage: only drops (no decontam stage in this run, so the
    // previous stage is near-dedup).
    assert(stats("equalize_docs") <= stats("near_dedup_docs"))
    assert(stats("split_docs") == stats("equalize_docs"))
    // No raw PII survives into the curated output (the redacted docs
    // themselves may legitimately be sampled out by equalization —
    // redaction itself is already pinned by the span count above).
    val texts = spark.read.parquet(s"$out/curated")
      .select("text").as[String].collect()
    assert(!texts.exists(t => t.contains("alice@example.com") ||
      t.contains("10.1.2.3") || t.contains("555-123-4567")))
    // Post-equalization the mix is balanced: per-source counts within
    // the hash-Bernoulli tolerance of the smallest source.
    val bySource = spark.read.parquet(s"$out/curated")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.size == 2)
    val (mx, mn) = (bySource.values.max, bySource.values.min)
    assert(mx <= 2 * math.max(mn, 1),
      s"equalized mix still skewed: $bySource")
  }

  test("spanCut stage cuts planted boilerplate from non-keepers, keeper intact") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Unique-filler docs (every other token doc-unique, so no cross-doc
    // 4-gram exists outside the plant) sharing one 10-word boilerplate
    // sentence at different positions. spanCut must CUT the boilerplate
    // from the non-keeper docs — not drop the docs — and keep the
    // keeper (minimum doc_id) verbatim.
    val boiler = "all rights reserved click here to subscribe to our newsletter"
    def filler(i: Int, a: Int, b: Int) = (a until b).map(w =>
      (if (w % 2 == 0) Seq("the", "is", "and", "for")(w % 4) else s"u${i}w$w"))
      .mkString(" ")
    // doc 4's post-boiler filler starts at an ODD index (doc-unique
    // token), so no boundary 4-gram like "our newsletter the …" is
    // shared with doc 2's mid-doc occurrence.
    val docs = Seq(
      (2L, s"${filler(1, 0, 20)} $boiler ${filler(1, 20, 40)}", "web"),
      (4L, s"$boiler ${filler(2, 1, 41)}", "web"),
      (6L, s"${filler(3, 0, 40)} $boiler", "web"))
    val docsP = java.nio.file.Files.createTempDirectory("curate-span")
      .toString + "/docs.parquet"
    docs.toDF("doc_id", "text", "source").write.parquet(docsP)
    val out = java.nio.file.Files.createTempDirectory("curate-span-out").toString
    val stats = Curate.run(spark, docsP, out, benchmarkPath = None,
      spanCut = Some(4))
    // no doc dropped — the cut removes words, not documents
    assert(stats("span_cut_docs") == 3.0)
    assert(stats("span_cut_words_cut") == 20.0) // 10 words × 2 non-keepers
    val texts = spark.read.parquet(s"$out/curated")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(texts(2L).contains(boiler), "keeper lost its canonical copy")
    assert(!texts(4L).contains(boiler) && !texts(6L).contains(boiler),
      "non-keeper kept the boilerplate")
    assert(texts(4L).contains("u2w1") && texts(6L).contains("u3w1"),
      "cut removed more than the planted span")
  }

  test("spanCut + tokens=bpe cuts at the TOKEN grain and reports tokens") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // The word-grain spanCut fixture, run in tokens=bpe mode: the cut
    // must go through dupTokenSpansCutText (token L-grams over the
    // encoded stream), report span_cut_tokens_cut, and still cut the
    // boilerplate from non-keepers only. L=12 TOKEN grams: the unique
    // filler words carry their doc index as a character, so the longest
    // cross-doc-shared token run outside the boilerplate is well under
    // 12 tokens — only the planted sentence (~60 tokens) can be flagged.
    val boiler = "all rights reserved click here to subscribe to our newsletter"
    def filler(i: Int, a: Int, b: Int) = (a until b).map(w =>
      (if (w % 2 == 0) Seq("the", "is", "and", "for")(w % 4) else s"u${i}w$w"))
      .mkString(" ")
    val docs = Seq(
      (2L, s"${filler(1, 0, 20)} $boiler ${filler(1, 20, 40)}", "web"),
      (4L, s"$boiler ${filler(2, 1, 41)}", "web"),
      (6L, s"${filler(3, 0, 40)} $boiler", "web"))
    val docsDf = docs.toDF("doc_id", "text", "source")
    val docsP = java.nio.file.Files.createTempDirectory("curate-tspan")
      .toString + "/docs.parquet"
    docsDf.write.parquet(docsP)
    val vocabDir = java.nio.file.Files.createTempDirectory("curate-tspan-v")
      .toString + "/vocab"
    graft.pipeline.Bpe.saveVocab(spark,
      graft.pipeline.Bpe.train(docsDf, 8), vocabDir)
    val out = java.nio.file.Files.createTempDirectory("curate-tspan-out")
      .toString
    val stats = Curate.run(spark, docsP, out, benchmarkPath = None,
      spanCut = Some(12), bpeVocab = Some(vocabDir))
    assert(stats("span_cut_docs") == 3.0) // cut removes tokens, not docs
    assert(stats("span_cut_tokens_cut") > 0.0,
      "token-grain cut removed nothing")
    assert(!stats.contains("span_cut_words_cut"),
      "token-grain run must report tokens, not words")
    val texts = spark.read.parquet(s"$out/curated")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(texts(2L).contains(boiler), "keeper lost its canonical copy")
    assert(!texts(4L).contains(boiler) && !texts(6L).contains(boiler),
      "non-keeper kept the boilerplate")
    assert(texts(4L).contains("u2w1") && texts(6L).contains("u3w1"),
      "cut removed more than the planted span")
  }

  test("contamSpans stage cuts the planted leak instead of dropping the doc") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val leak = "the secret benchmark answer is forty two exactly"
    def filler(i: Int, a: Int, b: Int) = (a until b).map(w =>
      (if (w % 2 == 0) Seq("the", "is", "and", "for")(w % 4) else s"u${i}w$w"))
      .mkString(" ")
    val docs = Seq(
      (1L, s"${filler(1, 0, 24)} $leak ${filler(1, 24, 44)}", "web"), // mid-doc leak
      (2L, leak, "web"),                                              // fully leaked
      (3L, filler(3, 0, 44), "web"))                                  // clean
    val docsP = java.nio.file.Files.createTempDirectory("curate-cspan")
      .toString + "/docs.parquet"
    docs.toDF("doc_id", "text", "source").write.parquet(docsP)
    val benchP = java.nio.file.Files.createTempDirectory("curate-cspan-b")
      .toString + "/bench.parquet"
    Seq((100L, leak)).toDF("doc_id", "text").write.parquet(benchP)
    val out = java.nio.file.Files.createTempDirectory("curate-cspan-out").toString
    val stats = Curate.run(spark, docsP, out, benchmarkPath = Some(benchP),
      contamSpans = Some(3))
    // doc 1 survives WITH the leak cut; doc 2 (100% leak) is dropped;
    // doc 3 untouched. The drop-based stage would have dropped doc 1 too
    // (its contamination is far above the default maxContam) — cutting
    // is the point.
    assert(stats("contam_cut_docs") == 2.0)
    assert(stats("contam_cut_words_cut") == 8.0 + leak.split(" ").length)
    val texts = spark.read.parquet(s"$out/curated")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(texts.keySet == Set(1L, 3L))
    assert(!texts(1L).contains("secret benchmark"), "leak survived the cut")
    assert(texts(1L).contains("u1w1") && texts(1L).contains("u1w43"),
      "cut removed non-leaked content")
  }

  test("buckets and temperature mixture stages compose through the CLI") {
    import spark.implicits._
    // Graded quality: every doc carries 10 singleton tokens plus
    // (2 + (i%3)·6) repeats of the high-frequency bigram "the data" —
    // more repeats ⇒ a larger high-probability token fraction ⇒ a higher
    // per-token LM score, giving three distinct score tiers per source
    // (docs stay exact- and near-unique via the singleton block).
    def doc(i: Int) = (0 until 10).map(j => s"n${i}x$j").mkString(" ") +
      " " + Seq.fill(2 + (i % 3) * 6)("the data").mkString(" ")
    val docs = (1 to 40).map(i => (i.toLong, doc(i), "web")) ++
      (41 to 50).map(i => (i.toLong, doc(i), "books"))
    val docsP = java.nio.file.Files.createTempDirectory("curate-bkt")
      .toString + "/docs.parquet"
    docs.toDF("doc_id", "text", "source").write.parquet(docsP)
    val out = java.nio.file.Files.createTempDirectory("curate-bkt-out").toString
    val stats = Curate.run(spark, docsP, out, benchmarkPath = None,
      bucketsKeep = Some(Set("head", "middle")), mixture = Some("temperature"))
    // head+middle keeps at least the top two thirds of each source
    // (ties land in the better bucket, so never fewer), and strictly
    // fewer than everything.
    val prev = stats("near_dedup_docs")
    assert(stats("buckets_docs") >= (2 * prev / 3).floor &&
      stats("buckets_docs") < prev,
      s"buckets kept ${stats("buckets_docs")} of $prev")
    // temperature: big source down-sampled, never upsampled
    assert(stats("temperature_docs") <= stats("buckets_docs"))
    assert(stats("split_docs") == stats("temperature_docs"))
    assert(spark.read.parquet(s"$out/curated").count() ==
      stats("split_docs").toLong)
  }

  test("gateIndex stage drops standing-corpus dups through the CLI") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def filler(i: Int) = (0 until 30).map(w =>
      (if (w % 2 == 0) Seq("the", "is", "and", "for")(w % 4) else s"c${i}w$w"))
      .mkString(" ")
    // standing corpus: docs 1..5; persisted index
    val corpus = (1 to 5).map(i => (i.toLong, filler(i)))
      .toDF("doc_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("curate-gate-idx")
      .toString
    graft.pipeline.Dedup.writeIndex(
      graft.pipeline.Dedup.corpusIndex(corpus, 3, 24, 2), idxDir)
    // batch: an exact copy of corpus doc 2, a near-copy of doc 3 (one
    // word appended), and two novel docs
    val batch = Seq(
      (101L, filler(2), "web"),                 // exact dup of corpus 2
      (102L, filler(3) + " extra", "web"),      // near dup of corpus 3
      (103L, filler(33), "web"),
      (104L, filler(44), "web")).toDF("doc_id", "text", "source")
    val docsP = java.nio.file.Files.createTempDirectory("curate-gate")
      .toString + "/docs.parquet"
    batch.write.parquet(docsP)
    val out = java.nio.file.Files.createTempDirectory("curate-gate-out")
      .toString
    val stats = Curate.run(spark, docsP, out, benchmarkPath = None,
      jaccardT = 0.5, gateIndex = Some(idxDir))
    assert(stats("corpus_gate_docs") == 2.0,
      s"expected the 2 novel docs to survive, got ${stats("corpus_gate_docs")}")
    val kept = spark.read.parquet(s"$out/curated")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(103L, 104L))
  }

  test("tokens=bpe mode reports token yields and packs in tokens") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val filler = (i: Int) => s"doc $i body is about the data and it has " +
      s"plenty of plain words in it for the quality gate ${i * 37}"
    val docs = (1 to 20).map(i => (i.toLong, filler(i), "web")).toDF(
      "doc_id", "text", "source")
    val docsP = java.nio.file.Files.createTempDirectory("curate-bpe")
      .toString + "/docs.parquet"
    docs.write.parquet(docsP)
    val vocabDir = java.nio.file.Files.createTempDirectory("curate-bpe-v")
      .toString + "/vocab"
    val merges = graft.pipeline.Bpe.train(docs, 12)
    graft.pipeline.Bpe.saveVocab(spark, merges, vocabDir)
    val out = java.nio.file.Files.createTempDirectory("curate-bpe-out")
      .toString
    val budget = 64L
    val stats = Curate.run(spark, docsP, out, benchmarkPath = None,
      packBudget = budget, bpeVocab = Some(vocabDir))
    // every stage gained a token yield, and tokens only ever shrink
    val tok = Seq("input_tokens", "quality_tokens", "exact_dedup_tokens",
      "near_dedup_tokens", "split_tokens").map(stats)
    assert(tok.head > 0)
    assert(tok.sliding(2).forall { case Seq(a, b) => b <= a })
    // the input token yield is EXACTLY the vocabulary's corpus total
    assert(tok.head == graft.pipeline.Bpe.tokenSum(docs, merges).toDouble)
    // packed offsets are token-denominated: each doc's n_tokens equals
    // the BPE doc count (not its word count), and bin boundaries follow
    // start_offset div budget over those token offsets
    val train = spark.read.parquet(s"$out/curated")
      .filter(col("split") === "train")
    val packed = spark.read.parquet(s"$out/packed")
    val wantTok = graft.pipeline.Bpe.docTokenCounts(train, merges)
      .as[(Long, Long)].collect().toMap
    val rows = packed.select("doc_id", "n_tokens", "start_offset", "bin")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nt, off, bin) =>
      assert(nt == wantTok(id), s"doc $id: packed $nt vs bpe ${wantTok(id)}")
      assert(bin == off / budget)
    }
    // token counts genuinely differ from word counts (the mode matters)
    val words = train.select(col("doc_id"),
        graft.pipeline.TextAnalysis.tokenCount(col("text")).as("w"))
      .as[(Long, Long)].collect().toMap
    assert(rows.exists { case (id, nt, _, _) => nt != words(id) })
  }

  test("domainCap stage keeps at most k docs per source, then splits") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val filler = (i: Int) => s"doc $i body is about the data and it has " +
      s"plenty of plain words in it for the quality gate ${i * 37}"
    val docs = (1 to 30).map(i => (i.toLong, filler(i), "web")) ++
      (31 to 36).map(i => (i.toLong, filler(i), "books"))
    val docsP = java.nio.file.Files.createTempDirectory("curate-cap")
      .toString + "/docs.parquet"
    docs.toDF("doc_id", "text", "source").write.parquet(docsP)
    val out = java.nio.file.Files.createTempDirectory("curate-cap-out").toString
    val stats = Curate.run(spark, docsP, out, benchmarkPath = None,
      domainCap = Some(10))
    // web (30 docs) capped to 10; books (6) untouched.
    assert(stats("domain_cap_docs") == 16.0)
    assert(stats("split_docs") == 16.0)
    val bySource = spark.read.parquet(s"$out/curated")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource("web") == 10L && bySource("books") == 6L)
  }
}
