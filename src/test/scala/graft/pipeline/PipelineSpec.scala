package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Output row of the spec-fixture [[FakeDecoder]] — top-level so
  * Spark's Encoder derivation sees a stable class name.
  */
final case class FakeDecoded(asset_id: Long, n_bytes: Long, feature: Long)

/** The round-12 hash-stub decoder, DEMOTED to a test fixture (VERDICT
  * round 12 #1): it demonstrates the pluggable-decoder shape — any
  * `Asset => T` body slots into the same batched `mapPartitions` pass
  * the real BMP decoders use — without any production path depending
  * on id-derived fake values. Top-level so the task closure doesn't
  * capture the (non-serializable) spec instance.
  */
object FakeDecoder {
  def decode(a: Multimodal.Asset): FakeDecoded =
    FakeDecoded(a.asset_id, a.payload.length.toLong,
      Hashing.h60(a.asset_id.toString) % 1000003L)
}

class PipelineSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("text stats: counts and ratios") {
    val d = docs((1L, "the cat sat on the mat"))
    val r = d.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.stopwordCount(col("text")).as("sw"),
      TextAnalysis.stopwordRatio(col("text")).as("swr"),
      TextAnalysis.meanTokenLen(col("text")).as("mtl"),
      TextAnalysis.subwordCount(col("text")).as("sub")).head()
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("sw") == 3) // the, on, the
    assert(r.getAs[Double]("swr") == 0.5)
    assert(r.getAs[Double]("mtl") == 17.0 / 6) // 3+3+3+2+3+3 chars
    assert(r.getAs[Long]("sub") == 6)
  }

  test("shingles: n-grams, short-doc fallback, distinctness") {
    val sh = docs((1L, "a b c d"), (2L, "a b"))
      .select(col("doc_id"),
        Shingles.wordShingles(TextAnalysis.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh(1L) == Set("a b c", "b c d"))
    assert(sh(2L) == Set("a b")) // shorter than n: whole doc
  }

  test("chunking: window enumeration, overlap, short-doc fallback") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(d, chunkLen = 3, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1: n_chunks = 1 + (5-3+1) div 2 = 2 → [a b c] at 0, [c d e] at 2.
    assert(got((1L, 0L)) == ((0L, 3L, "a b c")))
    assert(got((1L, 1L)) == ((2L, 3L, "c d e")))
    // doc 2 shorter than chunkLen: exactly one (short) chunk.
    assert(got((2L, 0L)) == ((0L, 2L, "x y")))
    assert(got.size == 3)
    // Non-overlapping chunks (stride == chunkLen) reassemble the doc.
    val rejoined = TextAnalysis.chunk(d, 2, 2)
      .groupBy("doc_id")
      // collect_list order is partition-dependent; sort by chunk_id.
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        x => x.getField("chunk_text")), " ").as("txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rejoined(1L) == "a b c d e" && rejoined(2L) == "x y")
  }

  test("dup spans: cross-doc runs merge to exact boundaries, within-doc repetition never fires") {
    // spanL=3. Docs 1+2 share the 4-word run "c d e f": duplicated
    // 3-grams "c d e"/"d e f" at starts {3,4} merge into ONE span
    // covering exactly words 3..6. Doc 5 carries the run twice, > spanL
    // apart -> two spans. Doc 4 is pure internal repetition (one
    // distinct doc) -> clean. Docs 7+8 are shorter than spanL (whole-doc
    // gram convention) -> span end clamps to doc length.
    val d = docs(
      (1L, "a b c d e f g h i j"),
      (2L, "x y c d e f u v w"),
      (3L, "k l m n o p"),
      (4L, "m m m m m m"),
      (5L, "c d e f p q r s t u v c d e f"),
      (7L, "c d"), (8L, "c d"))
    val got = Dedup.dupSpans(d, spanL = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_words"), r.getAs[Double]("dup_frac")))).toMap
    assert(got(1L) == ((10L, 1L, 4L, 0.4)))
    assert(got(2L) == ((9L, 1L, 4L, 4.0 / 9.0)))
    assert(got(3L) == ((6L, 0L, 0L, 0.0)))
    assert(got(4L) == ((6L, 0L, 0L, 0.0)))
    assert(got(5L) == ((15L, 2L, 8L, 8.0 / 15.0)))
    assert(got(7L) == ((2L, 1L, 2L, 1.0)))
    assert(got(8L) == ((2L, 1L, 2L, 1.0)))
  }

  test("dup span cut: keeper doc intact, others cut exactly, full-cut doc empties") {
    // Same fixture as the detect test. Gram keepers are min doc_id:
    // doc 1 owns the shared "c d e f" grams -> intact; doc 2 cuts words
    // 3..6; doc 5 holds the run twice, owns neither -> both spans cut;
    // doc 7 owns the whole-doc gram "c d" -> intact; doc 8 fully cut.
    val d = docs(
      (1L, "a b c d e f g h i j"),
      (2L, "x y c d e f u v w"),
      (3L, "k l m n o p"),
      (4L, "m m m m m m"),
      (5L, "c d e f p q r s t u v c d e f"),
      (7L, "c d"), (8L, "c d"))
    val got = Dedup.dupSpansCut(d, spanL = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("cut_words"),
          r.getAs[String]("text_cut")))).toMap
    assert(got(1L) == ((10L, 0L, "a b c d e f g h i j")))
    assert(got(2L) == ((9L, 4L, "x y u v w")))
    assert(got(3L) == ((6L, 0L, "k l m n o p")))
    assert(got(4L) == ((6L, 0L, "m m m m m m")))
    assert(got(5L) == ((15L, 8L, "p q r s t u v")))
    assert(got(7L) == ((2L, 0L, "c d")))
    assert(got(8L) == ((2L, 2L, "")))
  }

  test("token dup spans + cut: same algebra at the token grain (p69)") {
    // The word-grain fixtures above, restated as a token-id SEQUENCE
    // relation (letters -> ids): dupTokenSpans must produce the same
    // span geometry, dupTokenSpansCut the same survivors with dense
    // renumbered positions. spanL=3 token grams.
    import spark.implicits._
    val idOf = ('a' to 'z').zipWithIndex.map { case (c, i) =>
      c.toString -> (i + 1).toLong }.toMap
    val texts = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y c d e f u v w"),
      (3L, "k l m n o p"),
      (4L, "m m m m m m"),
      (5L, "c d e f p q r s t u v c d e f"),
      (7L, "c d"), (8L, "c d"))
    val enc = texts.flatMap { case (d, t) =>
      t.split(" ").zipWithIndex.map { case (w, p) => (d, p.toLong, idOf(w)) }
    }.toDF("doc_id", "pos", "token_id")
    val got = Dedup.dupTokenSpans(enc, spanL = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[Double]("dup_frac")))).toMap
    assert(got(1L) == ((10L, 1L, 4L, 0.4)))
    assert(got(2L) == ((9L, 1L, 4L, 4.0 / 9.0)))
    assert(got(3L) == ((6L, 0L, 0L, 0.0)))
    assert(got(4L) == ((6L, 0L, 0L, 0.0)))
    assert(got(5L) == ((15L, 2L, 8L, 8.0 / 15.0)))
    assert(got(7L) == ((2L, 1L, 2L, 1.0)))
    assert(got(8L) == ((2L, 1L, 2L, 1.0)))

    val cut = Dedup.dupTokenSpansCut(enc, spanL = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(_._3).toSeq }
    def ids(s: String) = s.split(" ").map(idOf).toSeq
    assert(cut(1L) == ids("a b c d e f g h i j")) // keeper intact
    assert(cut(2L) == ids("x y u v w"))
    assert(cut(3L) == ids("k l m n o p"))
    assert(cut(4L) == ids("m m m m m m"))
    assert(cut(5L) == ids("p q r s t u v"))
    assert(cut(7L) == ids("c d"))
    assert(!cut.contains(8L)) // fully cut -> no surviving tokens
    // positions renumber dense from 0 per doc
    assert(cut.values.forall(v => v.indices.nonEmpty))
  }

  test("token span cut TEXT rebuild == decoding the cut id stream") {
    // dupTokenSpansCutText (the Curate-facing shape) must equal
    // encode -> dupTokenSpansCut -> decode via the vocab, doc for doc —
    // including docs cut to empty (a row with text_cut = '' where the
    // id relation has no surviving rows).
    val d = docs(
      (1L, "a b c d e f g h i j"),
      (2L, "x y c d e f u v w"),
      (3L, "k l m n o p"),
      (4L, "m m m m m m"),
      (5L, "c d e f p q r s t u v c d e f"),
      (7L, "c d"), (8L, "c d"))
    val merges = Bpe.train(d, 6)
    val got = Dedup.dupTokenSpansCutText(d, merges, spanL = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cut_tokens"), r.getAs[String]("text_cut")))).toMap
    val voc = Bpe.vocab(d, merges).collect()
      .map(r => r.getAs[Long]("token_id") -> r.getAs[String]("token")).toMap
    val enc = Bpe.encode(d, merges)
    val ref = Dedup.dupTokenSpansCut(enc, spanL = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(t => voc(t._3)).mkString("")
          .replace(Bpe.Eow, " ").trim }
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 7L, 8L))
    got.foreach { case (id, (_, text)) =>
      assert(text == ref.getOrElse(id, ""), s"doc $id rebuild mismatch")
    }
    // doc 1 is the global min id: every duplicated gram it holds elects
    // it keeper, so it survives verbatim regardless of the merge table.
    assert(got(1L) == ((0L, "a b c d e f g h i j")))
    // the shared "c d e f" region is keeper-owned by doc 1, so both
    // docs 2 and 5 genuinely lose tokens.
    assert(got(2L)._1 > 0L && got(5L)._1 > 0L)
  }

  test("incremental dedup: exact dup, near dup, novel doc") {
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus material about spark partitions"))
    val batch = docs(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (17L, "the quick brown fox jumps over the lazy dog again and often"),
      (24L, "novel fresh content sharing nothing with anything prior"))
    val got = Dedup.incrementalDedup(corpus, batch, n = 3,
        numBands = 24, rowsPerBand = 2, threshold = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("dup_exact"), r.getAs[Long]("near_id"),
          r.getAs[Boolean]("keep")))).toMap
    assert(got(10L) == ((true, 1L, false)))   // verbatim copy of corpus 1
    assert(got(17L) == ((false, 1L, false)))  // one word changed: near only
    assert(got(24L) == ((false, -1L, true)))  // novel: kept
    assert(got.size == 3)
  }

  test("incremental dedup: one standing index gates successive deltas") {
    // The production shape: corpusIndex built ONCE, two different
    // batches gated against it — each gate's verdicts equal the
    // one-shot operator's on (corpus, that batch).
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus material about spark partitions"))
    val idx = Dedup.corpusIndex(corpus, n = 3, numBands = 24, rowsPerBand = 2)
    val b1 = docs((10L, "the quick brown fox jumps over the lazy dog again and again"))
    val b2 = docs((20L, "completely unrelated corpus material about spark executors"),
      (21L, "something else entirely new here today"))
    for (b <- Seq(b1, b2)) {
      val viaIndex = Dedup.incrementalDedupAgainst(idx, b, 3, 24, 2, 0.5)
        .collect().map(_.toSeq).toSet
      val oneShot = Dedup.incrementalDedup(corpus, b, 3, 24, 2, 0.5)
        .collect().map(_.toSeq).toSet
      assert(viaIndex == oneShot)
      // the production broadcast-delta plan computes the same verdicts
      val viaBroadcast = Dedup.incrementalDedupAgainst(idx, b, 3, 24, 2, 0.5,
        broadcastDelta = true).collect().map(_.toSeq).toSet
      assert(viaBroadcast == oneShot)
    }
  }

  test("broadcast-delta gate: the standing corpus never shuffles or sorts") {
    // The flat-in-corpus measurement (BASELINE: 3.72 s at 30x == 3.74 s
    // at 100x) rests on a PLAN property — every corpus-side relation is
    // scanned once with a delta-built broadcast hash probe. Pin it on
    // the executed adaptive plan over a real table slice: broadcast
    // joins present, and NO SortMergeJoin anywhere (a corpus-side sort
    // is exactly the regression that would silently reintroduce
    // corpus-scaled gate cost).
    val all = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = all.filter(col("doc_id") % 7 =!= 3)
    val batch = all.filter(col("doc_id") % 7 === 3)
    // The production shape: the index is PERSISTED and re-read, so the
    // gate plan contains scans of the standing relations, not their
    // construction (whose own one-time exchanges are not gate cost).
    val dir = java.nio.file.Files.createTempDirectory("graft_gateplan")
      .toString
    Dedup.writeIndex(Dedup.corpusIndex(corpus, 3, 24, 2), dir)
    val df = Dedup.incrementalDedupAgainst(Dedup.readIndex(spark, dir),
      batch, 3, 24, 2, 0.5, broadcastDelta = true)
    df.queryExecution.toRdd.count()
    val full = df.queryExecution.executedPlan.toString
    assert(!full.contains("isFinalPlan=false"), s"plan not finalized:\n$full")
    // Assert on the FINAL adaptive plan only (the string also prints the
    // pre-AQE initial plan, where static SMJs legitimately appear before
    // runtime sizes demote them to broadcasts).
    val p = full.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), s"no broadcast probe:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"broadcast-delta gate grew a corpus-side sort-merge join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cross product:\n$p")
    // No shuffle ever partitions on a STANDING-relation key (k / band /
    // bucket): the only exchanges the gate may contain are the
    // delta-bounded verified-pair window and assembly (id_b / doc_id).
    for (key <- Seq("hashpartitioning(k#", "hashpartitioning(band#",
        "hashpartitioning(bucket#"))
      assert(!p.contains(key), s"corpus-side shuffle on $key:\n$p")
  }

  test("incremental dedup: persisted index round-trips and appends stay current") {
    // The standing-state lifecycle: build → write → read → gate batch-1 →
    // append batch-1 → gate batch-2, with batch-2's verdicts equal to the
    // one-shot operator on (corpus ∪ batch-1, batch-2). Exercises every
    // persistence entry point (writeIndex/readIndex/appendToIndex) plus
    // the in-memory appendedIndex twin.
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus material about spark partitions"))
    val b1 = docs(
      (10L, "a brand new document that joins the corpus after the gate"))
    val b2 = docs(
      (20L, "a brand new document that joins the corpus after the gate"),
      (21L, "a brand new document that joins the corpus after that gate"),
      (22L, "the quick brown fox jumps over the lazy dog again and again"))
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    Dedup.writeIndex(Dedup.corpusIndex(corpus, 3, 24, 2), dir)
    val loaded = Dedup.readIndex(spark, dir)
    // round-trip: the loaded index gates like the in-memory one
    val g1 = Dedup.incrementalDedupAgainst(loaded, b1, 3, 24, 2, 0.5,
      broadcastDelta = true).collect().map(_.toSeq).toSet
    assert(g1 == Dedup.incrementalDedup(corpus, b1, 3, 24, 2, 0.5)
      .collect().map(_.toSeq).toSet)
    // append batch-1, gate batch-2: doc 20 is now an exact dup (of 10),
    // 21 a near-dup, 22 an exact dup of original corpus — all must match
    // the one-shot gate against corpus ∪ batch-1.
    Dedup.appendToIndex(dir, b1, 3, 24, 2)
    val g2 = Dedup.incrementalDedupAgainst(Dedup.readIndex(spark, dir),
        b2, 3, 24, 2, 0.5, broadcastDelta = true)
      .collect().map(_.toSeq).toSet
    val oneShot = Dedup.incrementalDedup(corpus.union(b1), b2, 3, 24, 2, 0.5)
      .collect().map(_.toSeq).toSet
    assert(g2 == oneShot)
    val byId = g2.map(s => s.head -> s.tail).toMap
    assert(byId(20L) == Seq(true, 10L, 1.0, false))
    assert(byId(22L) == Seq(true, 1L, 1.0, false))
    assert(byId(21L).head == false && byId(21L)(1) == 10L) // near of 10
    // the in-memory ⊕ computes the identical gate
    val viaMem = Dedup.incrementalDedupAgainst(
        Dedup.appendedIndex(Dedup.corpusIndex(corpus, 3, 24, 2), b1, 3, 24, 2),
        b2, 3, 24, 2, 0.5).collect().map(_.toSeq).toSet
    assert(viaMem == oneShot)
  }

  test("incremental dedup: index params persist, mismatches fail loudly, " +
      "compaction gates identically") {
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus material about spark partitions"))
    val batch = docs(
      (20L, "the quick brown fox jumps over the lazy dog again and again"),
      (21L, "a genuinely novel document the corpus has never seen before"))
    val dir = java.nio.file.Files.createTempDirectory("graft_idxp").toString
    Dedup.writeIndex(Dedup.corpusIndex(corpus, 3, 24, 2), dir)
    // params.json round-trips
    assert(Dedup.readIndexParams(spark, dir)
      .contains(Dedup.IndexParams(3, 24, 2, "oracle")))
    val idx = Dedup.readIndex(spark, dir)
    assert(idx.params.contains(Dedup.IndexParams(3, 24, 2, "oracle")))
    // gating with ANY mismatched parameter fails loudly (silently
    // missing every near-dup is the hazard — round-14 ADVICE)
    for ((n, b, r, m) <- Seq(
        (4, 24, 2, Hashing.HashMode.Oracle),
        (3, 12, 4, Hashing.HashMode.Oracle),
        (3, 24, 2, Hashing.HashMode.Fast))) {
      val e = intercept[IllegalArgumentException] {
        Dedup.incrementalDedupAgainst(idx, batch, n, b, r, 0.5, mode = m)
      }
      assert(e.getMessage.contains("standing index was built with"))
    }
    intercept[IllegalArgumentException] {
      Dedup.appendToIndex(dir, batch, 3, 24, 2, Hashing.HashMode.Fast)
    }
    intercept[IllegalArgumentException] {
      Dedup.appendedIndex(idx, batch, 4, 24, 2)
    }
    // a params-less index refuses writeIndex (metadata must travel)
    intercept[IllegalArgumentException] {
      Dedup.writeIndex(Dedup.CorpusIndex(idx.keys, idx.buckets, idx.shingles),
        dir + "_bare")
    }
    // append twice (duplicate keys + unsorted delta files accumulate),
    // then compact: verdicts identical before/after, params preserved,
    // and the duplicate key rows are actually gone.
    Dedup.appendToIndex(dir, batch, 3, 24, 2)
    Dedup.appendToIndex(dir, batch, 3, 24, 2)
    val keysBefore = spark.read.parquet(s"$dir/keys").count()
    val b2 = docs(
      (30L, "a genuinely novel document the corpus has never seen before"),
      (31L, "something else entirely fresh for the compaction check"))
    val before = Dedup.incrementalDedupAgainst(Dedup.readIndex(spark, dir),
      b2, 3, 24, 2, 0.5, broadcastDelta = true)
      .collect().map(_.toSeq).toSet
    Dedup.compactIndex(spark, dir)
    assert(Dedup.readIndexParams(spark, dir)
      .contains(Dedup.IndexParams(3, 24, 2, "oracle")))
    val keysAfter = spark.read.parquet(s"$dir/keys").count()
    assert(keysAfter < keysBefore,
      s"compaction left duplicate keys: $keysAfter vs $keysBefore")
    val after = Dedup.incrementalDedupAgainst(Dedup.readIndex(spark, dir),
      b2, 3, 24, 2, 0.5, broadcastDelta = true)
      .collect().map(_.toSeq).toSet
    assert(after == before)
    assert(after.map(_.head).toSet == Set(30L, 31L))
  }

  test("exact dedup: canonical id and group size") {
    val d = docs((5L, "same text"), (3L, "same text"), (9L, "Other"))
    val r = Dedup.exact(d).collect()
      .map(r => r.getAs[Long]("canonical_id") -> r.getAs[Long]("group_size")).toMap
    assert(r == Map(3L -> 2L, 9L -> 1L))
  }

  test("ngram dup profile: cross-doc shingle recurrence, per-doc fraction") {
    // 3-shingles: docs 1+2 share "a b c" only; doc 3 disjoint. A doc's
    // own internal repetition (doc 4's distinct-by-construction shingles)
    // never counts: recurrence is across DISTINCT documents.
    val d = docs(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"), (4L, "r r r r r"))
    val got = Dedup.ngramDupProfile(d, 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_dup"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(got(4L) == ((1L, 0L, 0.0))) // "r r r" dedupes to one shingle, 1 doc
  }

  test("segment dedup removes cross-doc spans, keeps per-doc order") {
    // 4-word spans; "x1 x2 x3 x4" is the shared boilerplate (docs 1+2),
    // everything else is unique. Doc 3 is ALL boilerplate; doc 4 shares
    // nothing. Duplication must count DISTINCT docs: doc 4's internally
    // repeated span survives.
    val d = docs(
      (1L, "x1 x2 x3 x4 a b c d"),
      (2L, "e f g h x1 x2 x3 x4"),
      (3L, "x1 x2 x3 x4"),
      (4L, "r r r r r r r r tail"))
    val got = Dedup.segmentDedup(d, segWords = 4, minDocs = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_segs"),
          r.getAs[Long]("n_removed")))).toMap
    assert(got(1L) == (("a b c d", 2L, 1L)))
    assert(got(2L) == (("e f g h", 2L, 1L)))
    assert(got(3L) == (("", 1L, 1L))) // fully-boilerplate doc stays, empty
    assert(got(4L) == (("r r r r r r r r tail", 3L, 0L))) // within-doc repeat kept
  }

  test("tfidf keywords: discriminative words outrank ubiquitous ones") {
    // "common" appears in all 3 docs (idf = ln(1) = 0 -> score 0);
    // each doc's unique word must rank first despite lower tf.
    val d = docs(
      (1L, "common common common apple"),
      (2L, "common banana"),
      (3L, "common cherry"))
    val top = TextAnalysis.tfidfKeywords(d, k = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("word"), r.getAs[Long]("score")))).toMap
    assert(top(1L)._1 == "apple")
    assert(top(2L)._1 == "banana")
    assert(top(3L)._1 == "cherry")
    val expectedScore = math.floor(math.log(3.0) * 1e6).toLong
    assert(top(1L)._2 == expectedScore) // tf=1 * floor(1e6*ln(3/1))
    // tie-break inside doc 1 at k=2: "common" (score 0) is second.
    val k2 = TextAnalysis.tfidfKeywords(d, k = 2).collect()
      .filter(_.getAs[Long]("doc_id") == 1L)
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[String]("word"))
    assert(k2.toSeq == Seq("apple", "common"))
  }

  test("unigram LM: fixed-point log-probs, OOV below minCount") {
    // corpus: "a" x3, "b" x2, "rare" x1 -> total 6.
    val d = docs((1L, "a b a"), (2L, "a b rare"))
    val got = TextAnalysis.unigramQuality(d, minCount = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("lp_micro_sum"),
          r.getAs[Long]("n_oov"), r.getAs[Double]("oov_frac")))).toMap
    def lp(cnt: Long) = math.floor(math.log(cnt / 6.0) * 1e6).toLong
    assert(got(1L) == ((3L, 2 * lp(3) + lp(2), 0L, 0.0)))
    assert(got(2L) == ((3L, lp(3) + lp(2) + lp(1), 1L, 1.0 / 3)))
  }

  test("bigram LM: seen bigrams score conditionals, pruned ones back off") {
    // corpus: "a b" appears 2x (kept at minCount=2), "b c" once (pruned
    // -> backoff). unigrams: a x2, b x2, c x1 -> total 5.
    val d = docs((1L, "a b"), (2L, "a b c"))
    val got = TextAnalysis.bigramQuality(d, minCount = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("lp2_micro_sum"),
          r.getAs[Long]("n_backoff")))).toMap
    def m(x: Double) = math.floor(math.log(x) * 1e6).toLong
    val lpAB = m(2.0 / 2.0) // ln(c2(a,b)/c1(a)) = ln(1) = 0
    val lpBC = TextAnalysis.StupidBackoffMicro + m(1.0 / 5.0) // backoff to c1(c)/T
    assert(got(1L) == ((1L, lpAB, 0L)))
    assert(got(2L) == ((2L, lpAB + lpBC, 1L)))
    // single-token docs carry no bigram signal: absent from the output
    val single = TextAnalysis.bigramQuality(docs((9L, "solo")), 2).count()
    assert(single == 0L)
  }

  test("segment dedup at minDocs=3 keeps a 2-doc span") {
    val d = docs((1L, "x1 x2 a"), (2L, "x1 x2 b"))
    val got = Dedup.segmentDedup(d, segWords = 2, minDocs = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(got == Map(1L -> "x1 x2 a", 2L -> "x1 x2 b"))
  }

  test("dup group resolution is transitive with min-id survivor") {
    import spark.implicits._
    val d = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (7L, "e"))
    // pairs 1~3 and 3~4 (transitive {1,3,4}); 2 alone in a pair with 7
    val pairs = Seq((1L, 3L), (3L, 4L), (2L, 7L)).toDF("id_a", "id_b")
    val got = Dedup.resolveDupGroups(d, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 1L, 2L -> 2L, 7L -> 2L))
  }

  test("split assignment is deterministic, content-keyed, and complete") {
    val d = docs((1L, "some doc"), (2L, "some doc"), (3L, "zz"), (4L, "q r"))
    val s1 = TextAnalysis.splitAssign(col("text"))
    val rows = d.select(col("doc_id"), s1.as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // exact duplicates land in the same split (content hash, not id)
    assert(rows(1L) == rows(2L))
    assert(rows.values.forall(Set("train", "val", "test")))
    // stable across evaluations
    val again = d.select(col("doc_id"), s1.as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == rows)
  }

  test("jaccard pairs: exact overlap via inverted index") {
    // doc1/doc2 share 2 of their trigram shingles; doc3 disjoint.
    val d = docs(
      (1L, "w x y z q"), // shingles: wxy xyz yzq
      (2L, "w x y z k"), // shingles: wxy xyz yzk
      (3L, "m n o p r"))
    val pairs = Dedup.jaccardPairs(d, 3, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0.5))) // 2 / (3+3-2)
  }

  test("prefix-filtered jaccard equals the inverted-index exact jaccard") {
    import spark.implicits._
    // Include docs with shared common shingles and distinct rare ones.
    val d = docs(
      (1L, "w x y z q a b c d e"),
      (2L, "w x y z q a b c d f"),
      (3L, "w x y z k l m n o p"),
      (4L, "m n o p r s t u v w"),
      (5L, "w x y z q a b c d e"))
    for (tau <- Seq(0.2, 0.4, 0.8)) {
      val exact = Dedup.jaccardPairs(d, 3, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.jaccardPairsPrefix(d, 3, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == exact, s"tau $tau")
    }
  }

  test("capped-postings jaccard is a subset of exact with true scores") {
    // Docs 1/2 near-dup via RARE shared shingles; docs 3/4/5 share only
    // the ubiquitous "w x y" stem. A df cap of 2 drops the hot shingles
    // from candidate generation: the 1-2 pair must survive (its rare
    // shingles are under the cap) with its EXACT uncapped Jaccard, and
    // every capped pair must appear in the uncapped result with the
    // same score (candidates shrink, the metric never deflates).
    val d = docs(
      (1L, "w x y rare1 rare2 rare3 a b"),
      (2L, "w x y rare1 rare2 rare3 a c"),
      (3L, "w x y k l m n o"),
      (4L, "w x y p q r s t"),
      (5L, "w x y u v z1 z2 z3"))
    for (tau <- Seq(0.2, 0.4)) {
      val exact = Dedup.jaccardPairs(d, 3, tau).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val capped = Dedup.jaccardPairs(d, 3, tau, maxPostings = 2L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(capped.subsetOf(exact), s"tau $tau: capped ⊄ exact")
      assert(capped.exists { case (a, b, _) => a == 1L && b == 2L },
        s"tau $tau: rare-shingle pair lost by the cap")
      // The hashed-key production variant (p46's operator) selects the
      // same capped pairs: df per shingle is identical whether keyed by
      // the string or its 60-bit hash.
      val cappedHashed = Dedup.jaccardPairsCapped(d, 3, tau, maxPostings = 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(cappedHashed == capped, s"tau $tau: hashed != string capped")
    }
  }

  test("containment finds the embedded quote that jaccard misses") {
    // Doc 1 = 20 tokens; doc 2 = its first 8 tokens (a quote). Every
    // quote shingle is in the doc: containment(quote→doc) = 1.0, while
    // Jaccard = 6/18 = 1/3 — below any dedup threshold.
    val long = (1 to 20).map(i => s"tok$i").mkString(" ")
    val quote = (1 to 8).map(i => s"tok$i").mkString(" ")
    val d = docs((1L, long), (2L, quote), (3L, "x y z unrelated words"))
    val got = Dedup.containmentPairs(d, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 6.0 / 18.0, 1.0)),
      s"containment pairs: ${got.toSeq}")
    // The symmetric operator is blind to the same pair at dedup-grade
    // thresholds — precisely the blind spot containment closes.
    val jac = Dedup.jaccardPairs(d, 3, 0.8).collect()
    assert(jac.isEmpty)
    // Identical docs score 1.0 in BOTH directions.
    val twin = docs((1L, long), (2L, long))
    val both = Dedup.containmentPairs(twin, 3, 0.9).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(both.toSeq == Seq((1.0, 1.0)))
  }

  test("capped containment: subset of uncapped, undeflated, short side survives") {
    // A popular boilerplate shingle shared by MANY docs (df > cap) plus
    // one genuine quote pair. Docs 10..15 all share the 3-token phrase
    // "the same header" (df = 8 with the quote pair included at cap 5).
    val long = (1 to 20).map(i => s"tok$i").mkString(" ")
    val quote = (1 to 8).map(i => s"tok$i").mkString(" ")
    val boiler = (10L to 15L).map(i =>
      (i, s"the same header unique$i filler${i}a filler${i}b"))
    val d = docs(Seq((1L, s"the same header $long"),
      (2L, s"the same header $quote")) ++ boiler: _*)
    // Threshold 0.25 makes boiler-boiler pairs (overlap = ONLY the
    // ubiquitous header shingle; cont = 1/4) qualify UNCAPPED, so the
    // cap's one documented loss mode — every shared shingle ubiquitous
    // — is actually exercised, not vacuously absent.
    def pairs(cap: Option[Long]) =
      Dedup.containmentPairs(d, 3, 0.25, maxPostings = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
    val capped = pairs(Some(5L))
    val uncapped = pairs(None)
    // Strict subset: capping only removes candidate pairs.
    assert(capped.subsetOf(uncapped), s"capped=$capped uncapped=$uncapped")
    // The pruned pairs are EXACTLY the boilerplate-only ones (their
    // whole overlap is the df-8 header shingle, capped out at df 5)...
    assert(uncapped.exists(p => p._1 >= 10L && p._2 >= 10L))
    assert(!capped.exists(p => p._1 >= 10L && p._2 >= 10L))
    // ...while the genuine quote pair SURVIVES — it shares df-2
    // tok-shingles, so one rare candidate key remains even though its
    // boilerplate prefix is capped out — and its values are IDENTICAL
    // to the uncapped run's (full-set verify: the metric still counts
    // the capped-out header shingle in the overlap; never deflates).
    val q = capped.find(p => p._1 == 1L && p._2 == 2L)
    assert(q.isDefined, s"quote pair lost under the cap: $capped")
    assert(q.get._4 == 1.0 && uncapped.contains(q.get))
  }

  test("minhash pairs find the same near-dups as exact jaccard") {
    val d = docs(
      (1L, "w x y z q a b c d e"),
      (2L, "w x y z q a b c d f"),
      (3L, "m n o p r s t u v w"))
    val exact = Dedup.jaccardPairs(d, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minHashPairs(d, 3, 24, 2, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)))
    assert(mh == exact) // 24 bands x 2 rows: catch probability ~1 at J~0.6
  }

  test("group-aware split: near-dup groups co-assign on the canonical content") {
    import spark.implicits._
    val d = Seq(
      (1L, "w x y z q a b c d e"),  // near-dup of 2 (J = 6/8 = 0.75)
      (2L, "w x y z q a b c d f"),
      (7L, "m n o p r s t u v w")). // singleton group
      toDF("doc_id", "text").withColumn("source", lit("s"))
    val pairs = Dedup.jaccardPairs(d, 3, 0.5)
    val groups = Dedup.resolveDupGroups(d, pairs)
    val got = TextAnalysis.groupSplitAssign(d, groups).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // 1 and 2 share the min-id canonical (1) and therefore the split —
    // and that split is splitAssign of doc 1's OWN text, so the near-dup
    // pair can never straddle train/test.
    val rep1Split = d.filter(col("doc_id") === 1L)
      .select(TextAnalysis.splitAssign(col("text"))).head().getString(0)
    assert(got(1L) == ((1L, rep1Split)))
    assert(got(2L) == ((1L, rep1Split)))
    assert(got(7L)._1 == 7L) // singleton keeps its own id and content key
    assert(got.size == 3)
  }

  test("edit-distance join: finds near pairs, respects the bound") {
    import spark.implicits._
    val rel = Seq(
      (1L, "hello world foo"),
      (2L, "hello world fooz"), // dist 1 from id 1
      (3L, "hello world foXzY"), // dist 3 from id 1, 2 from id 2
      (4L, "completely different"),
      (5L, "ab")) // shorter than q: no grams, excluded
      .toDF("id", "name")
    val got = Dedup.editDistanceJoin(rel, maxDist = 2, q = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L)))
    // Tighter bound drops the dist-2 pair.
    val tight = Dedup.editDistanceJoin(rel, maxDist = 1, q = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tight == Set((1L, 2L, 1L)))
  }

  test("edit-distance join: short-string incompleteness is observable") {
    import spark.implicits._
    val rel = Seq(
      (1L, "hello world foo"), // 15 chars: above both thresholds
      (2L, "hello world fooz"),
      (3L, "tiny"), // < q=5: excluded entirely
      (4L, "short str")) // 9 chars <= q*(maxDist+1)-1 = 14: below exactness
      .toDF("id", "name")
    val obs = new org.apache.spark.sql.Observation("ed-cov")
    Dedup.editDistanceJoin(rel, maxDist = 2, q = 5, coverage = Some(obs)).count()
    assert(obs.get("n_no_grams") == 1L)
    assert(obs.get("n_below_exact") == 2L) // "tiny" counts in both tiers
  }

  test("edit-distance join: complete vs brute force on perturbed titles") {
    import spark.implicits._
    // 40 distinct-ish titles + a 1-char-deleted copy of every third one;
    // the q-gram prefix + position + length filters must find exactly
    // the pairs brute-force levenshtein finds.
    val base = (0 until 40).map { i =>
      (i.toLong * 2, s"title alpha$i beta${i % 7} gamma${i % 5} delta")
    }
    val pert = base.collect { case (id, nm) if (id / 2) % 3 == 0 =>
      val pos = math.floorMod(nm.hashCode, nm.length)
      (id + 1, nm.substring(0, pos) + nm.substring(pos + 1))
    }
    val rel = (base ++ pert).toDF("id", "name")
    val got = Dedup.editDistanceJoin(rel, maxDist = 2, q = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val strs = (base ++ pert)
    val brute = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = {
        // classic DP
        val dp = Array.tabulate(sa.length + 1)(i => Array.tabulate(sb.length + 1)(j =>
          if (i == 0) j else if (j == 0) i else 0))
        for (i <- 1 to sa.length; j <- 1 to sb.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 0 else 1))
        dp(sa.length)(sb.length)
      } if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
    assert(got.nonEmpty) // the planted copies guarantee pairs exist
  }

  test("simhash: identical docs collide, disjoint docs differ") {
    val d = docs(
      (1L, "w x y z q a b c"), (2L, "w x y z q a b c"), (3L, "m n o p r s t u"))
    val sh = Dedup.simHash(d, 48, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(3L))
    assert(sh.values.forall(_ >= 0)) // 48-bit: sign-safe
    val pairs = Dedup.simHashPairs(d, 48, 4, 0, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }

  test("ann: brute-force ranks by cosine with id tie-break") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(emb.filter(col("vec_id") === 0), emb, 3)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(top(1L) == 3L) // identical vector (cos 1)
    assert(top(2L) == 1L) // close
    assert(top(3L) == 2L) // orthogonal
  }

  test("ann: ivf restricts to the coarse cell") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 1), // better match but other cell
      (2L, Array(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val top = Ann.ivfTopK(emb.filter(col("vec_id") === 0), emb, "label", 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(top == Set(2L)) // only the same-cell vector
  }

  test("ann: probed ivf recovers cross-cell neighbors, converges to brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    // 40 vectors in 4 cells; cell assignment intentionally NOT aligned
    // with direction, so probe=1 misses true neighbors.
    val emb = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") < 5)
    def hits(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = hits(Ann.bruteForceTopK(queries, emb, 3))
    val recall = (1 to 4).map(p =>
      (exact intersect hits(Ann.ivfTopKProbed(queries, emb, "label", p, 3))).size)
    // Monotone recall in nprobe; probing every cell IS brute force.
    assert(recall.sliding(2).forall(w => w(0) <= w(1)), recall.toString)
    assert(hits(Ann.ivfTopKProbed(queries, emb, "label", 4, 3)) == exact)
    // probe=1 equals the unprobed ivf when the query's own cell wins:
    // query 0's representative-nearest cell is its own (it IS rep of 0).
    val p1 = Ann.ivfTopKProbed(emb.filter(col("vec_id") === 0), emb, "label", 1, 3)
    val unprobed = Ann.ivfTopK(emb.filter(col("vec_id") === 0), emb, "label", 3)
    assert(hits(p1) == hits(unprobed))
  }

  test("multimodal: a custom decoder slots into the batched partition pass") {
    import spark.implicits._
    val assets = Multimodal.assetsFromDocuments(docs((1L, "hello world"), (2L, "abc")))
    val out = assets.mapPartitions(_.map(FakeDecoder.decode)).collect()
      .map(a => a.asset_id -> a).toMap
    assert(out(1L).n_bytes == 11 && out(2L).n_bytes == 3)
    assert(out(1L).feature == Hashing.h60("1") % 1000003L)
  }

  test("multimodal: decode recovers pixel-derived channel sums from real bytes") {
    val ids = Seq(1L, 2L, 7L, 42L)
    val out = Multimodal.decodeAssets(Multimodal.bmpAssetsFromDocuments(
        docs(ids.map(i => (i, "t")): _*))).collect()
      .map(a => a.asset_id -> a).toMap
    for (id <- ids) {
      val h = Hashing.h60(id.toString)
      val (w, hh) = Multimodal.bmpDims(h)
      // Reference sums straight from the planted formula — decode must
      // recover them from the encoded bytes.
      def chSum(c: Int): Long = (for {
        y <- 0 until hh; x <- 0 until w
      } yield Multimodal.bmpPixel(h)(x, y, c).toLong).sum
      val d = out(id)
      assert((d.width, d.height) == ((w.toLong, hh.toLong)))
      assert(d.n_bytes == 54L + Bmp.rowStride(w).toLong * hh)
      assert((d.r_sum, d.g_sum, d.b_sum) == ((chSum(0), chSum(1), chSum(2))))
    }
  }

  test("multimodal: resize transforms pixels (checksummed), frames stride real lengths") {
    val ids = (1L to 40L).toSeq
    val assets = Multimodal.bmpAssetsFromDocuments(docs(ids.map(i => (i, "t")): _*))
    val rez = Multimodal.resizeAssets(assets, maxDim = 4)
      .collect().map(r => r.asset_id -> r).toMap
    var sawNoop = false; var sawScale = false
    for (id <- ids) {
      val r = rez(id)
      val h = Hashing.h60(id.toString)
      val (w, hh) = Multimodal.bmpDims(h)
      val (ow, oh) = Multimodal.resizeDims(w, hh, 4)
      assert((r.src_w, r.src_h, r.out_w, r.out_h) ==
        ((w.toLong, hh.toLong, ow.toLong, oh.toLong)))
      if ((ow, oh) == ((w, hh))) sawNoop = true else sawScale = true
      // Reference checksums over the nearest-neighbor-resized grid,
      // recomputed from the formula at floor-mapped source coords.
      var es = 0L; var ews = 0L
      for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 3) {
        val v = Multimodal.bmpPixel(h)(x * w / ow, y * hh / oh, c).toLong
        es += v; ews += ((y.toLong * ow + x) * 3 + c + 1) * v
      }
      assert((r.px_sum, r.px_wsum) == ((es, ews)),
        s"resize checksum diverged for id $id (${w}x$hh -> ${ow}x$oh)")
    }
    assert(sawNoop && sawScale, "both resize branches must occur")
    // Frame sampling derives counts from the REAL payload byte length.
    val frames = Multimodal.sampleFrames(assets, 2).collect()
      .groupBy(_.asset_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    for (id <- ids) {
      val h = Hashing.h60(id.toString)
      val (w, hh) = Multimodal.bmpDims(h)
      val nBytes = 54 + Bmp.rowStride(w) * hh
      assert(frames(id) == (0 until nBytes / 100 + 1 by 2).map(_.toLong))
    }
  }

  test("multimodal: pooled-pixel embeddings compose with the ANN family") {
    val d = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    val emb = Multimodal
      .embedAssets(Multimodal.bmpAssetsFromDocuments(d), grid = 2).toDF()
      .select(col("asset_id").as("vec_id"), col("embedding"))
    // 2x2 regions x 3 channels = 12 components, each an integer channel
    // mean in 0..255.
    assert(emb.select(size(col("embedding"))).head().getInt(0) == 12)
    val bounds = emb.select(
      min(array_min(col("embedding"))), max(array_max(col("embedding")))).head()
    assert(bounds.getFloat(0) >= 0f && bounds.getFloat(1) <= 255f)
    // One id checked against the formula: region means = floor mean of
    // the planted pixels falling in the region.
    val h = Hashing.h60("1")
    val (w, hh) = Multimodal.bmpDims(h)
    val cells = for {
      y <- 0 until hh; x <- 0 until w; c <- 0 until 3
    } yield ((y * 2 / hh) * 2 + x * 2 / w, c) -> Multimodal.bmpPixel(h)(x, y, c).toLong
    val expected = cells.groupBy(_._1).view
      .mapValues(vs => (vs.map(_._2).sum / vs.size).toFloat).toMap
    val got = emb.filter(col("vec_id") === 1L)
      .select(col("embedding")).head().getSeq[Float](0)
    for (((reg, c), v) <- expected) assert(got(reg * 3 + c) == v)
    // The embedding column type plugs directly into the ANN operators.
    val top = Ann.bruteForceTopK(emb.filter(col("vec_id") === 1L), emb, k = 2)
      .collect()
    assert(top.length == 2)
    assert(top.map(_.getAs[Long]("neighbor_id")).toSet.subsetOf(Set(2L, 3L, 4L)))
  }

  test("hashing: scala-side h60 agrees with the Spark expression") {
    import spark.implicits._
    val fromExpr = Seq("abc", "1", "hello world").toDF("s")
      .select(Hashing.h60(col("s"))).collect().map(_.getLong(0))
    val fromScala = Seq("abc", "1", "hello world").map(Hashing.h60)
    assert(fromExpr.toSeq == fromScala)
  }

  test("pii scrub: ordered redaction, categories never double-count") {
    val d = docs(
      (1L, "mail a.b@x10.org then ip 10.0.0.1 then tel 555-123-4567"),
      (2L, "no pii here"),
      (3L, "host-embedded ip me@10.1.2.3.com is one email zero ips"))
    val got = TextAnalysis.piiScrub(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ipv4"),
          r.getAs[Long]("n_phones"))).toMap
    assert(got(1L) == ((1L, 1L, 1L)))
    assert(got(2L) == ((0L, 0L, 0L)))
    // The IPv4-shaped span inside the email host is consumed by the
    // email redaction first — counted once, as an email.
    assert(got(3L) == ((1L, 0L, 0L)))
    val red = d.select(col("doc_id"),
      TextAnalysis.piiRedact(col("text")).as("r")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("r")).toMap
    assert(red(1L) == "mail <EMAIL> then ip <IP> then tel <PHONE>")
    assert(red(2L) == "no pii here")
    assert(red(3L) == "host-embedded ip <EMAIL> is one email zero ips")
  }

  test("semdedup: within-cluster near-dups drop, keep-lowest-id") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), // pivot 0
      (1L, Array(0.0f, 1.0f)), // pivot 1
      (2L, Array(1.0f, 0.01f)), // cluster 0, ~dup of 0
      (3L, Array(1.0f, 0.02f)), // cluster 0, ~dup of 0 and 2
      (4L, Array(0.6f, 0.8f)) // cluster 1, distinct from pivot 1
    ).toDF("vec_id", "embedding")
    val got = Ann.semDedup(emb, Ann.lowIdPivots(emb, 2), 990000L).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("kept"))).toMap
    assert(got == Map(
      0L -> ((0L, true)), 1L -> ((1L, true)),
      2L -> ((0L, false)), 3L -> ((0L, false)), 4L -> ((1L, true))))
  }
}
