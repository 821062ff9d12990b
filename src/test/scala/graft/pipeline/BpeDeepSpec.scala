package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Production-depth differential for the BPE merge REPLAY (round-15
  * VERDICT ask #1): the relational replay ([[Bpe.wordStates]] — batched
  * literal-`replace` passes with lineage cuts between batches) must
  * equal a driver-side sequential reference implementation of Sennrich
  * BPE at merge counts far past one codegen batch. The catalog oracle
  * (p63/p65–p67) pins the semantics at R=16; this spec pins the SAME
  * semantics at R >= 2048, where the old single-expression chain broke
  * whole-stage codegen — 16+ replay batches, every batch boundary
  * crossed, every token-grain consumer (word/doc counts, encode,
  * chunking) checked against the reference segmentation.
  */
class BpeDeepSpec extends SparkSpec {

  // ---- sequential reference (driver-side, symbol arrays) -------------

  /** One leftmost-first non-overlapping merge pass — the symbol-array
    * statement of what SQL `replace` does on the wrapped state (the
    * equivalence itself is pinned by BpeSpec's "aaaa" case and the
    * DuckDB oracle).
    */
  private def mergePass(syms: Array[String], a: String, b: String)
      : Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        buf += (a + b); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toArray
  }

  private def initSyms(word: String): Array[String] =
    word.map(_.toString).toArray :+ Bpe.Eow

  /** Sequential-reference trainer: same pair counting, same
    * (count desc, lhs, rhs) tie-break, same greedy merge, same early
    * stop as [[Bpe.train]] — just a driver loop over the distinct-word
    * frequency map.
    */
  private def refTrain(freqs: Seq[(String, Long)], rounds: Int)
      : Seq[Bpe.Merge] = {
    var st = freqs.map { case (w, f) => (initSyms(w), f) }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Bpe.Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- st; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += Bpe.Merge(r, a, b, c)
        st = st.map { case (syms, f) => (mergePass(syms, a, b), f) }
        r += 1
      }
    }
    out.toSeq
  }

  /** Reference replay of a merge table over one word. */
  private def refSegment(word: String, merges: Seq[Bpe.Merge])
      : Array[String] =
    merges.sortBy(_.rank)
      .foldLeft(initSyms(word))((s, m) => mergePass(s, m.lhs, m.rhs))

  // ---- deterministic corpus with thousands of trainable merges -------

  /** Deterministic LCG so the corpus is stable across runs. */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))

  /** `n` pseudo-random lowercase words, lengths 10–17: near-unique
    * letter sequences, so most merges collapse only a handful of
    * positions and training sustains thousands of rounds before
    * exhaustion (total initial symbols ≈ n × 14).
    */
  private def randomWords(n: Int): Seq[String] = {
    val it = lcg(0x5eed5eedL)
    (0 until n).map { _ =>
      val len = 10 + (math.abs(it.next()) % 8).toInt
      (0 until len).map(_ => ('a' + (math.abs(it.next()) % 26).toInt).toChar)
        .mkString
    }.distinct
  }

  private def corpusOf(words: Seq[String]) = {
    import spark.implicits._
    // freq f = 1 + (i % 3): repeated inside the doc text, so the
    // distributed word-frequency pass sees the same weights refTrain is
    // handed.
    words.zipWithIndex.map { case (w, i) =>
      (i.toLong, Seq.fill(1 + i % 3)(w).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("replay at 2048+ merges: batched wordStates == sequential reference") {
    val words = randomWords(420)
    val docs = corpusOf(words)
    val freqs = words.zipWithIndex.map { case (w, i) => (w, (1 + i % 3).toLong) }
    val merges = refTrain(freqs, 3000)
    assert(merges.size >= 2048,
      s"corpus must sustain >= 2048 merges, got ${merges.size}")
    val deep = merges.take(2048)
    assert(deep.size / Bpe.ReplayBatch >= 16) // many batch boundaries

    // word grain: engine's batched replay vs reference segmentation
    val eng = Bpe.wordTokenCounts(docs, deep).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = freqs.map { case (w, _) =>
      w -> refSegment(w, deep).length.toLong }.toMap
    assert(eng == ref)

    // corpus grain: token sum
    val refSum = freqs.map { case (w, f) => f * ref(w) }.sum
    assert(Bpe.tokenSum(docs, deep) == refSum)
  }

  test("encode + chunking at 2048 merges match the reference segmentation") {
    val words = randomWords(420)
    val docs = corpusOf(words)
    val freqs = words.zipWithIndex.map { case (w, i) => (w, (1 + i % 3).toLong) }
    val deep = refTrain(freqs, 3000).take(2048)

    // encode: per-doc token STRING sequence == reference (doc i holds
    // word i repeated f_i times; positions must be dense and in order)
    val enc = Bpe.encode(docs, deep).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (d, rows) =>
        d -> rows.sortBy(_._2).map(_._3).toSeq }
    val refEnc = freqs.zipWithIndex.map { case ((w, f), i) =>
      i.toLong -> Seq.fill(f.toInt)(refSegment(w, deep).toSeq).flatten }.toMap
    assert(enc == refEnc)

    // chunking: per-doc token totals under the budget convention
    val chunks = Bpe.chunkByTokenBudget(docs, deep, 16L)
      .groupBy("doc_id").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refTot = refEnc.map { case (d, toks) => d -> toks.size.toLong }
    assert(chunks == refTot)
  }

  test("incremental trainer == sequential reference at 2048 rounds") {
    // The delta pair-count trainer (round-16 VERDICT ask #3) must
    // produce the BYTE-identical merge table — rank, pair, and winning
    // count — at production depth, where thousands of delta updates
    // have compounded on the standing counts relation (any drift in
    // the subtract/add algebra diverges the argmax within a few
    // rounds, so depth is the test).
    val words = randomWords(420)
    val docs = corpusOf(words)
    val freqs = words.zipWithIndex.map { case (w, i) => (w, (1 + i % 3).toLong) }
    val ref = refTrain(freqs, 2048)
    assert(ref.size == 2048)
    val eng = Bpe.trainIncremental(docs, 2048)
    assert(eng == ref)
  }

  test("incremental trainer == full trainer incl. early exhaustion") {
    // Tiny vocabulary that EXHAUSTS (every word collapses to one
    // symbol) well before the requested rounds: both trainers must
    // stop at the same round with the same table.
    val words = randomWords(12)
    val docs = corpusOf(words)
    val full = Bpe.train(docs, 4096)
    val inc = Bpe.trainIncremental(docs, 4096)
    assert(full.nonEmpty && full.size < 4096, "fixture must exhaust")
    assert(inc == full)
  }

  test("distributed train == sequential reference over 256 rounds") {
    // Small vocabulary keeps 256 distributed rounds fast; 256 also makes
    // the trained table span multiple replay batches when consumed.
    val words = randomWords(80)
    val docs = corpusOf(words)
    val freqs = words.zipWithIndex.map { case (w, i) => (w, (1 + i % 3).toLong) }
    val eng = Bpe.train(docs, 256)
    val ref = refTrain(freqs, 256)
    assert(eng == ref)
    // and the engine's replay of its own table matches the reference's
    val wt = Bpe.wordTokenCounts(docs, eng).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wt == freqs.map { case (w, _) =>
      w -> refSegment(w, ref).length.toLong }.toMap)
  }
}
