package graft.pipeline

import graft.SparkSpec

/** Differential pins for [[Bpe.trainLocal]] — the exact in-memory
  * trainer over the collected distinct-word table (round-18 VERDICT
  * ask #4's feasibility path for the 32k-merge production vocabulary).
  * Byte-identical merge tables are the contract: same pairs, same
  * ranks, same winning counts as [[Bpe.train]] / the sequential
  * reference, at depth (thousands of rounds), under early exhaustion,
  * and on multi-byte/supplementary-plane unicode where the tie-break
  * MUST follow Spark's UTF-8 byte order rather than Java's UTF-16
  * code-unit order.
  */
class BpeLocalSpec extends SparkSpec {

  // Sequential reference (the BpeDeepSpec refTrain shape, ASCII-safe
  // corpora only — its Scala-string tie-break equals UTF-8 order there).
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

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))

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
    words.zipWithIndex.map { case (w, i) =>
      (i.toLong, Seq.fill(1 + i % 3)(w).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("local trainer == sequential reference at production depth " +
      "(3000 rounds, heap/lazy-index path fully exercised)") {
    val words = randomWords(420)
    val freqs = words.zipWithIndex.map { case (w, i) => (w, (1 + i % 3).toLong) }
    val ref = refTrain(freqs, 3000)
    assert(ref.size >= 2048, "corpus must sustain thousands of merges")
    val local = Bpe.trainLocalFromCounts(freqs.toArray, 3000)
    assert(local == ref)
  }

  test("local trainer via the DataFrame entry == distributed trainer, " +
      "incl. early exhaustion") {
    val words = randomWords(12)
    val docs = corpusOf(words)
    val full = Bpe.train(docs, 4096)
    val local = Bpe.trainLocal(docs, 4096)
    assert(full.nonEmpty && full.size < 4096, "fixture must exhaust")
    assert(local == full)
  }

  test("unicode tie-breaks follow Spark's UTF-8 byte order " +
      "(supplementary plane vs U+E000..U+FFFF)") {
    // U+1F600 (4-byte UTF-8, a surrogate PAIR in UTF-16) must sort
    // AFTER U+FFFD under byte order; Java String.compareTo would put
    // the high surrogate (0xD83D) BEFORE 0xFFFD. Equal-count pairs
    // built from these symbols expose any UTF-16 ordering in the
    // argmax. Doc text exercises the full wordFreqs -> collect path.
    import spark.implicits._
    val words = Seq("😀ab", "�ab", "z😀�",
      "éßab", "中文ab", "plainword", "😀�z")
    val docs = words.zipWithIndex.map { case (w, i) =>
      (i.toLong, Seq.fill(1 + i % 2)(w).mkString(" ")) }
      .toDF("doc_id", "text")
    val dist = Bpe.train(docs, 64)
    val local = Bpe.trainLocal(docs, 64)
    assert(local == dist)
  }

  test("vocabularies over the driver bound are refused, not collected") {
    val docs = corpusOf(randomWords(50))
    val e = intercept[IllegalArgumentException](
      Bpe.trainLocal(docs, 4, maxDriverWords = 8))
    assert(e.getMessage.contains("distinct words"))
  }
}
