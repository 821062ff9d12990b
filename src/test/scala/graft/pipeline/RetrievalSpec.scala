package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 ranking properties + a closed-form replay of the exact
  * fixed-point arithmetic.
  */
class RetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def queries(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("query_id", "qtext")
  }

  /** Scala replay of the operator's exact arithmetic (same quantization
    * points: integer micro-nat idf, double frac, floor before sum).
    */
  private def score(terms: Seq[(Long, Long)], // (tf, df) per matched term
      nDocs: Long, tTokens: Long, dl: Long): Long = {
    val k1 = 1.2; val k1p1 = 2200.0 / 1000.0; val b = 0.75
    terms.map { case (tf, df) =>
      val idfMicro = math.floor(
        math.log((2.0 * nDocs + 2.0) / (2.0 * df + 1.0)) * 1e6).toLong
      val frac = (tf * k1p1) /
        (tf + k1 * ((1.0 - b) + b * (dl.toDouble * (nDocs.toDouble / tTokens.toDouble))))
      math.floor(idfMicro.toDouble * frac).toLong
    }.sum
  }

  test("bm25: hand-replayed scores, rank order, tie-break") {
    // Corpus: N=3 docs, T=9 tokens. Query "cat dog": df(cat)=2, df(dog)=1.
    val d = docs(
      (1L, "cat dog fish"), // both terms
      (2L, "cat bird bird"), // cat only
      (3L, "rock rock rock")) // no terms — absent from output
    val got = Retrieval.bm25TopK(d, queries((7L, "cat dog")), k = 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("score_micro"), r.getAs[Long]("rank"))).toMap
    val s1 = score(Seq((1L, 2L), (1L, 1L)), 3L, 9L, 3L) // doc 1: cat + dog
    val s2 = score(Seq((1L, 2L)), 3L, 9L, 3L) // doc 2: cat
    assert(s1 > s2) // two matched terms beat one at equal length
    assert(got == Map((7L, 1L) -> ((s1, 1L)), (7L, 2L) -> ((s2, 2L))))
  }

  test("bm25: shorter doc outranks longer at equal tf (length normalization)") {
    val d = docs(
      (1L, "cat a b"), (2L, "cat a b c d e f g"), (3L, "x y z"))
    val got = Retrieval.bm25TopK(d, queries((0L, "cat")), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("bm25: tf saturates — k1 bounds the repeated-term payoff") {
    // Same length, same single matched term, tf 1 vs 5: the tf=5 doc
    // wins but by less than 5x (saturation), and both beat nothing else.
    val d = docs(
      (1L, "cat z z z z z"), (2L, "cat cat cat cat cat z"), (3L, "q w e r t y"))
    val rows = Retrieval.bm25TopK(d, queries((0L, "cat")), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    assert(rows(2L) > rows(1L) && rows(2L) < 5L * rows(1L))
  }

  test("bm25: duplicate query terms count once, k truncates per query") {
    val d = docs((1L, "cat a"), (2L, "cat b"), (3L, "cat c"))
    val one = Retrieval.bm25TopK(d, queries((0L, "cat")), k = 10)
    val dup = Retrieval.bm25TopK(d, queries((0L, "cat cat cat")), k = 10)
    assert(one.except(dup).isEmpty && dup.except(one).isEmpty)
    assert(Retrieval.bm25TopK(d, queries((0L, "cat")), k = 2).count() == 2L)
  }
}
