package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("train recovers the hand-computed merge sequence") {
    // freq: low×3 (as "low low low"), lower×2, lowest×1, plus newer.
    // Hand-run of Sennrich BPE with (cnt desc, lhs, rhs) tie-breaks:
    //   r1: (l,o)=6  r2: (lo,w)=6  r3: (e,r)=3 ... pin the first three.
    val d = docs((1L, "low low low lower lower lowest"), (2L, "newer"))
    val m = Bpe.train(d, 3)
    assert(m.map(x => (x.rank, x.lhs, x.rhs, x.count)) == Seq(
      (1, "l", "o", 6L), (2, "lo", "w", 6L), (3, "e", "r", 3L)))
    assert(m(1).merged == "low")
  }

  test("greedy merge is leftmost-first non-overlapping (the aaaa case)") {
    // One word "aaaa" (freq 1): pair (a,a) counts 3; merging must give
    // [aa, aa, </w>], NOT [aa, a, a, </w>] (replace's consumed
    // separator) and NOT [aaa, a, </w>] (overlapping). Round 2 then
    // ties (aa,aa) with (aa,</w>) at count 1 and the (lhs, rhs)
    // tie-break picks (aa,</w>) ("<" sorts before "a"); applying both
    // merges must leave exactly [aa, aa</w>] = 2 tokens — the wrong
    // greedy states all leave 3+.
    val d = docs((1L, "aaaa"))
    val m = Bpe.train(d, 2)
    assert((m(0).lhs, m(0).rhs, m(0).count) == (("a", "a", 3L)))
    assert((m(1).lhs, m(1).rhs, m(1).count) == (("aa", "</w>", 1L)))
    val wt = Bpe.wordTokenCounts(d, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wt == Map("aaaa" -> 2L))
  }

  test("token counts: segmentation grain, per-doc sums, corpus total") {
    val d = docs((1L, "low lower"), (2L, "low low"))
    // 2 merges: lo, low. States: low -> [low,</w>] (2 toks);
    // lower -> [low,e,r,</w>] (4 toks).
    val m = Bpe.train(d, 2)
    assert(m.map(_.merged) == Seq("lo", "low"))
    val wt = Bpe.wordTokenCounts(d, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wt == Map("low" -> 2L, "lower" -> 4L))
    val dt = Bpe.docTokenCounts(d, m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dt == Map(1L -> 6L, 2L -> 4L))
    assert(Bpe.tokenSum(d, m) == 10L)
    assert(Bpe.tokenSum(d.limit(0), m) == 0L)
  }

  test("vocabulary save/load round-trips and replays identically") {
    val d = docs((1L, "wider wide widest new newer"))
    val m = Bpe.train(d, 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.saveVocab(spark, m, dir)
    assert(Bpe.loadVocab(spark, dir) == m)
    val a = Bpe.wordTokenCounts(d, m).collect().map(_.toSeq).toSet
    val b = Bpe.wordTokenCounts(d, Bpe.loadVocab(spark, dir))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("chunkByTokenBudget: straddle convention and text rebuild") {
    // Untrainable single-char words keep the math transparent: each
    // word "x" = [x, </w>] = 2 tokens. Budget 4 => 2 words per chunk
    // unless a straddle: word starts at cum 4k..4k+3.
    val d = docs((1L, "a b c d e"))
    val m = Seq(Bpe.Merge(1, "zz", "zz", 1L)) // merges nothing
    val got = Bpe.chunkByTokenBudget(d, m, 4L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    // starts: a@0,b@2,c@4,d@6,e@8 -> chunks 0:[a,b] 1:[c,d] 2:[e]
    assert(got.toSeq == Seq(
      (0L, 2L, 4L, "a b"), (1L, 2L, 4L, "c d"), (2L, 1L, 2L, "e")))
  }

  test("vocab ids are deterministic and encode round-trips the text") {
    import spark.implicits._
    val d = docs((1L, "low lower"), (2L, "low"))
    val m = Bpe.train(d, 2) // merges: lo, low
    // vocab: chars e,l,o,r,w sorted -> 0..4; </w> -> 5; lo -> 6; low -> 7
    val v = Bpe.vocab(d, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("e" -> 0L, "l" -> 1L, "o" -> 2L, "r" -> 3L, "w" -> 4L,
      "</w>" -> 5L, "lo" -> 6L, "low" -> 7L))
    val enc = Bpe.encode(d, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 2 "low" -> [low, </w>] = ids [7, 5] at pos 0,1
    assert(enc.filter(_._1 == 2L).sortBy(_._2).map(x => (x._3, x._4)).toSeq ==
      Seq(("low", 7L), ("</w>", 5L)))
    // doc 1 "low lower" -> [low,</w>, low,e,r,</w>]
    assert(enc.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("low", "</w>", "low", "e", "r", "</w>"))
    // positions are dense 0..n-1 per doc, and token counts agree with
    // the counting grain
    val dt = Bpe.docTokenCounts(d, m).as[(Long, Long)].collect().toMap
    assert(enc.filter(_._1 == 1L).map(_._2).sorted.toSeq ==
      (0L until dt(1L)).toSeq)
  }

  test("packSequencesFrom equals packSequences on the word grain") {
    val d = docs((1L, "one two three"), (2L, "four five"), (3L, "six"))
      .withColumn("source", lit("s"))
    val viaCol = Curation.packSequences(d, 2L).collect().map(_.toSeq).toSet
    val base = d.select(col("source").as("shard"), col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val viaFrom = Curation.packSequencesFrom(base, 2L)
      .collect().map(_.toSeq).toSet
    assert(viaCol == viaFrom)
  }
}
