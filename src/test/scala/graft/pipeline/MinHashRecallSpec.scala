package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-13 universal-hash-family fix: with the original
  * a_i = 37+2i coefficients, a_i·x never exceeded P, every h_i was
  * order-preserving in x, all k MinHash components were minimized by
  * the SAME global-min shingle, and LSH candidate recall degenerated
  * from the banded 1-(1-s^r)^b to plain s (a near-dup pair was a
  * candidate only when its global-min shingle hash was shared). These
  * tests fail under any order-preserving family.
  */
class MinHashRecallSpec extends SparkSpec {

  test("signature components are minimized by many different shingles") {
    // 200 distinct reduced shingle hashes; under an order-preserving
    // family every h_i picks the same argmin (1 distinct minimizer).
    val hs = (1 to 200).map(k => (k * 524287L + 11) % Hashing.M)
    val argmins = (0 until 48).map { i =>
      hs.minBy(x => (Hashing.hashA(i) * x + Hashing.hashB(i)) % Hashing.P)
    }.distinct
    assert(argmins.size > 10,
      s"only ${argmins.size} distinct minimizers across 48 hashes — " +
        "the family is (near-)order-preserving again")
  }

  test("banded LSH catches near-dups whose global-min shingle differs") {
    import spark.implicits._
    // 20 planted pairs: doc 2k is 14 shared tokens + a unique head token,
    // doc 2k+1 the same with a different head — shingle overlap ~0.79,
    // and the differing heads make the global-min shingle differ for
    // some pairs, which the degenerate family provably missed (a pair
    // was a candidate iff its global min reduced hash was shared:
    // replayed off-engine, 2 of these 20 pairs had differing mins and
    // produced ZERO matching bands under a_i = 37+2i). Banded recall at
    // s=.79, r=2, b=24 is 1-3e-13.
    val base = (0 until 20).map { k =>
      val shared = (0 until 14).map(j => s"w${k}_$j").mkString(" ")
      (2L * k, s"alpha$k $shared") :: (2L * k + 1, s"beta$k $shared") :: Nil
    }
    val docs = base.flatten.toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(docs, n = 3, numBands = 24,
        rowsPerBand = 2, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 20).map(k => (2L * k, 2L * k + 1)).toSet
    assert(expected.subsetOf(pairs),
      s"missed ${(expected -- pairs).size} of 20 planted near-dup pairs")
  }
}
