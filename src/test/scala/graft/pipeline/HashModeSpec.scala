package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential tests for the engine hash mode (VERDICT round 2, "Next
  * round" #4): swapping the md5-derived oracle hash for xxHash64 must not
  * change WHICH pairs the dedup operators emit — Jaccard over hashed
  * shingle sets is hash-independent (absent collisions), MinHash/SimHash
  * signatures differ but the verified pair decisions at the test
  * thresholds must agree. Runs on the driver-generated sf0.001 documents
  * table (500 docs with planted near-dups).
  */
class HashModeSpec extends SparkSpec {

  private lazy val docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fast60 stays in [0, 2^60) and differs from h60") {
    val sample = docs.select(
      Hashing.h60(col("text")).as("slow"), Hashing.fast60(col("text")).as("fast"))
    val rows = sample.collect()
    assert(rows.forall { r =>
      val f = r.getLong(1); f >= 0L && f < (1L << 60)
    })
    assert(rows.exists(r => r.getLong(0) != r.getLong(1)))
  }

  test("exact dedup: identical group structure under both hashes") {
    def groups(mode: Hashing.HashMode) =
      Dedup.exact(docs, mode = mode)
        .select(col("canonical_id"), col("group_size"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(groups(Hashing.HashMode.Oracle) == groups(Hashing.HashMode.Fast))
  }

  test("minhash-LSH: same verified pair set at the catalog thresholds") {
    val slow = pairs(Dedup.minHashPairs(docs, n = 3, numBands = 24,
      rowsPerBand = 2, threshold = 0.5, mode = Hashing.HashMode.Oracle))
    val fast = pairs(Dedup.minHashPairs(docs, n = 3, numBands = 24,
      rowsPerBand = 2, threshold = 0.5, mode = Hashing.HashMode.Fast))
    assert(slow == fast, s"slow-only=${slow -- fast} fast-only=${fast -- slow}")
  }

  test("simhash pairs: both hash modes hit the exact-Jaccard ground truth") {
    // A SimHash signature is a projection onto hyperplanes DEFINED by the
    // hash family, so per-pair hamming differs between families and pairs
    // near the maxHamming boundary legitimately flip — cross-mode set
    // equality is NOT an invariant (observed: md5 mode misses true
    // near-dup (119,425) @ J=0.97 that fast mode catches, and vice-versa
    // flips exist). The invariant worth testing is per-mode QUALITY
    // against the hash-independent exact ground truth: high recall of
    // J ≥ 0.8 pairs, and no reported pair below a precision floor.
    // (No precision assertion: SimHash on this synthetic tiny-vocabulary
    // corpus reports some zero-shingle-overlap pairs whose word
    // DISTRIBUTIONS align — the vocabulary-collapse property documented
    // on Dedup.simHash. Both modes show it equally; it is not a hash-mode
    // difference.)
    val truth = pairs(Dedup.jaccardPairsPrefix(docs, n = 3, threshold = 0.8))
    val modes: Seq[Hashing.HashMode] =
      Seq(Hashing.HashMode.Oracle, Hashing.HashMode.Fast)
    for (mode <- modes) {
      val found = pairs(Dedup.simHashPairs(docs, bits = 48, numBands = 4,
        maxHamming = 12, mode = mode))
      val recall = (truth & found).size.toDouble / truth.size
      assert(recall >= 0.85, s"recall $recall, missed ${truth -- found}")
    }
  }

  test("bloom decontam: no-false-negative contract holds in fast mode too") {
    // The Bloom guarantee (n_maybe >= exact n_hits per doc) must be a
    // property of the CONSTRUCTION, not of which hash family fills the
    // bitmap — both modes hash shingles consistently on both sides.
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    for (mode <- Seq[Hashing.HashMode](
        Hashing.HashMode.Oracle, Hashing.HashMode.Fast)) {
      val exact = Curation.contaminationScores(corpus, bench, 3, mode)
        .select(col("doc_id"), col("n_hits"))
      val bloom = Curation.bloomContamination(corpus, bench, 3, mode = mode)
        .select(col("doc_id"), col("n_maybe"))
      val viol = exact.join(bloom, Seq("doc_id"))
        .filter(col("n_maybe") < col("n_hits")).count()
      assert(viol == 0L, s"false negatives under $mode")
    }
  }

  test("dup-ngram profile: identical per-doc profile under both hashes") {
    // Cross-doc shingle recurrence is hash-independent absent collisions
    // (the hash is only an identity for the shingle string).
    def prof(mode: Hashing.HashMode) =
      Dedup.ngramDupProfile(docs, 3, mode = mode)
        .select(col("doc_id"), col("n_sh"), col("n_dup"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(prof(Hashing.HashMode.Oracle) == prof(Hashing.HashMode.Fast))
  }

  test("count-min: over-count-only guarantee holds in fast mode too") {
    import spark.implicits._
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val truth = toks.groupBy("w").agg(count(lit(1)).as("n_true"))
    for (mode <- Seq[Hashing.HashMode](
        Hashing.HashMode.Oracle, Hashing.HashMode.Fast)) {
      val sk = Sketches.countMinSketch(toks, "w", mode = mode)
      val viol = Sketches.countMinLookup(sk, truth.select("w"), "w", mode = mode)
        .join(truth, Seq("w"))
        .filter(col("est_n") < col("n_true")).count()
      assert(viol == 0L, s"under-count under $mode")
    }
  }
}
