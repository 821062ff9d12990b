package graft.tools

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions.col

/** Pins for the skewed-corpus cap demonstration: the construction's two
  * structural claims (boilerplate penetrates the τ=0.3 prefix for
  * median-length docs; a boilerplate-only pair of such docs fails
  * verify, so uniform-length corpora give capped == uncapped) and the
  * real-corpus characterization `measure` enforces (capped ⊆ uncapped;
  * the difference is exactly the chrome-induced pair set, because the
  * short docs' block-dominated pairs legitimately clear τ).
  */
class SkewCorpusSpec extends SparkSpec {

  private val n = 3
  private val tau = 0.3
  private val capDf = 5L

  /** ~54 words of per-doc-unique content — the testdata documents'
    * average shape (words parameterized by i so docs are unrelated).
    */
  private def body(i: Int): String =
    (0 until 54).map(w => s"w${i}x$w").mkString(" ")

  test("skewed fixture: boilerplate-only pairs fail verify, content dups survive, capped == uncapped") {
    import spark.implicits._
    val bp = SkewCorpus.boilerplate(37)
    // 12 unrelated docs all carrying the block (df(bp shingle) = 12 >
    // capDf), plus one planted content near-dup pair WITHOUT the block
    // whose Jaccard clears τ via rare shingles only.
    val bpDocs = (0 until 12).map(i => (i.toLong, body(i) + " " + bp))
    val dupA = (100L, "docs " + body(900))
    val dupB = (101L, "docs " + body(900) + " tailword")
    val docs = (bpDocs :+ dupA :+ dupB).toDF("doc_id", "text")

    // Structural claim 1: the block is ~40% of an affected doc's
    // shingles — above the 30% suffix the τ=0.3 prefix filter excludes,
    // so boilerplate postings reach the uncapped candidate join.
    val nSh = 54 + 37 - (n - 1) // 91 words -> 89 word-3-shingles
    val bpSh = 37 - (n - 1) // 35 block-INTERNAL shingles (the shared ones;
    // the 2 body/block boundary shingles contain per-doc-unique words)
    assert(bpSh.toDouble / nSh > tau,
      s"construction broken: block fraction $bpSh/$nSh must exceed τ=$tau")

    // Structural claim 2: a boilerplate-only pair scores J = b/(2n−b)
    // < τ — present as candidates, absent from the answer.
    val jBpOnly = bpSh.toDouble / (2 * nSh - bpSh)
    assert(jBpOnly < tau, s"J(bp-only)=$jBpOnly must stay under τ=$tau")

    val uncapped = Dedup.jaccardPairsPrefix(docs, n, tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.jaccardPairsCapped(docs, n, tau, capDf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // No boilerplate-only pair in the exact answer; the content dup in
    // both routes; routes agree exactly.
    assert(uncapped.contains((100L, 101L)), "content near-dup lost (uncapped)")
    assert(capped.contains((100L, 101L)), "content near-dup lost (capped)")
    assert(!uncapped.exists { case (a, b) => a < 12 && b < 12 },
      "boilerplate-only pair leaked into the exact answer")
    assert(uncapped == capped, "capped and uncapped answers must agree")
  }

  test("run writes the skewed documents table and measure pins the cap characterization") {
    val tmp = java.nio.file.Files.createTempDirectory("skew-spec").toString
    SkewCorpus.run(spark, "/root/testdata/sf0.001", tmp, everyK = 5,
      bpWords = 37)
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(docs.count() == src.count())
    val bpClass = docs.filter(col("text").contains("bpw0")).count()
    assert(bpClass == src.filter(col("doc_id") % 5 === 0).count())
    // n_chars tracks the rewritten text (downstream stats read it).
    assert(docs.filter(org.apache.spark.sql.functions.length(col("text"))
      =!= col("n_chars")).count() == 0)
    // measure's own requires are the real pins (capped ⊆ uncapped;
    // every uncapped-only pair chrome-induced) — they throw on breach.
    val json = SkewCorpus.measure(spark, tmp, runs = 1)
    assert(json.contains("\"capped_subset\":true"))
    assert(json.contains("\"uncapped_only_all_chrome\":true"))
    assert(json.contains(s""""bp_class":$bpClass"""))
  }
}
