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
}
