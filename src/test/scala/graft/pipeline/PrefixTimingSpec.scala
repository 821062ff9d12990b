package graft.pipeline

import graft.{SparkSpec, Tables}

/** Differential check of the two exact-Jaccard plans on real corpus data
  * (unit-scale equivalence is in PipelineSpec; this covers the sf0.01
  * shingle distribution with its skewed document frequencies).
  */
class PrefixTimingSpec extends SparkSpec {
  test("prefix-filtered == inverted-index on the sf0.01 corpus") {
    assume(new java.io.File("/root/testdata/sf0.01").isDirectory)
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val a = Dedup.jaccardPairs(docs, 3, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Dedup.jaccardPairsPrefix(docs, 3, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty)
  }
}
