package graft.tools

import graft.SparkSpec

class CorpusReportSpec extends SparkSpec {

  test("data card is internally consistent on the smoke corpus") {
    val json = CorpusReport.build(spark,
      "/root/testdata/sf0.001/documents.parquet",
      merges = 8, packBudget = 256L, jaccardT = 0.8)
    def num(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json)
        .getOrElse(fail(s"missing $k in $json")).group(1).toLong
    assert(num("docs") == 500L)
    assert(num("sources") == 20L)
    assert(num("bpe_merges") == 8L)
    // token total sits between words (1 token/word lower bound) and a
    // trained-vocab upper bound (chars + one marker per word)
    assert(num("bpe_tokens") >= num("words"))
    assert(num("bpe_tokens") <= num("chars") + num("words"))
    // dedup accounting: distinct texts + exact dup docs == docs
    assert(num("distinct_texts") + num("exact_dup_docs") == num("docs"))
    assert(num("near_dup_docs") >= 0 && num("near_dup_docs") < num("docs"))
    assert(num("quality_pass") <= num("docs"))
    // ccnet buckets cover every scoreable doc
    val buckets = Seq("head", "middle", "tail").map(num).sum
    assert(buckets == num("docs"))
    // packing: bins can't undershoot the perfect-fill floor
    assert(num("pack_bins") >= num("bpe_tokens") / 256L / 2)
    // the artifact is valid JSON shape-wise (balanced braces)
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }
}
