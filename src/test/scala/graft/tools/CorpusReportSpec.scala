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

  test("groups= pins near_dup_docs to the Curate artifact == fresh resolve") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Planted near-dup corpus where Curate's pre-groups stages are
    // no-ops (every doc passes quality, no exact dups), so the groups
    // artifact is resolved over exactly the input relation and the
    // consistency claim is directly checkable: the pinned card's
    // near_dup_docs == a fresh resolveDupGroups over the same corpus ==
    // the unpinned card's own resolve.
    val body = (i: Int) => (0 until 40).map(w =>
      s"the word${(i * 53 + w * 7) % 23} is about token$w and it").mkString(" ")
    val docs = ((0 until 20).flatMap { i =>
      val t = s"doc $i " + body(i)
      Seq((i * 2L, t, "web"), (i * 2L + 1, t + " tail", "web"))
    } ++ (100 until 110).map(i =>
      (i.toLong * 2, s"unique doc $i " + body(i + 1000), "books")))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("card-grp").toString
    docs.write.parquet(s"$dir/docs.parquet")
    Curate.run(spark, s"$dir/docs.parquet", s"$dir/cur",
      benchmarkPath = None, jaccardT = 0.8)

    def num(json: String, k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json)
        .getOrElse(fail(s"missing $k in $json")).group(1).toLong
    val pinned = CorpusReport.build(spark, s"$dir/docs.parquet",
      merges = 8, packBudget = 256L, jaccardT = 0.8,
      dupGroupsDir = Some(s"$dir/cur/groups"))
    val fresh = graft.pipeline.Dedup.resolveDupGroups(docs,
        graft.pipeline.Dedup.jaccardPairsPrefix(docs, 3, 0.8))
      .filter(col("doc_id") =!= col("canonical_id")).count()
    // >= 20: the 20 planted pairs are a floor — the templated bodies
    // legitimately form extra cross-doc near-dup pairs at J>=0.8, which
    // both resolves (artifact and fresh) must agree on identically.
    assert(fresh >= 20L, s"fixture should plant >=20 near-dups, got $fresh")
    assert(num(pinned, "near_dup_docs") == fresh)
    assert(pinned.contains(s""""dup_groups_src":"$dir/cur/groups""""))
    // the unpinned card resolves the same thing itself
    val unpinned = CorpusReport.build(spark, s"$dir/docs.parquet",
      merges = 8, packBudget = 256L, jaccardT = 0.8)
    assert(num(unpinned, "near_dup_docs") == fresh)
    assert(unpinned.contains(""""dup_groups_src":"resolved-in-card""""))
    // Provenance count (round-17 ADVICE): the pinned card records the
    // artifact's own doc universe — here Curate's pre-groups stages are
    // no-ops, so it equals the corpus (50 docs); unpinned cards resolve
    // over the corpus itself.
    assert(num(pinned, "dup_groups_docs") == 50L)
    assert(num(unpinned, "dup_groups_docs") == 50L)
  }

  test("groups= from the wrong corpus fails loudly instead of reporting a " +
      "plausible stat") {
    import spark.implicits._
    // A groups artifact referencing doc_ids that don't exist in the
    // card corpus is stale or wrong-corpus — the subset check must
    // refuse it (round-17 ADVICE: shape-only validation let it pass).
    val docs = (0 until 10).map(i => (i.toLong, s"doc number $i", "web"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("card-wrong").toString
    docs.write.parquet(s"$dir/docs.parquet")
    Seq((900L, 900L, true), (901L, 900L, false))
      .toDF("doc_id", "group_id", "is_canonical")
      .write.parquet(s"$dir/stale-groups")
    val e = intercept[IllegalArgumentException] {
      CorpusReport.build(spark, s"$dir/docs.parquet",
        merges = 4, packBudget = 256L, jaccardT = 0.8,
        dupGroupsDir = Some(s"$dir/stale-groups"))
    }
    assert(e.getMessage.contains("absent from"))
  }
}
