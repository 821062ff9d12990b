package graft

import java.nio.file.Files

import graft.config.HgnConfig
import graft.graph.HgnParams
import org.apache.spark.sql.functions._

/** `cached_init_step` warm start (VERDICT round 2, "Next round" #6;
  * reference `main.py:243-245`, `confs/quakers.yml:57`).
  *
  * Proof that the resumed run really SKIPS the init compute (not just
  * produces the same answer): after the first warm-started run persists
  * `output.dir/init/{similarities,betweenness}.parquet`, the cached
  * similarities are overwritten with zeros — a poisoned value that
  * changes the edge-weight decisions. A second warm-started run must
  * reflect the poison (cache honored ⇒ triangles deleted); a cold run of
  * the same conf must NOT (init recomputed from features ⇒ graph kept).
  */
class WarmStartSpec extends SparkSpec {

  /** Two triangles joined by a bridge; every node shares the same single
    * feature value, so computed similarities are all 1.0.
    *
    * Params: rLvl1Thres=2 (keepit never fires), maxEdgeWeight=0.5,
    * betweennessThres=1e9 (betweenness branch never fires). Triangle
    * edges have common neighbors ⇒ get an edge weight: 1.0 with real
    * sims (kept), 0.0 with poisoned sims (deleted).
    */
  private def writeGraph(dir: String): (String, String) = {
    val nodes = s"$dir/nodes.csv"
    val edges = s"$dir/edges.csv"
    val n = (1 to 6).map(i => s"$i,x").mkString("id,f1\n", "\n", "\n")
    val e = Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4))
      .map { case (a, b) => s"$a,$b" }.mkString("src,dst\n", "\n", "\n")
    Files.write(java.nio.file.Paths.get(nodes), n.getBytes)
    Files.write(java.nio.file.Paths.get(edges), e.getBytes)
    (nodes, edges)
  }

  private def confFor(dir: String, nodes: String, edges: String,
      cached: Boolean): HgnConfig =
    HgnConfig(
      nodesPath = nodes, edgesPath = edges,
      featureNames = Seq("f1"), featuresToCheck = Seq("f1"),
      params = HgnParams(rLvl1Thres = 2.0, rLvl2Thres = 2.0,
        maxEdgeWeight = 0.5, betweennessThres = 1e9, maxSteps = 3),
      outputDir = dir, saveCommunities = false, cachedInitStep = cached)

  test("warm start persists, reuses, and cold runs ignore the cache") {
    implicit val s = spark
    val dir = Files.createTempDirectory("warmstart").toString
    val (nodes, edges) = writeGraph(dir)

    // Run 1 (warm flag, cold cache): computes init, persists it.
    val r1 = Hgn.run(confFor(dir, nodes, edges, cached = true))
    assert(r1.edges.count() == 7, "all-1.0 similarities keep every edge")
    val simPath = s"$dir/init/similarities.parquet"
    assert(Files.exists(java.nio.file.Paths.get(simPath)), "init persisted")
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/init/betweenness.parquet")))

    // Poison the cached similarities: all zeros.
    val poisoned = spark.read.parquet(simPath)
      .select(col("src"), col("dst"), lit(0.0).as("similarity"))
    poisoned.write.mode("overwrite").parquet(s"$dir/init/similarities2.parquet")
    spark.read.parquet(s"$dir/init/similarities2.parquet")
      .write.mode("overwrite").parquet(simPath)

    // Run 2 (warm flag, poisoned cache): must reflect the poison — the
    // triangle edges get weight 0.0 < 0.5 and are deleted.
    val r2 = Hgn.run(confFor(dir, nodes, edges, cached = true))
    assert(r2.edges.count() < 7,
      s"poisoned cache must shrink the graph, got ${r2.edges.count()} edges")

    // Run 3 (cold): recomputes init from features, ignores the poison.
    val r3 = Hgn.run(confFor(dir, nodes, edges, cached = false))
    assert(r3.edges.count() == 7, "cold run recomputes real similarities")

    // Run 4 (warm flag, poisoned cache, CHANGED params): the fingerprint
    // (max_sp_length 2 → 3) must invalidate the cache — init recomputed
    // from features, poison ignored, cache + fingerprint rewritten.
    val changed = confFor(dir, nodes, edges, cached = true)
    val changedParams = changed.copy(params = changed.params.copy(maxSpLength = 3))
    val r4 = Hgn.run(changedParams)
    assert(r4.edges.count() == 7,
      "changed params must invalidate the poisoned cache")

    // The rewritten cache must resolve through the PATH's own filesystem,
    // not the environment default (round-4 ADVICE low: FileSystem.get).
    // mockfs:// is a local FS registered under a non-default scheme; the
    // old FileSystem.get(conf) code threw `Wrong FS` on such a path.
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)
    val viaMockFs = Hgn.cachedInit(s"mockfs:$dir/init",
      Hgn.paramsFingerprint(changedParams))
    assert(viaMockFs.isDefined, "cache must be found via a non-default scheme")
    assert(viaMockFs.get._1.count() > 0)
    // ...and a fingerprint mismatch through the same scheme misses.
    assert(Hgn.cachedInit(s"mockfs:$dir/init",
      Hgn.paramsFingerprint(confFor(dir, nodes, edges, cached = true))).isEmpty)

    // Input identity is part of the key (round-5 ADVICE): same params but
    // a different input dataset must NOT validate the cached init tables.
    val otherInput = changedParams.copy(nodesPath = s"$dir/other_nodes.csv")
    assert(Hgn.paramsFingerprint(otherInput) !=
      Hgn.paramsFingerprint(changedParams))
    assert(Hgn.cachedInit(s"$dir/init",
      Hgn.paramsFingerprint(otherInput)).isEmpty,
      "cache built from different input paths must miss")
  }
}

/** A local filesystem under a non-default URI scheme, for testing that
  * path-dependent FileSystem resolution really follows the path.
  */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
