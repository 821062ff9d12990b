package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall harness for the k-means IVF path (VERDICT round 5 "Next round"
  * #4): recall@10 of [[Ann.kmeansQuantizer]] + [[Ann.ivfTopKProbedReps]]
  * against the exact brute-force baseline, at nprobe ∈ {1, 2, 4}.
  *
  * Recall is mathematically non-decreasing in nprobe for a fixed
  * assignment (probing more cells only adds candidates, and any candidate
  * that displaces a true top-k member from the IVF top-k must itself be a
  * true top-k member), so the monotonicity assertion is exact, not
  * statistical.
  *
  * The absolute yardstick is the SCANNED FRACTION, not a fixed recall
  * number: the synthetic embeddings are unit vectors with near-random
  * angular structure (the `label` column carries no cosine locality —
  * same-label mean cosine ≈ 0, and only ~14% of true top-10 neighbors
  * share the query's label), so no quantizer reaches the recalls a real
  * clustered corpus would give. A quantizer that beats RANDOM cell
  * selection must have recall well above nprobe/numCells — that is what
  * is asserted (measured: 0.32/0.41/0.55 vs random 0.06/0.12/0.25, a
  * 2-5x margin).
  *
  * Measured values are printed for BASELINE.md.
  */
class AnnRecallSpec extends SparkSpec {

  test("kmeans IVF: recall@10 is monotone in nprobe and reaches the floor") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id") < 20)
    val k = 10

    val brute = Ann.bruteForceTopK(queries, corpus, k)
      .select("query_id", "neighbor_id").cache()
    val nBrute = brute.count().toDouble
    assert(nBrute == 20 * k, s"brute baseline incomplete: $nBrute")

    val (assigned, reps) = Ann.kmeansQuantizer(corpus, numCells = 16)
    assert(reps.count() == 16)
    // A real partition: no cell may hold the whole corpus (that would
    // make every recall trivially 1.0 and the harness meaningless).
    val maxCell = assigned.groupBy("cell").count()
      .agg(max("count")).head().getLong(0)
    assert(maxCell < 500, s"degenerate quantizer: one cell holds $maxCell")

    val recalls = Seq(1, 2, 4).map { nprobe =>
      val ivf = Ann.ivfTopKProbedReps(queries, assigned, "cell", reps, nprobe, k)
        .select("query_id", "neighbor_id")
      val hit = ivf.join(brute, Seq("query_id", "neighbor_id")).count()
      nprobe -> hit / nBrute
    }
    info(s"kmeans IVF recall@10 (sf0.001, 16 cells, 20 queries): " +
      recalls.map { case (p, r) => f"nprobe=$p%d $r%.3f" }.mkString(", "))
    recalls.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(a <= b + 1e-9, s"recall not monotone: $recalls")
    }
    recalls.foreach { case (nprobe, r) =>
      val randomBaseline = nprobe / 16.0
      assert(r > randomBaseline * 1.5,
        s"nprobe=$nprobe recall $r does not beat random cell selection " +
          s"($randomBaseline) — quantizer broken: $recalls")
    }

    // Exactness at the limit: probing EVERY cell scans the whole corpus,
    // so the IVF result must equal brute force bit-for-bit (same
    // micro-cosine, same id tie-breaks) — recall exactly 1.0, not ~1.0.
    val full = Ann.ivfTopKProbedReps(queries, assigned, "cell", reps,
        nprobe = 16, k = k)
      .select("query_id", "neighbor_id")
    assert(full.join(brute, Seq("query_id", "neighbor_id")).count() == nBrute,
      "nprobe=numCells must reproduce brute force exactly")
    brute.unpersist()
  }

  test("planted clusters: production IVF-PQ path reaches recall >= 0.9") {
    // VERDICT round 7 #2: every prior recall number was data-bounded
    // (near-random vectors). This corpus PLANTS the neighbor structure
    // (125 tight clusters of 80), so the number measures the QUANTIZER.
    // Budget: nprobe = 8 of 32 cells (25%), rerank pool 100, k = 10.
    val corpus = graft.tools.PlantedCorpus
      .generate(spark, nClusters = 125, perCluster = 80, dim = 64,
        epsMilli = 150)
      .select(col("vec_id"), col("cluster"), col("embedding"))
      .cache()
    val vecs = corpus.select(col("vec_id"), col("embedding"))
    val queries = vecs.filter(col("vec_id") < 100)
    val k = 10

    val brute = Ann.bruteForceTopK(queries, vecs, k)
      .select("query_id", "neighbor_id").cache()
    val nBrute = brute.count().toDouble
    assert(nBrute == 100 * k, s"brute baseline incomplete: $nBrute")

    // The corpus must actually be clustered: a query's exact top-10
    // should lie in its own planted cluster.
    val sameCluster = brute
      .join(corpus.select(col("vec_id").as("query_id"),
        col("cluster").as("qc")), Seq("query_id"))
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("cluster").as("nc")), Seq("neighbor_id"))
      .filter(col("qc") === col("nc")).count() / nBrute
    assert(sameCluster > 0.95,
      s"planted structure missing: same-cluster fraction $sameCluster")

    // Full production path, as AnnIndex composes it.
    val (cells, reps) = Ann.kmeansQuantizer(vecs, numCells = 32)
    val cb = Pq.train(vecs, m = 8, nbits = 4)
    val codes = Pq.encode(vecs, cb)
    val got = Pq.rerank(
      Pq.ivfPqTopK(queries, codes, cells.select("vec_id", "cell"),
        reps, cb, nprobe = 8, k = 100),
      queries, vecs, k)
      .select("query_id", "neighbor_id")
    val recall = got.join(brute, Seq("query_id", "neighbor_id")).count() /
      nBrute
    info(f"planted-cluster IVF-PQ recall@10: $recall%.3f " +
      "(32 cells, nprobe=8, pool=100)")
    assert(recall >= 0.9,
      s"production path recall $recall < 0.9 on clusterable data")
    corpus.unpersist(); brute.unpersist()
  }

  test("semdedup production path: kmeans pivots collapse planted duplicates") {
    // p34's oracle keeps deterministic low-id pivots; the PRODUCTION
    // swap-in is the k-means quantizer (BASELINE round-10 caveat). This
    // measures that path on a corpus with PLANTED duplication: 40 tight
    // clusters x 10 vectors, within-cluster cosine >> 0.8, cross-cluster
    // ~0 at dim 64. Effective semantic dedup must keep >= 1 per planted
    // cluster (cross-cluster sims never reach the threshold) and collapse
    // most of the 10x within-cluster duplication; a split cluster keeps
    // at most one vector per k-means cell, bounding the leftover.
    val corpus = graft.tools.PlantedCorpus
      .generate(spark, nClusters = 40, perCluster = 10, dim = 64,
        epsMilli = 50)
      .select(col("vec_id"), col("cluster").as("planted"), col("embedding"))
      .cache()
    val vecs = corpus.select(col("vec_id"), col("embedding"))
    val (_, reps) = Ann.kmeansQuantizer(vecs, numCells = 40)
    val result = Ann.semDedup(vecs,
      reps.select(col("cell").as("cluster"), col("rep")), 800000L)
    val kept = result.filter(col("kept")).count()
    info(s"semdedup kmeans path: kept $kept of 400 (40 planted clusters)")
    assert(kept >= 40L, s"dropped below one per planted cluster: $kept")
    assert(kept <= 64L, s"dedup too weak — kept $kept of 400 planted 10x dups")
    // Safety: a kept-false vector must share its planted cluster with a
    // kept lower-id vector (nothing outside the planted near-dup set is
    // ever dropped — cross-cluster cosines sit far below the threshold).
    val badDrop = result.filter(!col("kept"))
      .join(corpus.select(col("vec_id"), col("planted")), Seq("vec_id"))
      .join(result.filter(col("kept"))
        .join(corpus.select(col("vec_id"), col("planted")), Seq("vec_id"))
        .select(col("planted"), col("vec_id").as("keeper")),
        Seq("planted"), "left_anti")
      .count()
    assert(badDrop == 0L, s"$badDrop vectors dropped with no same-planted keeper")
    corpus.unpersist()
  }

  test("kmeans quantizer tolerates an all-zero embedding") {
    import spark.implicits._
    // norm 0 → the normalized copy must be the zero vector, not null
    // components (array_to_vector NPEs on nulls); the row still lands
    // in some cell.
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0f, 0f)), (4L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val (assigned, reps) = Ann.kmeansQuantizer(corpus, numCells = 2, seed = 7L)
    assert(assigned.count() == 4)
    assert(assigned.filter(col("vec_id") === 3L && col("cell").isNotNull)
      .count() == 1)
    assert(reps.count() == 2)
  }
}
