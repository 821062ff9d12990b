package graft

import graft.graph._
import graft.ml.{Cosine, DummyVectors}
import graft.sources.GraphCsv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parity run on the reference's own Quakers dataset
  * (`/root/reference/data/input_graphs/Quakers/`, 119 nodes / 174 edges,
  * reference config `confs/quakers.yml`): the first feature column is the
  * node id and `Gender` is the encoded feature, as in the reference's
  * `features_to_check` handling (`spark_manager.py:151-176`).
  * Structural assertions only — the reference repo records no golden
  * community output (SURVEY §5).
  */
class QuakersSpec extends SparkSpec {

  private val base = "/root/reference/data/input_graphs/Quakers"

  test("quakers end-to-end: load, similarities, betweenness, one iteration") {
    assume(new java.io.File(s"$base/quakers_nodelist.csv2").exists())
    implicit val s: SparkSession = spark
    val nodes = GraphCsv.loadNodes(spark, s"$base/quakers_nodelist.csv2",
      Seq("significance", "gender", "birth", "death", "internal_id"))
    val edges = GraphCsv.loadEdges(spark, s"$base/quakers_edgelist.csv2")
    assert(nodes.count() == 119 && edges.count() == 174)

    val g = PropertyGraph(nodes, edges)
    // Init step with the reference's Gender feature.
    val vectors = DummyVectors.create(nodes, Seq("gender"))
    val sims = Cosine.edgeSimilarities(edges, vectors)
    assert(sims.count() == 174)
    // One-hot single feature: cosine is exactly 0 or 1.
    assert(sims.select(countDistinct(col("similarity"))).head().getLong(0) <= 2)

    val btw = Betweenness.run(g, maxLen = 2)
    // Symmetric betweenness: every directed edge appears with its mirror.
    val asym = btw.select(col("edges.src").as("s"), col("edges.dst").as("d"),
        col("betweenness").as("b"))
    val mirrored = asym.as("x").join(asym.as("y"),
      col("x.s") === col("y.d") && col("x.d") === col("y.s") &&
      col("x.b") =!= col("y.b"))
    assert(mirrored.count() == 0)

    // One loop iteration with the reference's default thresholds
    // (confs/quakers.yml:58-64) deletes edges and keeps a valid graph.
    val (next, deleted) = HgnPipeline.iterate(g, sims, btw, HgnParams())
    assert(deleted > 0)
    val remaining = next.edges.select("src", "dst").distinct().count()
    assert(remaining < 174 && remaining > 0)
    // No edge may reference a dropped vertex.
    val vIds = next.vertices.select("id")
    assert(next.edges.join(vIds, next.edges("src") === vIds("id"), "left_anti")
      .count() == 0)
  }

  test("quakers at max_sp_length=3 (hub-capped): the full loop converges " +
      "and yields community structure") {
    // The reference exposes `max_sp_length` as a YAML knob
    // (confs/quakers.yml:64); g17 proves the k=3 path algebra under the
    // DuckDB oracle, and this proves it COMPOSES into the actual
    // fixpoint pipeline (round-17 VERDICT ask #7) — same dataset, same
    // default thresholds, path bound raised to 3 with the g17 hub cap.
    assume(new java.io.File(s"$base/quakers_nodelist.csv2").exists())
    implicit val s: SparkSession = spark
    val nodes = GraphCsv.loadNodes(spark, s"$base/quakers_nodelist.csv2",
      Seq("significance", "gender", "birth", "death", "internal_id"))
    val edges = GraphCsv.loadEdges(spark, s"$base/quakers_edgelist.csv2")
    val g = PropertyGraph(nodes, edges)
    val sims = Cosine.edgeSimilarities(edges,
      DummyVectors.create(nodes, Seq("gender")))

    // The longer bound must actually bite: under the SAME hub cap,
    // admitting length-3 geodesics can only add path mass, and on this
    // graph some edge's count must strictly grow.
    val cap = Some(16L)
    def total(maxLen: Int) = Betweenness.run(g, maxLen, cap)
      .agg(sum(col("betweenness").cast("double"))).head().getDouble(0)
    val (t2, t3) = (total(2), total(3))
    assert(t3 > t2, s"k=3 added no path mass over k=2 (t2=$t2, t3=$t3)")

    val params = HgnParams(maxSpLength = 3, maxMidDegree = cap,
      maxSteps = 20)
    val result = HgnPipeline.run(g, sims, params)
    // TRUE convergence, not a maxSteps timeout: one more iteration on
    // the fixpoint deletes nothing.
    val btw3 = Betweenness.run(g, 3, cap)
    assert(HgnPipeline.iterate(result, sims, btw3, params)._2 == 0,
      "loop hit maxSteps without converging")
    // Community structure: the converged graph is non-empty, splits
    // into more than one connected component, and every surviving edge
    // references live vertices.
    val remaining = result.edges.select("src", "dst").distinct().count()
    assert(remaining > 0 && remaining < 174)
    val comps = Communities.connectedComponents(result)
    val nComps = comps.select("component").distinct().count()
    assert(nComps >= 2, s"expected >=2 communities, got $nComps")
    val vIds = result.vertices.select("id")
    assert(result.edges.join(vIds, result.edges("src") === vIds("id"),
      "left_anti").count() == 0)
  }
}
