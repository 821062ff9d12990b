package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge, Graph}

/** Connected components → communities (SURVEY §2.9 G4) and the
  * small-community filter (`graph_tools/graph_tools.py:519-540`).
  *
  * The reference called GraphFrames `g.connectedComponents()`; no
  * GraphFrames jar exists in this environment, so this drops to GraphX's
  * Pregel implementation — the one distributed piece of the engine that
  * genuinely needs per-partition iteration rather than a Catalyst plan.
  * GraphX labels every vertex with the LOWEST vertex id in its component,
  * which is also what the DuckDB oracle (min reachable id) computes.
  */
object Communities {

  /** `(id, component)` for every vertex of `g` (isolated vertices form
    * their own singleton components).
    */
  def connectedComponents(g: PropertyGraph)(implicit spark: SparkSession): DataFrame = {
    val vrdd = g.vertices.select(col("id").cast("long")).rdd
      .map(r => (r.getLong(0), ()))
    val erdd = g.edges.select(col("src").cast("long"), col("dst").cast("long")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val cc = Graph(vrdd, erdd).connectedComponents().vertices
    spark.createDataFrame(cc.map { case (id, comp) => (id, comp) })
      .toDF("id", "component")
  }

  /** Component sizes: `(component, size)` — the A4 aggregate
    * (`graph_tools/graph_tools.py:530-532`).
    */
  def componentSizes(components: DataFrame): DataFrame =
    components.groupBy("component").agg(count(lit(1)).as("size"))

  /** Drop communities smaller than `minNodeCount`, then drop vertices left
    * isolated — `filter_out_small_communities`
    * (`graph_tools/graph_tools.py:519-540`): having-style size filter (A4),
    * left-semi of vertices against big components (J9), left-semi of edges
    * against kept vertices, dropIsolatedVertices (G5).
    */
  def filterSmallCommunities(g: PropertyGraph, minNodeCount: Int)(
      implicit spark: SparkSession): PropertyGraph = {
    val components = connectedComponents(g)
    val big = componentSizes(components).filter(col("size") >= minNodeCount)
    val keptIds = components
      .join(big.select("component"), Seq("component"), "left_semi")
      .select("id")
    g.inducedSubgraph(keptIds).dropIsolatedVertices
  }
}
