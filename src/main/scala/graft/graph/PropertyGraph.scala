package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** An undirected property graph over two DataFrames, the engine's core
  * abstraction (reference: the GraphFrame wrapper built at
  * `spark_manager/spark_manager.py:91-100` and `main.py:112`).
  *
  * Invariants:
  *   - `vertices` has an `id` column (LongType) plus arbitrary feature
  *     columns (reference schema: `spark_manager/spark_manager.py:113-116`).
  *   - `edges` has `src`/`dst` columns (LongType) and optionally `weight`
  *     (`spark_manager/spark_manager.py:135-147`).
  *   - Undirected semantics are *emulated*: edges are stored once and
  *     symmetrized on demand (`graph_tools/graph_tools.py:125-126`).
  *
  * Scale notes: every method here is a declarative DataFrame transform, so
  * Catalyst prunes/pushes down and AQE picks join strategies; nothing
  * collects to the driver.
  */
final case class PropertyGraph(vertices: DataFrame, edges: DataFrame) {
  require(vertices.columns.contains("id"), "vertices must have an `id` column")
  require(edges.columns.contains("src") && edges.columns.contains("dst"),
    "edges must have `src` and `dst` columns")

  /** Both orientations of every edge — the reference's
    * `edges.union(edges.select(dst as src, src as dst))`
    * (`graph_tools/graph_tools.py:125-126, 171-173, 336-337`).
    */
  def symmetrized: DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** Distinct symmetrized adjacency (drops multi-edges and, defensively,
    * self-loops). The building block for neighborhoods/paths.
    */
  def adjacency: DataFrame =
    symmetrized.filter(col("src") =!= col("dst")).distinct()

  /** Per-vertex degree over the distinct symmetrized adjacency. */
  def degrees: DataFrame =
    adjacency.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** Remove degree-0 vertices — GraphFrames `dropIsolatedVertices()`
    * (`main.py:208`, `graph_tools/graph_tools.py:540`) rebuilt as a
    * left-semi join of vertices against the union of edge endpoints
    * (SURVEY §2.3 J10).
    */
  def dropIsolatedVertices: PropertyGraph = {
    val endpoints = edges
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct()
    PropertyGraph(vertices.join(endpoints, Seq("id"), "left_semi"), edges)
  }

  /** Keep only the given vertices, and the edges with both endpoints kept
    * (the semi-join pair at `graph_tools/graph_tools.py:533-538`).
    */
  def inducedSubgraph(keptVertexIds: DataFrame): PropertyGraph = {
    val kept = keptVertexIds.select(col("id"))
    val v = vertices.join(kept, Seq("id"), "left_semi")
    val e = edges
      .join(kept.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(kept.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    PropertyGraph(v, e)
  }
}
