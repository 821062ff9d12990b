package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Lineage

/** k-core decomposition membership — the standard graph-curation
  * operator (Seidman 1983 "Network structure and minimum degree"): the
  * k-core is the maximal subgraph in which every vertex has degree ≥ k
  * WITHIN the subgraph. Corpus-graph pipelines use it to strip
  * low-engagement fringe (crawl tendrils, near-isolated link spam)
  * before the expensive analytics run; the reference's closest surface
  * is its degree-threshold edge deletion (`edge_betweenness_centrality`
  * pipeline's min-degree filter), which is exactly ONE peel round — the
  * k-core is that filter iterated to its fixed point.
  *
  * Formulation: distributed iterative peeling. Each round recomputes
  * in-subgraph degrees (one map-side-combinable aggregate on the vertex
  * key) and keeps only edges whose BOTH endpoints still clear k (two
  * hash semi-joins on the endpoint keys). The edge set shrinks
  * monotonically, so a round that removes nothing is the fixed point —
  * count equality IS set equality here, no content signature needed
  * (unlike connected components, where the edge set mutates in place
  * and [[Communities]] hashes it).
  *
  * 100 TB design: every stage is a key-partitioned aggregate or
  * equi-semi-join on the (shrinking) edge relation — no driver state
  * beyond the one convergence scalar per round, no vertex-indexed
  * mutable structure. Rounds are bounded by the peel cascade depth
  * (≤ 23 on the test graphs; O(n) worst case on a path, which is why
  * `maxRounds` throws loudly instead of emitting a half-peeled core).
  * Lineage is cut between rounds (`localCheckpoint`) so the plan stays
  * flat across iterations.
  */
object KCore {

  /** Vertices of the k-core with their within-core degree.
    *
    * @param edges undirected edges `(src, dst)`; canonicalized (self-loops
    *   dropped, one row per unordered pair) defensively here.
    * @return `(id LONG, deg_in_core LONG)` — empty when the core is empty.
    */
  def run(edges: DataFrame, k: Int, maxRounds: Int = 100)(
      implicit spark: SparkSession): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    val canon = edges
      .select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("u"),
        greatest(col("s"), col("d")).as("v"))
      .distinct()
    // Symmetrize once: degree of x = row count with src = x.
    var sym = Lineage.cut(
      canon.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(canon.select(col("v").as("src"), col("u").as("dst"))))
    var prev = sym.count()
    var converged = prev == 0L
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val keep = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("ok"))
      sym = Lineage.cut(
        sym.join(keep.withColumnRenamed("ok", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("ok", "dst"), Seq("dst"), "left_semi"))
      val n = sym.count()
      converged = n == prev // monotone shrink: same count == same set
      prev = n
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"kCore($k): peeling did not reach a fixed point within $maxRounds " +
        s"rounds — refusing to emit a non-converged core")
    sym.groupBy("src").agg(count(lit(1)).as("deg_in_core"))
      .select(col("src").as("id"), col("deg_in_core"))
  }
}
