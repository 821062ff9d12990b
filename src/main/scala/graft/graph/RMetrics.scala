package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-edge r-metrics (common-neighbor ratios) and the keep-edge decision,
  * matching the reference's `remove_edges_using_r_metrics`
  * (`graph_tools/graph_tools.py:372-435`):
  *
  *   - common neighbors of an edge's endpoints at levels 1 and 2, with the
  *     endpoints themselves removed from each side first (the
  *     `udf_merge_neighbors` semantics, lines 389-397);
  *   - `r11 = |CN1| / deg1(src)`, `r12 = |CN1| / deg1(dst)`,
  *     `r21 = |CN2| / deg2(src)`, `r22 = |CN2| / deg2(dst)`, with a
  *     `count > 0` guard returning 0.0 (lines 400-401);
  *   - `keepit = r11 > t1 ∨ r12 > t1 ∨ r21 > t2 ∨ r22 > t2` (lines 402-404).
  *
  * The reference used four Python UDFs; all four are replaced with
  * codegen'd built-ins (SURVEY §2.7 F2-F5): `array_except`/`array_intersect`
  * for the set logic, `size` for counts, `when` for the guarded ratio and
  * the boolean keep condition. No UDF — the whole stage stays inside
  * whole-stage codegen, which matters because this runs every HGN
  * iteration over every edge.
  *
  * Ratios are DoubleType (the reference emitted Python floats through a
  * FloatType UDF; double is Spark-native and what the DuckDB oracle uses).
  */
object RMetrics {

  /** Common neighbors of `src`/`dst` given both endpoint neighbor arrays,
    * endpoints excluded — `udf_merge_neighbors` as built-ins (F2).
    */
  def commonNeighbors(nbSrc: Column, nbDst: Column, src: Column, dst: Column): Column =
    array_intersect(
      array_except(nbSrc, array(src, dst)),
      array_except(nbDst, array(src, dst)))

  /** `common / count` with a zero-count guard (F4). */
  def ratio(common: Column, cnt: Column): Column =
    when(cnt > 0, common.cast("double") / cnt.cast("double")).otherwise(lit(0.0))

  /** Attach one neighborhood level to both endpoints of each edge and emit
    * the common-neighbor array + the two ratios. `nbs` is the output of
    * [[Neighborhoods.neighbors]]; the two inner joins are the J2 shape
    * (`graph_tools/graph_tools.py:406-423`). At scale, `nbs` shuffles on
    * `id` and edges on `src`/`dst` — the same key, so the second join
    * reuses the partitioning of the first's output side.
    */
  private def attachLevel(edges: DataFrame, nbs: DataFrame): DataFrame = {
    val atSrc = nbs.select(
      col("id").as("src"), col("count").as("count_src"), col("neighbors").as("nb_src"))
    val atDst = nbs.select(
      col("id").as("dst"), col("count").as("count_dst"), col("neighbors").as("nb_dst"))
    edges.join(atSrc, Seq("src")).join(atDst, Seq("dst"))
      .withColumn("common_neighbors",
        commonNeighbors(col("nb_src"), col("nb_dst"), col("src"), col("dst")))
      .withColumn("count_common", size(col("common_neighbors")))
  }

  /** Full r-metrics table for every edge of `g`:
    * `(src, dst, common_neighbors, r11, r12, r21, r22, keepit)`.
    * `common_neighbors` is the LEVEL-2 common-neighbor array — the
    * reference overwrote the level-1 array with the level-2 one before
    * emitting (`graph_tools/graph_tools.py:424-430`), and downstream edge
    * weights consume exactly that.
    */
  def edgesWithMetrics(
      g: PropertyGraph,
      lvl1: DataFrame,
      lvl2: DataFrame,
      rLvl1Thres: Double,
      rLvl2Thres: Double): DataFrame = {
    val e = g.edges.select("src", "dst")
    val withL1 = attachLevel(e, lvl1)
      .select(col("src"), col("dst"),
        ratio(col("count_common"), col("count_src")).as("r11"),
        ratio(col("count_common"), col("count_dst")).as("r12"))
    val withL2 = attachLevel(withL1, lvl2)
      .select(col("src"), col("dst"), col("common_neighbors"),
        col("r11"), col("r12"),
        ratio(col("count_common"), col("count_src")).as("r21"),
        ratio(col("count_common"), col("count_dst")).as("r22"))
    withL2.withColumn("keepit",
      col("r11") > rLvl1Thres || col("r12") > rLvl1Thres ||
      col("r21") > rLvl2Thres || col("r22") > rLvl2Thres)
  }

  /** Convenience: compute both neighborhood levels and the metrics.
    * `maxMidDegree` caps the level-2 hub fan-out
    * ([[Skew.cappedMidAdjacency]]; `None` = exact).
    *
    * `splitTwoHop` materializes the level-2 neighbor table
    * ([[graft.plans.Lineage.cut]]) before the two endpoint joins —
    * the round-16 step-1 experiment lever for the HGN loop at scale:
    * the fused 2-hop-aggregate + double-join + similarity chain is the
    * loop's peak working set (the 30× heap A/B localized step 1 as
    * GC-bound on it, BASELINE.md round 15), and the cut splits that
    * chain into two smaller-footprint stages at the price of one
    * materialization of the neighbor arrays. Default off: at catalog
    * scale the fused chain is faster (and g03's oracle plan unchanged).
    */
  def run(g: PropertyGraph, rLvl1Thres: Double, rLvl2Thres: Double,
      maxMidDegree: Option[Long] = None,
      splitTwoHop: Boolean = false): DataFrame = {
    val lvl2 = Neighborhoods.neighbors(g, 2, maxMidDegree)
    edgesWithMetrics(g,
      Neighborhoods.neighbors(g, 1),
      if (splitTwoHop) graft.plans.Lineage.cut(lvl2) else lvl2,
      rLvl1Thres, rLvl2Thres)
  }
}
