package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge weights from common-neighbor similarities, matching the
  * reference's `calculate_edge_weights` (`graph_tools/graph_tools.py:437-517`).
  *
  * Semantics (derived from the reference's j_1/j_2/j_3 SQL): for each
  * deletable edge (keepit == false), look at the similarity rows whose BOTH
  * endpoints are level-2 common neighbors of the edge, and set
  *
  *   edge_weight = count(similarity >= featureMinAvg) / count(similarity)
  *
  * over those rows (`graph_tools/graph_tools.py:512-516`, the A3
  * conditional-ratio aggregate — composed from built-ins, no UDAF).
  * Subtlety preserved from the reference: the j_3 projection keeps only
  * `(e1, e2, similarity)` BEFORE its `dropDuplicates()` (line 508), so the
  * ratio is over DISTINCT SIMILARITY VALUES per edge, not over distinct
  * similarity-edge pairs. With continuous cosine values the two coincide
  * almost surely; with discrete similarities they differ, and we match the
  * reference.
  * Deletable edges with NO qualifying similarity row produce no output row
  * (inner-join semantics) and therefore can never be deleted downstream.
  *
  * Join structure preserved from the reference (and exercised as operator
  * coverage): two RIGHT OUTER joins attaching similarity rows to the
  * exploded common neighbors (J5, lines 465-483), then a 5-column equi
  * self-join matching the "src side" and "dst side" attachments (J6, lines
  * 493-508), null-filtered and deduplicated.
  *
  * Scale: `explode(common_neighbors)` fans out each deletable edge by its
  * common-neighbor count; both right joins shuffle on a single long key
  * (the exploded neighbor id), and the 5-key join shuffles on (nb_src,
  * nb_dst) — all plain hash-partitionable keys. Skew (a hub vertex that is
  * a common neighbor of many edges) is handled by AQE skew-join splitting.
  */
object EdgeWeights {

  /** `(src, dst, edge_weight)` for deletable edges with ≥1 qualifying
    * similarity row. `edgesR` is [[RMetrics.edgesWithMetrics]] output;
    * `similarities` is `(src, dst, similarity)` per original edge.
    */
  def run(edgesR: DataFrame, similarities: DataFrame, featureMinAvg: Double): DataFrame = {
    val sims = similarities.select(
      col("src").as("s_src"), col("dst").as("s_dst"), col("similarity"))

    // Explode the level-2 common neighbors of deletable edges
    // (graph_tools/graph_tools.py:451-454).
    val cn = edgesR.filter(!col("keepit"))
      .select(col("src").as("nb_src"), col("dst").as("nb_dst"),
        explode(col("common_neighbors")).as("cn"))

    // J5 #1: similarity rows whose src IS the common neighbor (right outer:
    // common neighbors with no incident similarity row survive as nulls,
    // exactly as the reference's RIGHT JOIN at lines 465-470).
    val j1 = sims.join(cn, col("s_src") === col("cn"), "right")
      .select(col("nb_src"), col("nb_dst"), col("cn"),
        col("s_src").as("j1_src"), col("s_dst").as("j1_dst"),
        col("similarity").as("j1_similarity"))

    // J5 #2: similarity rows whose dst IS the common neighbor (lines 478-483).
    val j2 = sims.join(j1, col("s_dst") === col("cn"), "right")
      .select(col("nb_src"), col("nb_dst"),
        col("j1_src"), col("j1_dst"), col("j1_similarity"),
        col("s_src").as("j2_src"), col("s_dst").as("j2_dst"),
        col("similarity").as("j2_similarity"))

    // J6: 5-column equi join of the two attachment sides — a similarity row
    // survives iff its src matches via SOME common neighbor and its dst via
    // SOME common neighbor of the SAME deletable edge (lines 493-508).
    val left = j2.select(col("nb_src"), col("nb_dst"),
        col("j1_src"), col("j1_dst"), col("j1_similarity"))
      .filter(col("j1_src").isNotNull && col("j1_dst").isNotNull &&
        col("j1_similarity").isNotNull)
    val right = j2.select(col("nb_src").as("r_nb_src"), col("nb_dst").as("r_nb_dst"),
        col("j2_src"), col("j2_dst"), col("j2_similarity"))
      .filter(col("j2_src").isNotNull && col("j2_dst").isNotNull &&
        col("j2_similarity").isNotNull)
    val j3 = left.join(right,
        col("nb_src") === col("r_nb_src") &&
        col("nb_dst") === col("r_nb_dst") &&
        col("j1_src") === col("j2_src") &&
        col("j1_dst") === col("j2_dst") &&
        col("j1_similarity") === col("j2_similarity"))
      .select(col("nb_src").as("src"), col("nb_dst").as("dst"),
        col("j1_similarity").as("similarity"))
      .dropDuplicates()

    // A3: conditional-ratio aggregate (lines 512-516). count/count is
    // long/long -> double in Spark, matching DuckDB's float division.
    j3.groupBy("src", "dst")
      .agg((count(when(col("similarity") >= featureMinAvg, col("similarity"))) /
        count(col("similarity"))).as("edge_weight"))
  }
}
