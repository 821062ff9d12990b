package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded Girvan-Newman edge betweenness (SURVEY §2.9 G2/G3/G7, §2.3 J4,
  * §2.4 A2), re-architected Spark-first from the reference's
  * GraphFrames-based init step (`graph_tools/graph_tools.py:74-286`):
  *
  *   - The reference collected ALL vertex ids to the driver as landmarks
  *     (`main.py:254`) and ran batched Pregel `shortestPaths` — O(V) driver
  *     memory, fatal at scale (SURVEY §7.5.3). Here distances are a
  *     landmark-free bounded BFS: `maxLen` self-joins of the adjacency
  *     DataFrame, entirely distributed.
  *   - Motif enumeration (`g.find("(a)-[e0]->(n0);...")`,
  *     `graph_tools/graph_tools.py:162-181, 220-232`) becomes a join chain
  *     over the symmetrized edges; the path is carried as ONE
  *     `array<struct<src,dst>>` column instead of the reference's ragged
  *     wide columns, which deletes the pad-missing-columns operator
  *     (`spark_manager/spark_manager.py:411-453`, SURVEY §7.1) and turns
  *     betweenness into `explode + groupBy struct`.
  *   - Paths are pruned to shortest length by an inner join against the
  *     distance table (J4, `graph_tools/graph_tools.py:202-210`).
  *   - ONE path per ordered endpoint pair is kept, as in the reference's
  *     `dropDuplicates(["a","z"])` (`graph_tools/graph_tools.py:208`) —
  *     but where the reference kept an ARBITRARY survivor, we keep the
  *     lexicographically smallest intermediate sequence, making the result
  *     deterministic and oracle-checkable.
  *   - Deviation, documented: `find_shortest_paths_from_motifs`
  *     (`graph_tools/graph_tools.py:196-197`) re-assigns the filtered
  *     `sp_lengths` inside its loop, so after the first (longest-length)
  *     pass every shorter length filters an already-emptied frame and
  *     contributes nothing. We implement the evident intent — every
  *     length 1..maxLen contributes its pairs — rather than the bug.
  *
  * Betweenness of a directed edge struct `(src,dst)` = number of chosen
  * shortest paths it appears in, over all ordered vertex pairs at distance
  * ≤ `maxLen` (`graph_tools/graph_tools.py:270-286`). For `maxLen` ≤ 2
  * (one intermediate) the lexicographic-min tie-break picks the same
  * intermediate in both directions, so betweenness(u,v) ==
  * betweenness(v,u); for `maxLen` ≥ 3 the min over FORWARD mid sequences
  * is not reversal-invariant and per-orientation counts may differ on
  * graphs with tied shortest paths.
  *
  * Hub-skew: all intermediate expansion joins take the `maxMidDegree`-
  * capped adjacency ([[Skew.cappedMidAdjacency]]) — with a cap, paths
  * THROUGH hubs above it are excluded from both the distance table and
  * path enumeration (consistently, so no pair is assigned a path longer
  * than its capped distance). `None` is bit-identical to exact.
  */
object Betweenness {

  /** Ordered-pair shortest distances up to `maxLen` hops:
    * `(a, z, distance)`, distance in 1..maxLen, a != z. Landmark-free BFS:
    * each round extends the frontier by one adjacency join and anti-joins
    * out pairs already seen at a shorter distance.
    */
  def boundedDistances(adj: DataFrame, maxLen: Int,
      maxMidDegree: Option[Long] = None): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    // Extension steps go THROUGH the frontier's endpoint, so they use the
    // capped adjacency; the first hop (direct edges) is never capped.
    val midAdj = Skew.cappedMidAdjacency(adj, maxMidDegree)
    var known = adj.select(col("src").as("a"), col("dst").as("z"))
      .withColumn("distance", lit(1))
    var frontier = known
    for (d <- 2 to maxLen) {
      val extended = frontier
        .select(col("a"), col("z").as("mid"))
        .join(midAdj.select(col("src").as("mid"), col("dst").as("z")), Seq("mid"))
        .select(col("a"), col("z"))
        .filter(col("a") =!= col("z"))
        .distinct()
      frontier = extended.join(known.select("a", "z"), Seq("a", "z"), "left_anti")
        .withColumn("distance", lit(d))
      known = known.unionByName(frontier)
    }
    known
  }

  /** All walks of exactly `len` hops over `adj` as
    * `(a, z, mids: array<bigint>, path: array<struct<src,dst>>)` with
    * `a != z`. Non-simple walks are later eliminated by the
    * shortest-distance join (a walk revisiting a vertex cannot achieve the
    * shortest length). Fan-out is degree^len — callers keep `len` small
    * (the reference default `max_sp_length` is 2, `confs/quakers.yml:64`).
    */
  def enumeratePaths(adj: DataFrame, len: Int,
      maxMidDegree: Option[Long] = None): DataFrame = {
    require(len >= 1, s"len must be >= 1, got $len")
    val midAdj = Skew.cappedMidAdjacency(adj, maxMidDegree)
    var p = adj.select(
      col("src").as("a"), col("dst").as("z"),
      array().cast("array<bigint>").as("mids"),
      array(struct(col("src"), col("dst"))).as("path"))
    for (_ <- 2 to len) {
      p = p.select(col("a"), col("z").as("mid"), col("mids"), col("path"))
        .join(midAdj.select(col("src").as("mid"), col("dst").as("nxt")), Seq("mid"))
        .select(
          col("a"), col("nxt").as("z"),
          concat(col("mids"), array(col("mid"))).as("mids"),
          concat(col("path"),
            array(struct(col("mid").as("src"), col("nxt").as("dst")))).as("path"))
    }
    p.filter(col("a") =!= col("z"))
  }

  /** One deterministic shortest path per ordered pair at distance ≤
    * `maxLen`: `(a, z, path)`.
    */
  def shortestPaths(g: PropertyGraph, maxLen: Int,
      maxMidDegree: Option[Long] = None): DataFrame = {
    val adj = g.adjacency
    val dist = boundedDistances(adj, maxLen, maxMidDegree)
    val candidates = (1 to maxLen).map { len =>
      // J4: keep only walks whose endpoints are at exactly this distance.
      enumeratePaths(adj, len, maxMidDegree)
        .join(dist.filter(col("distance") === len).select("a", "z"),
          Seq("a", "z"), "left_semi")
    }.reduce(_ unionByName _)
    // Deterministic survivor: lexicographically smallest intermediate
    // sequence (zero-padded so string order == numeric order).
    val keyed = candidates.withColumn("pathkey",
      concat_ws(",", transform(col("mids"), m => lpad(m.cast("string"), 19, "0"))))
    keyed.groupBy("a", "z")
      .agg(min_by(col("path"), col("pathkey")).as("path"))
  }

  /** Betweenness per directed edge struct:
    * `(edges: struct<src,dst>, betweenness: bigint)` — the reference's
    * output schema (`graph_tools/graph_tools.py:281-285`), consumed by the
    * struct-field-key joins in edge deletion (`main.py:130-134`).
    */
  def run(g: PropertyGraph, maxLen: Int, maxMidDegree: Option[Long] = None)(
      implicit spark: SparkSession): DataFrame =
    shortestPaths(g, maxLen, maxMidDegree)
      .select(explode(col("path")).as("edges"))
      .groupBy("edges")
      .agg(count(lit(1)).as("betweenness"))
}
