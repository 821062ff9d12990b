package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge, Graph}

import graft.plans.Lineage

/** Connected components → communities (SURVEY §2.9 G4) and the
  * small-community filter (`graph_tools/graph_tools.py:519-540`).
  *
  * The reference called GraphFrames `g.connectedComponents()`. The default
  * here is a DATAFRAME-NATIVE large-star/small-star alternation (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * same algorithm family GraphFrames itself uses — because the GraphX
  * route pays a DataFrame→RDD→Pregel→DataFrame round-trip that leaves
  * whole-stage codegen and AQE and carries a fixed per-call setup cost
  * (VERDICT round 3, "What's wrong" #2). Both implementations label every
  * vertex with the LOWEST vertex id in its component, which is also what
  * the DuckDB oracle (min reachable id) computes; the GraphX version is
  * kept as a differential check ([[connectedComponentsGraphX]],
  * GraphCoreSpec).
  *
  * Scale: each round is two (groupBy min + equi-join + distinct) passes —
  * all hash-partitioned on a single long key, map-side combinable, no
  * driver state. Rounds converge in O(log²) iterations (≤3 on every test
  * graph); [[Lineage.cut]] between rounds keeps planning cost constant
  * (the Spark ≥3.4 checkpoint-stats blow-up documented in
  * [[graft.plans.Lineage]]).
  */
object Communities {

  /** One large-star round: every node connects its strictly-larger
    * neighbors to the minimum of its closed neighborhood. Input/output
    * edges oriented `u > v`.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .union(e.select(col("v").as("a"), col("u").as("b")))
    val m = sym.groupBy("a").agg(min(col("b")).as("mb"))
      .select(col("a"), least(col("a"), col("mb")).as("m"))
    sym.join(m.hint("shuffle_hash"), Seq("a"))
      .filter(col("b") > col("a"))
      .select(col("b").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node connects its smaller-or-equal
    * neighbors (and itself) to the minimum such neighbor. Orientation
    * `u > v` is an input invariant, so min over `v` IS the closed-
    * neighborhood minimum on the small side.
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min(col("v")).as("m"))
    e.join(m.hint("shuffle_hash"), Seq("u"))
      .select(explode(array(
        struct(col("v").as("x"), col("m").as("y")),
        struct(col("u").as("x"), col("m").as("y")))).as("p"))
      .select(col("p.x").as("u"), col("p.y").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** `(count, hash-xor, hash-xor')` — the cheap fixed-point signature: the
    * alternation converged iff the edge set stopped changing (star graphs
    * are fixed points of both rounds). `bit_xor` is carry-free, so unlike
    * `sum` it can never hit Spark 4's default-ANSI long overflow
    * (round-4 regression: `sum(xxhash64)` threw `ARITHMETIC_OVERFLOW` on
    * any graph with ≥2 edges of opposite-sign hashes); it is also
    * order-independent, which is all a set signature needs. The two
    * hashes are seeded with distinct literal prefixes so they are
    * independently keyed (operand-swapping alone would correlate them:
    * both values coincide whenever the changed-edge xor is symmetric
    * under swap), keeping the collision probability ~2^-128.
    *
    * The check is probabilistic: a collision where the edge set changed
    * but both xors and the count matched would terminate the loop early
    * with wrong labels — astronomically unlikely (and the labeling step
    * still only reads the edges actually computed, so a FALSE-negative
    * merely costs one extra round).
    */
  private def signature(e: DataFrame): (Long, Any, Any) = {
    val r = e.agg(count(lit(1)),
        bit_xor(xxhash64(lit(1), col("u"), col("v"))),
        bit_xor(xxhash64(lit(2), col("u"), col("v"))))
      .collect()(0)
    (r.getLong(0), r.get(1), r.get(2))
  }

  /** `(id, component)` for every vertex of `g` (isolated vertices form
    * their own singleton components); `component` = min member id.
    *
    * Vertices that appear only as edge endpoints (no `vertices` row) are
    * labeled too: real inputs contain such danglers (Hamsterster ships
    * two edge endpoints with no node row), the reference includes them —
    * its community sink builds NetworkX FROM THE EDGE LIST and backfills
    * attributes with "UNKNOWN" (`spark_manager/spark_manager.py:327,
    * 364-366`) — and GraphX's `Graph(v, e)` adds them implicitly, so the
    * differential stays apples-to-apples. Hence the final join is FULL
    * outer: vertex-only ids get singleton labels, edge-only ids keep
    * their computed component.
    *
    * @param maxRounds hard cap on large-star/small-star rounds; the
    *   alternation needs O(log² n) (≤3 on every test graph), so hitting
    *   the cap means something is deeply wrong — the function THROWS
    *   rather than silently emitting labels from a non-converged edge set
    *   (which would merge/split components incorrectly).
    */
  def connectedComponents(g: PropertyGraph, maxRounds: Int = 64)(
      implicit spark: SparkSession): DataFrame = {
    val verts = g.vertices.select(col("id").cast("long").as("id"))
    var e = Lineage.cut(
      g.edges.select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
        .filter(col("s") =!= col("d"))
        .select(greatest(col("s"), col("d")).as("u"),
          least(col("s"), col("d")).as("v"))
        .distinct())
    var prev = signature(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      e = Lineage.cut(smallStar(largeStar(e)))
      val sig = signature(e)
      converged = sig == prev
      prev = sig
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: large-star/small-star did not reach a fixed " +
        s"point within $maxRounds rounds — refusing to emit labels from a " +
        s"non-converged edge set")
    // Converged state: a union of stars, every non-root has exactly one
    // edge to its component's minimum id; roots label themselves.
    val labels = e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .groupBy("id").agg(min(col("component")).as("component"))
    verts.join(labels, Seq("id"), "full")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** GraphX Pregel implementation — kept as the differential check for
    * [[connectedComponents]] (GraphCoreSpec asserts bit-equal labels).
    */
  def connectedComponentsGraphX(g: PropertyGraph)(
      implicit spark: SparkSession): DataFrame = {
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
