package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed deterministic spring layout — the engine-side half of
  * the reference's Plotly spring-scatter visualizer
  * (`visualizer/plotly_visualizer.py:75-210`, the one remaining parity
  * gap after rounds 1-18). The reference collected the whole graph
  * into NetworkX on the driver and ran `nx.spring_layout` (exact
  * Fruchterman-Reingold, O(V²) per iteration, driver-bound — fatal at
  * scale); here every iteration is column algebra:
  *
  *   - REPULSION is grid-approximated (coarse Barnes-Hut): vertices
  *     bin into a `gridCells`² lattice, each cell's occupancy + fixed-
  *     point centroid aggregate in one `groupBy`, and every vertex
  *     repels against the BROADCAST centroid table (`count · k²/d` per
  *     cell, own-cell occupancy minus self) — O(V · cells) rows per
  *     iteration instead of O(V²).
  *   - ATTRACTION is exact along the symmetrized adjacency
  *     (`d²/k` per edge endpoint, two position joins + one sum).
  *   - DETERMINISM is structural, not hoped-for: positions seed from
  *     `xxhash64(id)` (no global sort, no RNG), every force SUM
  *     accumulates MICRO-unit longs (`floor(f·1e6)` — long addition
  *     commutes, so partition order cannot wiggle the layout the way
  *     double sums can), and each iteration lineage-cuts the V-row
  *     position relation (the standard iterative-pipeline shape, cf.
  *     KCore) so plans stay constant-depth.
  *
  * Output: `(id, x, y)` in `[0, frame)²` — join it back to community
  * labels and feed [[graft.sources.Sinks.exportScatterHtml]] for the
  * reference's colored-by-community figure.
  */
object SpringLayout {

  private val Micro = 1e6

  /** Fixed-point micro-unit floor — the order-independent summand. */
  private def micro(c: org.apache.spark.sql.Column) =
    floor(c * Micro).cast("long")

  def run(g: PropertyGraph, iterations: Int = 30, gridCells: Int = 16,
      frame: Double = 1000.0)(implicit spark: SparkSession): DataFrame = {
    require(iterations >= 1 && gridCells >= 2 && frame > 0)
    val verts = g.vertices.select(col("id"))
    // One bounded driver scalar: the FR ideal spring length needs |V|.
    val n = math.max(verts.count(), 1L)
    val k = frame / math.sqrt(n.toDouble)
    val eps = frame / 1e4

    // Hash-seeded start positions in [0, frame)² — deterministic and
    // narrow (no sort, no row_number).
    def seed(tag: String) =
      (pmod(xxhash64(lit(tag), col("id")), lit(1000003L)).cast("double")
        / 1000003.0) * frame
    var pos = graft.plans.Lineage.cut(
      verts.select(col("id"), seed("sx").as("x"), seed("sy").as("y")))

    val adj = g.adjacency.select(col("src"), col("dst"))
    val cellW = frame / gridCells

    for (it <- 1 to iterations) {
      // Linear cooling: max displacement this round.
      val t = (frame / 10.0) * (1.0 - (it - 1).toDouble / iterations)

      val binned = pos
        .withColumn("cx", least(lit(gridCells - 1),
          greatest(lit(0), floor(col("x") / cellW).cast("int"))))
        .withColumn("cy", least(lit(gridCells - 1),
          greatest(lit(0), floor(col("y") / cellW).cast("int"))))
      val cells = binned.groupBy("cx", "cy").agg(
        count(lit(1)).as("cnt"),
        sum(micro(col("x"))).as("sx"),
        sum(micro(col("y"))).as("sy"))
        .select(col("cx").as("rcx"), col("cy").as("rcy"), col("cnt"),
          (col("sx") / Micro / col("cnt")).as("mx"),
          (col("sy") / Micro / col("cnt")).as("my"))

      // Repulsion: each vertex × every cell centroid (broadcast —
      // gridCells² rows). Own-cell occupancy excludes the vertex
      // itself; degenerate zero distances clamp to eps.
      val rep = binned.crossJoin(broadcast(cells))
        .withColumn("m",
          when(col("cx") === col("rcx") && col("cy") === col("rcy"),
            col("cnt") - 1).otherwise(col("cnt")))
        .filter(col("m") > 0)
        .withColumn("ddx", col("x") - col("mx"))
        .withColumn("ddy", col("y") - col("my"))
        .withColumn("d",
          greatest(sqrt(col("ddx") * col("ddx") + col("ddy") * col("ddy")),
            lit(eps)))
        .withColumn("f", col("m") * k * k / (col("d") * col("d")))
        .groupBy("id").agg(
          sum(micro(col("f") * col("ddx") / col("d"))).as("rx"),
          sum(micro(col("f") * col("ddy") / col("d"))).as("ry"))

      // Attraction: exact along the symmetrized adjacency — each
      // directed copy pulls its src toward its dst once.
      val att = adj
        .join(pos.select(col("id").as("src"),
          col("x").as("x1"), col("y").as("y1")), Seq("src"))
        .join(pos.select(col("id").as("dst"),
          col("x").as("x2"), col("y").as("y2")), Seq("dst"))
        .withColumn("ddx", col("x2") - col("x1"))
        .withColumn("ddy", col("y2") - col("y1"))
        .withColumn("d",
          greatest(sqrt(col("ddx") * col("ddx") + col("ddy") * col("ddy")),
            lit(eps)))
        .withColumn("f", col("d") * col("d") / k)
        .groupBy(col("src").as("id")).agg(
          sum(micro(col("f") * col("ddx") / col("d"))).as("ax"),
          sum(micro(col("f") * col("ddy") / col("d"))).as("ay"))

      val moved = pos
        .join(rep, Seq("id"), "left_outer")
        .join(att, Seq("id"), "left_outer")
        .withColumn("dx",
          (coalesce(col("rx"), lit(0L)) + coalesce(col("ax"), lit(0L)))
            / Micro)
        .withColumn("dy",
          (coalesce(col("ry"), lit(0L)) + coalesce(col("ay"), lit(0L)))
            / Micro)
        .withColumn("dl",
          greatest(sqrt(col("dx") * col("dx") + col("dy") * col("dy")),
            lit(eps)))
        .withColumn("step", least(col("dl"), lit(t)))
        .select(col("id"),
          least(lit(frame - eps), greatest(lit(0.0),
            col("x") + col("dx") / col("dl") * col("step"))).as("x"),
          least(lit(frame - eps), greatest(lit(0.0),
            col("y") + col("dy") / col("dl") * col("step"))).as("y"))
      val next = graft.plans.Lineage.cut(moved)
      graft.plans.Lineage.release(pos)
      pos = next
    }
    pos
  }
}
