package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  private def verts(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  test("triangles: K4, a pendant, and an isolated vertex") {
    // K4 on 1-4: 4 triangles, each vertex in exactly 3. Vertex 5 hangs
    // off 4 (no triangle); 6 is isolated.
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val got = Triangles.counts(verts(1L, 2L, 3L, 4L, 5L, 6L), e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 0L))
  }

  test("clustering coefficient: K4 + pendant + isolated, exact micro-units") {
    // K4 vertices: deg 3, tri 3 → cc = 2·3·10⁶/(3·2) = exactly 1.0.
    // Vertex 4 additionally touches pendant 5: deg 4, tri 3 →
    // (2·3·10⁶) div (4·3) = 500000. Pendant 5: deg 1 → 0 (guarded
    // division). Isolated 6: deg 0, tri 0, cc 0.
    val e = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val got = Triangles.clusteringCoeff(verts(1L, 2L, 3L, 4L, 5L, 6L), e)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 3L, 1000000L)), 2L -> ((3L, 3L, 1000000L)),
      3L -> ((3L, 3L, 1000000L)), 4L -> ((4L, 3L, 500000L)),
      5L -> ((1L, 0L, 0L)), 6L -> ((0L, 0L, 0L))))
  }

  test("triangles: differential vs naive closing on a random graph") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val n = 60
    val e = (1 to 500).map { _ =>
      val a = rng.nextInt(n).toLong; val b = rng.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("src", "dst")
    val vs = (0L until n).toDF("id")
    val fast = Triangles.counts(vs, e)
    // Naive: close canonical u<v<w paths directly (the oracle's shape).
    val tri = e.as("a")
      .join(e.as("b"), col("a.dst") === col("b.src"))
      .join(e.as("c"), col("c.src") === col("a.src") && col("c.dst") === col("b.dst"))
      .select(col("a.src").as("u"), col("a.dst").as("v"), col("b.dst").as("w"))
    val naive = vs.join(
        tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
          .groupBy("id").agg(count(lit(1)).as("nt")), Seq("id"), "left")
      .select(col("id"), coalesce(col("nt"), lit(0L)).as("n_tri"))
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }

  test("triangles: hub wedges are charged to low-degree neighbors") {
    import spark.implicits._
    // Star hub 0 with 50 leaves + one leaf-leaf edge: exactly 1 triangle.
    // Degree ordering must orient every (leaf, hub) edge leaf→hub, so the
    // hub's out-degree is 0 and the wedge stage never enumerates the
    // hub's C(50,2) pairs.
    val star = (1L to 50L).map(i => (0L, i))
    val e = (star :+ (1L, 2L)).map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("src", "dst")
    val got = Triangles.counts((0L to 50L).toDF("id"), e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 1L && got(1L) == 1L && got(2L) == 1L)
    assert((3L to 50L).forall(got(_) == 0L))
  }
}
