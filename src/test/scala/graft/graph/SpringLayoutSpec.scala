package graft.graph

import graft.SparkSpec
import graft.sources.{GraphCsv, Sinks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** [[SpringLayout]] — the distributed deterministic Fruchterman-
  * Reingold layout behind the reference-parity community scatter.
  * The layout has no oracle (50 FR rounds are not SQL-replayable);
  * the spec pins the properties that make it a correct, usable,
  * deterministic layout.
  */
class SpringLayoutSpec extends SparkSpec {

  private def graphOf(edges: Seq[(Long, Long)]): PropertyGraph = {
    import spark.implicits._
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
    PropertyGraph(vs, edges.toDF("src", "dst"))
  }

  // Two 6-cliques joined by one bridge edge.
  private val twoCliques: Seq[(Long, Long)] =
    (for (a <- 0L to 5L; b <- 0L to 5L if a < b) yield (a, b)) ++
      (for (a <- 10L to 15L; b <- 10L to 15L if a < b) yield (a, b)) ++
      Seq((5L, 10L))

  test("deterministic: two runs produce the bit-identical layout") {
    implicit val s: SparkSession = spark
    val g = graphOf(twoCliques)
    val a = SpringLayout.run(g, iterations = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val b = SpringLayout.run(g, iterations = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("bounded frame, one row per vertex") {
    implicit val s: SparkSession = spark
    val g = graphOf(twoCliques)
    val out = SpringLayout.run(g, iterations = 5, frame = 100.0)
    val rows = out.collect()
    assert(rows.length == 12)
    assert(rows.forall(r => r.getDouble(1) >= 0 && r.getDouble(1) < 100.0 &&
      r.getDouble(2) >= 0 && r.getDouble(2) < 100.0))
  }

  test("clusters separate: mean intra-clique distance < inter-clique") {
    implicit val s: SparkSession = spark
    val g = graphOf(twoCliques)
    val p = SpringLayout.run(g, iterations = 40).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def dist(a: Long, b: Long): Double = {
      val (x1, y1) = p(a); val (x2, y2) = p(b)
      math.hypot(x1 - x2, y1 - y2)
    }
    val left = (0L to 5L).toSeq
    val right = (10L to 15L).toSeq
    def mean(ds: Seq[Double]) = ds.sum / ds.size
    val intra = mean((for (a <- left; b <- left if a < b) yield dist(a, b)) ++
      (for (a <- right; b <- right if a < b) yield dist(a, b)))
    val inter = mean(for (a <- left; b <- right) yield dist(a, b))
    assert(intra < inter,
      s"intra $intra should be < inter $inter after layout")
  }

  test("quakers e2e artifact: engine-computed layout + community scatter " +
      "(the reference's plotly_visualizer figure, driver-free)") {
    val base = "/root/reference/data/input_graphs/Quakers"
    assume(new java.io.File(s"$base/quakers_nodelist.csv2").exists())
    implicit val s: SparkSession = spark
    val nodes = GraphCsv.loadNodes(spark, s"$base/quakers_nodelist.csv2",
      Seq("significance", "gender", "birth", "death", "internal_id"))
    val edges = GraphCsv.loadEdges(spark, s"$base/quakers_edgelist.csv2")
    val g = PropertyGraph(nodes, edges)
    val layout = SpringLayout.run(g, iterations = 20)
    val com = Communities.connectedComponents(g)
      .select(col("id"), col("component").as("community"))
    // Isolated vertices carry no component row; they still render
    // (one neutral color) — left join + backfill, the P6 shape.
    val colored = layout.join(com, Seq("id"), "left_outer")
      .withColumn("community", coalesce(col("community"), lit(-1L)))
    val out = java.nio.file.Files
      .createTempDirectory("quakers-scatter").toString
    Sinks.exportScatterHtml(colored, out, Some(g.edges))
    val html = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    val text = new String(java.nio.file.Files.readAllBytes(html), "UTF-8")
    assert(text.startsWith("<!DOCTYPE html>") &&
      text.trim.endsWith("</html>"))
    assert(text.contains("\"c\":"), "community color field present")
    // every vertex rendered
    assert(text.linesIterator.count(_.contains("\"x\":")) ==
      g.vertices.count())
  }
}
