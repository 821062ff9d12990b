package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ModularitySpec extends SparkSpec {

  // Planted two-community graph: K5 {1..5} — bridge 1-6 — K5 {6..10}.
  // m = 21; each clique has e_c = 10, d_c = 21 (4·5 internal + 1 bridge).
  private def planted = {
    import spark.implicits._
    val cliq = for {
      base <- Seq(0L, 5L); a <- 1L to 5L; b <- (a + 1L) to 5L
    } yield (base + a, base + b)
    (cliq :+ (1L, 6L)).toDF("src", "dst")
  }

  private def verts = {
    import spark.implicits._
    (1L to 10L).toDF("id")
  }

  private def score(labels: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
    val r = Modularity.score(labels, planted).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("hand-computed terms on the planted graph") {
    import spark.implicits._
    val labels = verts.select(col("id"),
      ((col("id") - 1) / 5).cast("long").as("label")) // 0 = {1..5}, 1 = {6..10}
    val t = Modularity.terms(labels, planted)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(t == Map(0L -> (10L, 21L), 1L -> (10L, 21L)))
  }

  test("planted labeling beats one-community and singleton; exact micro values") {
    import spark.implicits._
    val twoCom = verts.select(col("id"),
      ((col("id") - 1) / 5).cast("long").as("label"))
    val oneCom = verts.select(col("id"), org.apache.spark.sql.functions.lit(0L).as("label"))
    val single = verts.select(col("id"), col("id").as("label"))

    // Q(two) = 2·(10/21 − (21/42)²) = 0.452380…; num = 798, 4m² = 1764.
    val (m, n2, e2, q2) = score(twoCom)
    assert((m, n2, e2) == (21L, 2L, 20L))
    assert(q2 == 798L * 1000000L / 1764L) // 452380

    // Any single-community labeling has Q = 0 exactly (4m·m − (2m)² = 0).
    val (_, n1, e1, q1) = score(oneCom)
    assert((n1, e1, q1) == (1L, 21L, 0L))

    // All-singleton: num = −Σ d_v² = −(8·16 + 2·25) = −178;
    // −178·10⁶ / 1764 = −100907.02… → −100907 under the truncating
    // division BOTH engines use (floor would give −100908 — this case
    // pins the sign convention).
    val (_, ns, es, qs) = score(single)
    assert((ns, es) == (10L, 0L))
    assert(qs == -100907L)

    assert(q2 > q1 && q1 > qs)
  }

  test("detector comparison: LPA recovers the planted split where CC cannot") {
    implicit val s = spark
    val e = planted
    val v = verts
    val lpaQ = Modularity.score(LabelProp.run(v, e, 3), e)
      .head().getLong(3)
    val ccQ = Modularity.score(
      Communities.connectedComponents(PropertyGraph(v, e))
        .select(col("id"), col("component").as("label")), e)
      .head().getLong(3)
    // The bridge joins the cliques into ONE component, so CC scores the
    // one-community 0; LPA splits at the bridge and scores the planted
    // optimum.
    assert(ccQ == 0L)
    assert(lpaQ == 452380L)
  }

  test("empty edge set fails loudly") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ex = intercept[Exception] {
      Modularity.score(verts.select(col("id"), col("id").as("label")), none).head()
    }
    assert(ex.getMessage.contains("modularity undefined"))
  }
}
