package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {

  test("cosine similarity: hand-computed values") {
    assert(math.abs(
      Cosine.similarity(Vectors.dense(1, 0, 1), Vectors.dense(1, 0, 1)) - 1.0) < 1e-12)
    assert(Cosine.similarity(Vectors.dense(1, 0), Vectors.dense(0, 1)) == 0.0)
    val s = Cosine.similarity(
      Vectors.sparse(4, Array(0, 2), Array(1.0, 1.0)),
      Vectors.sparse(4, Array(0, 3), Array(1.0, 1.0)))
    assert(math.abs(s - 0.5) < 1e-12)
    // zero vector convention
    assert(Cosine.similarity(Vectors.dense(0, 0), Vectors.dense(1, 1)) == 0.0)
  }

  test("dummy vectors: one active bit per feature, cosine = matches/F") {
    import spark.implicits._
    val nodes = Seq(
      (1L, "a", "x"), (2L, "a", "y"), (3L, "b", "y"))
      .toDF("id", "brand", "kind")
    val vecs = DummyVectors.create(nodes, Seq("brand", "kind"))
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val sims = Cosine.edgeSimilarities(edges, vecs).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) ->
        r.getAs[Double]("similarity")).toMap
    assert(math.abs(sims((1L, 2L)) - 0.5) < 1e-12) // brand matches, kind differs
    assert(math.abs(sims((2L, 3L)) - 0.5) < 1e-12) // kind matches
    assert(math.abs(sims((1L, 3L)) - 0.0) < 1e-12) // nothing matches
  }

  test("feature-match ratio column agrees with the closed form") {
    import spark.implicits._
    val df = Seq(("a", "a", "x", "y")).toDF("b1", "b2", "k1", "k2")
    val r = df.select(Cosine.featureMatchRatio(
      Seq((col("b1"), col("b2")), (col("k1"), col("k2")))).as("r"))
      .head().getDouble(0)
    assert(r == 0.5)
  }
}
