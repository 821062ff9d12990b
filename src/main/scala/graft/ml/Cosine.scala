package graft.ml

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Cosine similarity between ML vectors (SURVEY §2.7 F1), replacing the
  * reference's sklearn-via-Python-UDF
  * (`graph_tools/graph_tools.py:63-70`) with one typed Scala udf over
  * `ml.linalg.Vector` — no Python worker round-trip, sparse-aware dot
  * product. Zero vectors yield 0.0 (sklearn's convention for all-zero
  * inputs).
  */
object Cosine {

  /** Dot/norm cosine on two ml vectors; sparse-sparse dot is a sorted-index
    * merge, O(nnz).
    */
  def similarity(a: Vector, b: Vector): Double = {
    require(a.size == b.size, s"vector size mismatch: ${a.size} vs ${b.size}")
    var dot = 0.0
    val (ai, av) = (a.toSparse.indices, a.toSparse.values)
    val (bi, bv) = (b.toSparse.indices, b.toSparse.values)
    var i = 0
    var j = 0
    while (i < ai.length && j < bi.length) {
      if (ai(i) == bi(j)) { dot += av(i) * bv(j); i += 1; j += 1 }
      else if (ai(i) < bi(j)) i += 1
      else j += 1
    }
    val na = math.sqrt(av.map(v => v * v).sum)
    val nb = math.sqrt(bv.map(v => v * v).sum)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
  }

  val udfCosine: UserDefinedFunction = udf((a: Vector, b: Vector) => similarity(a, b))

  /** Per-edge cosine similarities: join the dummy vectors onto both edge
    * endpoints (J1, `graph_tools/graph_tools.py:47-61`) and evaluate the
    * udf — `(src, dst, similarity)` plus any original edge columns.
    * Both joins shuffle on a single long key; at scale the vectors table
    * is |V|-sized and the edges table |E|-sized, so AQE broadcasts the
    * smaller side when it fits.
    */
  def edgeSimilarities(edges: DataFrame, dummyVectors: DataFrame): DataFrame = {
    val atSrc = dummyVectors.select(col("id").as("src"), col("features").as("features_src"))
    val atDst = dummyVectors.select(col("id").as("dst"), col("features").as("features_dst"))
    edges.join(atSrc, Seq("src")).join(atDst, Seq("dst"))
      .withColumn("similarity", udfCosine(col("features_src"), col("features_dst")))
      .drop("features_src", "features_dst")
  }

  /** Closed form for one-hot-per-feature encodings: cosine = (# features
    * with equal values) / F when every feature contributes exactly one
    * active bit. Used by the oracle-checkable derived-graph queries, where
    * a feature-match ratio stands in for the udf (same semantic, SQL
    * expressible).
    */
  def featureMatchRatio(cols: Seq[(Column, Column)]): Column = {
    require(cols.nonEmpty)
    val matches = cols.map { case (a, b) => when(a === b, 1).otherwise(0) }
      .reduce(_ + _)
    matches.cast("double") / lit(cols.size.toDouble)
  }
}
