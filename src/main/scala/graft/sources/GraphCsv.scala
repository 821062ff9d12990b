package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Config-driven CSV graph sources (SURVEY §2.1 S1/S2), matching the
  * reference's `load_nodes_df` / `load_edges_df`
  * (`spark_manager/spark_manager.py:102-149`):
  *
  *   - node schema is NOT inferred: first column is the Long `id`, the
  *     rest are String feature columns named by the caller's config
  *     (`spark_manager.py:113-116`);
  *   - edge schema is `(src, dst)` Longs plus an optional Float `weight`
  *     switched on `hasWeights` (`spark_manager.py:135-147`);
  *   - header/delimiter come from config (`confs/quakers.yml:37-53`).
  *
  * Explicit schemas mean the scan needs no inference pass, and malformed
  * rows fail fast (PERMISSIVE would silently null graph ids — FAILFAST is
  * the right default for graph integrity).
  */
object GraphCsv {

  def nodesSchema(featureNames: Seq[String]): StructType =
    StructType(
      StructField("id", LongType, nullable = false) +:
      featureNames.map(f => StructField(f, StringType, nullable = true)))

  def edgesSchema(hasWeights: Boolean): StructType = {
    val base = Seq(
      StructField("src", LongType, nullable = false),
      StructField("dst", LongType, nullable = false))
    StructType(if (hasWeights) base :+ StructField("weight", FloatType) else base)
  }

  def loadNodes(
      spark: SparkSession,
      path: String,
      featureNames: Seq[String],
      delimiter: String = ",",
      hasHeader: Boolean = true,
      encoding: String = "UTF-8"): DataFrame =
    spark.read
      .option("header", hasHeader.toString)
      .option("sep", delimiter)
      .option("encoding", encoding)
      .option("mode", "FAILFAST")
      .schema(nodesSchema(featureNames))
      .csv(path)

  def loadEdges(
      spark: SparkSession,
      path: String,
      hasWeights: Boolean = false,
      delimiter: String = ",",
      hasHeader: Boolean = true): DataFrame =
    spark.read
      .option("header", hasHeader.toString)
      .option("sep", delimiter)
      .option("mode", "FAILFAST")
      .schema(edgesSchema(hasWeights))
      .csv(path)
}
