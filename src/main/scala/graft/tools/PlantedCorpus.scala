package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CLUSTERED embeddings generator — planted-neighbor
  * ground truth for ANN recall (VERDICT round 7 "Next round" #2).
  *
  * The driver's synthetic `embeddings.parquet` vectors are near-random
  * unit vectors (same-label cosine ≈ 0), so every recall number
  * measured on them is bounded by the DATA, not the quantizer —
  * useless for answering "does the production index reach high recall
  * on clusterable data?". This corpus plants the structure: `nClusters`
  * centroids with i.i.d.-ish components in [-1, 1] (hash-derived — no
  * RNG, bit-identical across runs), each vector a centroid copy
  * perturbed by `±eps` component noise. With the default `eps = 0.15`
  * the within-cluster cosine is ≈ 0.99 while cross-cluster cosine is
  * ≈ 0 — a query's true top-k all lie in its own cluster, so an
  * IVF/PQ index that recovers the clusters reaches recall ≈ 1 and one
  * that doesn't is exposed.
  *
  * Sizing contract for PQ evaluation: same-cluster vectors can encode
  * to the SAME product-quantization code (their difference is below
  * the codebook's resolution), making the whole cluster tie in ADC
  * distance. A rerank pool smaller than the cluster then truncates the
  * tie arbitrarily and caps recall at `pool / perCluster` no matter
  * how good the quantizer is — so keep `perCluster` BELOW the rerank
  * pool (default 80 < the tool's pool=100).
  *
  * Generation is pure column algebra over `spark.range` — distributed,
  * no driver-side arrays, any scale.
  *
  *   runMain graft.tools.PlantedCorpus <out.parquet> \
  *       [nClusters=125] [perCluster=80] [dim=64] [epsMilli=150]
  *
  * Output: `(vec_id: long, cluster: int, embedding: array<float>)` —
  * readable by `AnnIndex` (which ignores `cluster`); `cluster = vec_id
  * mod nClusters`, so any id range used as queries spreads across
  * clusters.
  */
object PlantedCorpus {

  /** Hash-derived uniform in [-1, 1] with three mixing keys. */
  private def u(tag: String, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (pmod(xxhash64(lit(tag), a, b), lit(2001L)) - lit(1000L))
      .cast("double") / 1000.0

  def generate(spark: SparkSession, nClusters: Int, perCluster: Int,
      dim: Int, epsMilli: Int): DataFrame = {
    require(nClusters >= 2 && perCluster >= 1 && dim >= 2)
    require(epsMilli >= 0 && epsMilli <= 1000,
      s"epsMilli is noise amplitude in thousandths, got $epsMilli")
    val eps = epsMilli / 1000.0
    spark.range(nClusters.toLong * perCluster)
      .select(col("id").as("vec_id"),
        (col("id") % nClusters).cast("int").as("cluster"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), t =>
          (u("ctr", col("cluster"), t) +
            u("nz", col("vec_id"), t) * eps).cast("float")))
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nClusters = if (args.length > 1) args(1).toInt else 125
    val perCluster = if (args.length > 2) args(2).toInt else 80
    val dim = if (args.length > 3) args(3).toInt else 64
    val epsMilli = if (args.length > 4) args(4).toInt else 150
    val spark = graft.Hgn.session("graft-planted",
      Map("spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, nClusters, perCluster, dim, epsMilli)
      .write.mode(SaveMode.Overwrite).parquet(out)
    println(s"""{"tool":"planted","n":${nClusters.toLong * perCluster},""" +
      s""""clusters":$nClusters,"dim":$dim,"eps_milli":$epsMilli,""" +
      s""""out":"$out"}""")
    spark.stop()
  }
}
