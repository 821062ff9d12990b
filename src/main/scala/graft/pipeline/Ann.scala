package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two operators:
  *   - [[bruteForceTopK]]: exact cosine top-k of a (small) query set
  *     against the corpus — the correctness baseline. The query side is
  *     broadcast; the corpus is scanned once, fully parallel; the only
  *     shuffle is the final per-query top-k.
  *   - [[ivfTopK]]: inverted-file variant — both sides are bucketed by a
  *     coarse partition key and the join runs per-bucket (probe=1), the
  *     standard ANN scale path: at 100 TB the cross product never forms,
  *     and each bucket's work is an independent partition.
  *
  * Determinism across engines: cosine is computed on fixed-point
  * quantized components (floor(x*1000) as int64), so the dot/norm sums are
  * exact integers — immune to float summation order — and the final
  * double division + sqrt is a single identical IEEE op in Spark and
  * DuckDB. Ranking ties are broken by neighbor id. No UDFs — the inner
  * product is `zip_with` + `aggregate`, inside codegen.
  */
object Ann {

  /** Fixed-point quantized copy of a float-array column: floor(x*1000). */
  private def quantized(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  private def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine over the quantized components, as double. */
  def cosine(a: Column, b: Column): Column = {
    val qa = quantized(a)
    val qb = quantized(b)
    qdot(qa, qb).cast("double") /
      sqrt(qdot(qa, qa).cast("double") * qdot(qb, qb).cast("double"))
  }

  /** Micro-cosine: floor(cos * 1e6) — the integer rank key the oracle can
    * reproduce bit-for-bit.
    */
  def microCosine(a: Column, b: Column): Column =
    floor(cosine(a, b) * 1000000).cast("long")

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_micro").desc, col("neighbor_id"))
    pairs.select(col("query_id"), col("neighbor_id"), col("sim_micro"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= k)
  }

  /** Exact cosine top-`k` for each query vector against the whole corpus
    * (self excluded). `queries`/`corpus`: `(vec_id, embedding)`.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val pairs = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        microCosine(col("qv"), col("cv")).as("sim_micro"))
    topK(pairs, k)
  }

  /** IVF-style top-`k`: only corpus vectors in the same coarse cell as the
    * query are scanned (probe=1). `cellCol` is the coarse quantizer's cell
    * id — a precomputed cluster/label column here; in a full IVF build it
    * would come from a k-means coarse quantizer, which changes the cell
    * assignment but not this operator's shape.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      col(cellCol).as("cell"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      col(cellCol).as("cell"))
    val pairs = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        microCosine(col("qv"), col("cv")).as("sim_micro"))
    topK(pairs, k)
  }

  /** Random-hyperplane LSH bucketing: `planes` deterministic pseudo-random
    * hyperplanes (components derived from [[Hashing.h60]], in [-1, 1)),
    * bucket = the sign-bit string of the projections. Pairs landing in the
    * same bucket are ANN candidates; callers re-rank with [[cosine]].
    * Deterministic, so oracle-checkable like everything else.
    */
  def hyperplaneBucket(v: Column, dim: Int, planes: Int): Column = {
    require(planes <= 60)
    val qv = quantized(v)
    val bits = (0 until planes).map { p =>
      // plane[p][i] in [-1000, 1000): exact integers, exact dot product.
      val proj = (0 until dim).map { i =>
        val c = (Hashing.h60(s"plane:$p:$i") % 2000L) - 1000L
        qv(i) * lit(c)
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
