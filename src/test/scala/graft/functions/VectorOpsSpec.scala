package graft.functions

import graft.SparkSpec
import graft.pipeline.Hashing
import org.apache.spark.sql.functions._

/** The native vector expressions must be bit-identical to the
  * higher-order composites they replace, on seeded random data.
  */
class VectorOpsSpec extends SparkSpec {

  private val DIM = 16

  private def vecs(seed: Long, rows: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until rows).map { i =>
      (i.toLong, Array.fill(DIM)((rnd.nextFloat() * 2 - 1)))
    }.toDF("vec_id", "embedding")
  }

  /** The replaced composites, verbatim. */
  private def quantized(v: org.apache.spark.sql.Column) =
    transform(v, x => floor(x.cast("double") * 1000).cast("long"))
  private def qdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def hofMicroCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val qa = quantized(a); val qb = quantized(b)
    floor(qdot(qa, qb).cast("double") /
      sqrt(qdot(qa, qa).cast("double") * qdot(qb, qb).cast("double")) * 1000000)
      .cast("long")
  }
  private def hofLsh(v: org.apache.spark.sql.Column, dim: Int, planes: Int, tables: Int) = {
    val qv = quantized(v)
    array((0 until tables).map { t =>
      (0 until planes).map { p =>
        val base = (t * planes + p) * dim
        val proj = aggregate(
          zip_with(qv, sequence(lit(0), lit(dim - 1)),
            (x, i) => x * ((lit(1103515245L) * (lit(base.toLong) + i)
              + lit(12345L)) % 2001L - 1000L)),
          lit(0L), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }
  private def hofSig(hs: org.apache.spark.sql.Column, k: Int) =
    array((0 until k).map(i =>
      array_min(transform(hs,
        x => (lit(Hashing.hashA(i)) * x + lit(Hashing.hashB(i))) % Hashing.P))): _*)

  test("MicroCosine equals the zip_with/aggregate composite") {
    val df = vecs(11L, 80)
    val pairs = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        MicroCosine(col("a.embedding"), col("b.embedding")).as("native"),
        hofMicroCos(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("LshBuckets equals the per-plane composite") {
    val df = vecs(23L, 200)
      .select(
        LshBuckets(col("embedding"), DIM, 8, 4).as("native"),
        hofLsh(col("embedding"), DIM, 8, 4).as("hof"))
    assert(df.filter(not(col("native") === col("hof"))).count() == 0)
  }

  test("extensions expose the native expressions to plain SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  hashed_shingles('a b c d', 2, false) AS hs,
        |  micro_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS mc,
        |  lsh_buckets(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 2, 4, 2) AS lb,
        |  minhash_sig(array(CAST(5 AS BIGINT), CAST(9 AS BIGINT)), 3) AS sig
        |""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0).length == 3) // 'a b','b c','c d'
    assert(r.getLong(1) == 1000000L)      // identical unit vectors
    assert(r.getSeq[Long](2).length == 2)
    assert(r.getSeq[Long](3).length == 3)
  }

  test("type contracts: array<double> SQL inputs compute natively, not misread") {
    GraftExtensions.register(spark)
    // Round 4: these silently misread 8-byte slots as floats. The vector
    // kernels now branch on the element width declared at analysis time.
    val r = spark.sql(
      """SELECT
        |  micro_cosine(CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>),
        |               CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>)) AS mc,
        |  lsh_buckets(CAST(array(0.5, -0.5) AS ARRAY<DOUBLE>), 2, 4, 2) AS lb,
        |  minhash_sig(array(5, 9), 3) AS sig
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 1000000L) // identical unit vectors
    // On exactly-representable components the double path must agree
    // bit-for-bit with the float path.
    val lbF = spark.sql(
      "SELECT lsh_buckets(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 2, 4, 2)")
      .collect()(0).getSeq[Long](0)
    assert(r.getSeq[Long](1) == lbF)
    val sigL = spark.sql(
      "SELECT minhash_sig(array(CAST(5 AS BIGINT), CAST(9 AS BIGINT)), 3)")
      .collect()(0).getSeq[Long](0)
    assert(r.getSeq[Long](2) == sigL) // array<int> widened by analysis
  }

  test("type contracts: uncastable inputs fail analysis, never run") {
    GraftExtensions.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT micro_cosine(1, 2)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(map(1, 2), 3)").collect()
    }
  }

  test("MinHashSig equals the k array_min composites, incl. empty array") {
    import spark.implicits._
    val hs = Seq(
      Seq(5L, 99L, 1048572L, 0L, 123456L),
      Seq(7L),
      Seq.empty[Long]).toDF("hs")
      .select(
        MinHashSig(col("hs"), 48).as("native"),
        hofSig(col("hs"), 48).as("hof"))
    val bad = hs.filter(not(col("native") <=> col("hof"))).count()
    assert(bad == 0)
  }
}
