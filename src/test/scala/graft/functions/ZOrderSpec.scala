package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  private def z(a: Long, b: Long): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.zValue16(col("a"), col("b")).as("z"))
      .head.getLong(0)
  }

  test("zValue16: interleave hand cases") {
    assert(z(0L, 0L) == 0L)
    assert(z(1L, 0L) == 1L) // a occupies even bit positions
    assert(z(0L, 1L) == 2L) // b occupies odd bit positions
    assert(z(1L, 1L) == 3L)
    assert(z(3L, 0L) == 5L) // 0b11 -> 0b0101
    assert(z(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(z(0xFFFFL, 0L) == 0x55555555L)
    assert(z(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(z(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    // only the low 16 bits participate
    assert(z(0x12340000L + 7L, 0L) == z(7L, 0L))
  }

  test("z-buckets are aligned quadtree cells: both dims span < 2^11") {
    // zbucket = z >> 22 fixes the top 5 bits of BOTH dims, so every
    // bucket covers an exact 2^11 x 2^11 tile — the property that makes
    // the p41 statistics (and parquet footer pruning after
    // writeZOrdered) tight on either column.
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val d = (1 to 20000)
      .map(_ => (rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
      .toDF("a", "b")
    val bad = d
      .withColumn("zbucket",
        shiftright(ZOrder.zValue16(col("a"), col("b")), 22))
      .groupBy("zbucket")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .filter(col("sa") >= 2048 || col("sb") >= 2048)
      .count()
    assert(bad == 0L)
  }

  test("writeZOrdered: per-file ranges stay tight on both dims") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val d = (1 to 50000)
      .map(i => (i.toLong, rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
      .toDF("id", "a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.writeZOrdered(d, s"$dir/z", "a", "b", 16)
    d.repartition(16).write.mode("overwrite").parquet(s"$dir/flat")

    def meanSpans(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa"), avg("sb")).head
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (za, zb) = meanSpans(s"$dir/z")
    val (fa, fb) = meanSpans(s"$dir/flat")
    // 16 files over a 2^32 z-space: each file's contiguous z-range spans
    // ~2^28, which the sqrt law turns into ~2^14 per dim — but the range
    // partitioner's SAMPLED boundaries land mid-tile, so a file can
    // straddle a high-order tile edge and pay up to one extra 2^14 tile
    // per dim (measured ~26k/20k mean). Still strictly inside half the
    // domain, while the unsorted layout has every file covering
    // essentially the whole 65536 range of both dims.
    assert(za < 32768 && zb < 32768, s"z-ordered spans too wide: $za/$zb")
    assert(fa > 60000 && fb > 60000, s"flat layout unexpectedly tight: $fa/$fb")
    // and BOTH dims improved substantially, not just one (the
    // single-column-sort failure mode improves one dim only).
    assert(fa / za > 2.0 && fb / zb > 2.0)
  }
}
