package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards `Tables.normalizeEventTs` against test-data generator drift.
  *
  * The driver has shipped the events table in two physical shapes so
  * far: parquet TIMESTAMP(NANOS) (readable only as epoch-nano BIGINT
  * via `nanosAsLong`) and parquet timestamp[us] without UTC adjustment
  * (read as TIMESTAMP_NTZ). Round 8's bench broke because the loader
  * assumed the first shape; this spec writes all three shapes the
  * loader claims to handle and asserts they normalize to the same
  * session-timezone TIMESTAMP values.
  */
class TablesSpec extends SparkSpec {

  // 2024-01-01T00:00:00 plus offsets, in epoch micros (UTC session tz).
  private val baseUs = 1704067200000000L
  private val micros = Seq(baseUs, baseUs + 1L, baseUs + 987654L, baseUs + 86400000000L)

  test("nanos-as-long, TIMESTAMP_NTZ, and TIMESTAMP events all normalize identically") {
    import spark.implicits._
    val asLong = micros.map(_ * 1000L).toDF("ts") // epoch nanos as BIGINT
    val asNtz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val asLtz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))

    val expected = micros.sorted
    for ((df, shape) <- Seq(asLong -> "long", asNtz -> "ntz", asLtz -> "ltz")) {
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType === TimestampType, s"shape=$shape")
      val got = out.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
      assert(got === expected, s"shape=$shape")
    }
  }

  test("normalization round-trips through parquet for both generator shapes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tables-spec").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    // Shape 1: plain BIGINT nanos column (what nanosAsLong yields from
    // TIMESTAMP(NANOS) files — parquet-level indistinguishable here).
    micros.map(_ * 1000L).toDF("ts").write.parquet(s"$dir/nanos.parquet")
    // Shape 2: TIMESTAMP_NTZ micros, the round-8 generator output.
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dir/ntz.parquet")

    val fromLong = Tables.normalizeEventTs(spark.read.parquet(s"$dir/nanos.parquet"))
    val fromNtz = Tables.normalizeEventTs(spark.read.parquet(s"$dir/ntz.parquet"))
    val a = fromLong.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    val b = fromNtz.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    assert(a === micros.sorted)
    assert(b === micros.sorted)
  }
}
