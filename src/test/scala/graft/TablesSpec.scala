package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guards `Tables.normalizeTs` + the per-table schema contract against
  * test-data generator drift.
  *
  * The driver has shipped the events table in two physical shapes so
  * far: parquet TIMESTAMP(NANOS) (readable only as epoch-nano BIGINT
  * via `nanosAsLong`) and parquet timestamp[us] without UTC adjustment
  * (read as TIMESTAMP_NTZ). Round 8's bench broke because the loader
  * assumed the first shape; this spec writes all three shapes the
  * loader claims to handle and asserts they normalize to the same
  * session-timezone TIMESTAMP values. Round 10 extends the guard to
  * every table (`Tables.contracts`): a drift in ANY column of the ten
  * driver tables now fails the FIRST load with a named-column diff
  * (VERDICT round 9 #3) instead of a mid-bench DATATYPE_MISMATCH.
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

  test("BIGINT ts below the plausible-nanos floor raises instead of landing in 1970") {
    // ADVICE round 9: a plain INT64 epoch-MICROS column is
    // schema-indistinguishable from the nanos shape; dividing it by
    // 1000 would silently produce ~1970 stamps. The nanos branch guards
    // per value: post-2024 MICROS magnitudes (~1.7e15) sit 60x below
    // MinPlausibleNanos and must throw, not truncate.
    import spark.implicits._
    val asMicros = micros.toDF("ts") // WRONG unit for the BIGINT shape
    val out = Tables.normalizeEventTs(asMicros)
    val e = intercept[Exception] { out.collect() }
    assert(e.getMessage.contains("epoch NANOS"), e.getMessage)
    // Sanity of the floor itself: genuine nanos for the oldest driver
    // data (TPC-H 1992 dates, ~6.9e17 ns) clear it.
    assert(694224000000000000L > Tables.MinPlausibleNanos)
  }

  test("all ten driver tables load contract-clean at sf0.001") {
    for (name <- Tables.all) {
      val df = Tables.load(spark, "/root/testdata/sf0.001", name)
      // load() already ran assertContract; re-assert the normalized
      // timestamp columns explicitly (the round-8 failure class).
      for ((c, t) <- Tables.contracts(name))
        assert(df.schema(c).dataType.typeName === t.typeName, s"$name.$c")
    }
  }

  test("contract violation fails with a named-column diff") {
    val badMissing = StructType(Seq(StructField("r_regionkey", IntegerType)))
    val e1 = intercept[IllegalStateException] {
      Tables.assertContract("region", badMissing)
    }
    assert(e1.getMessage.contains("region") &&
      e1.getMessage.contains("missing r_name"), e1.getMessage)

    val badTyped = StructType(Seq(
      StructField("r_regionkey", StringType), StructField("r_name", StringType),
      StructField("bonus", LongType)))
    val e2 = intercept[IllegalStateException] {
      Tables.assertContract("region", badTyped)
    }
    assert(e2.getMessage.contains("unexpected bonus"), e2.getMessage)
    assert(e2.getMessage.contains("r_regionkey: expected int, got string"),
      e2.getMessage)
  }

  test("a nanos-generation of orders/lineitem/events normalizes to the same contract") {
    // The forward-drift case the contract exists for: regenerate each
    // ts-bearing table in the OTHER physical shape (BIGINT nanos) and
    // assert load() still yields the contract schema with identical
    // micros values.
    import spark.implicits._
    val dir = Files.createTempDirectory("tables-drift").toString
    val src = "/root/testdata/sf0.001"
    for ((table, tsCol) <- Seq("orders" -> "o_orderdate",
        "lineitem" -> "l_shipdate", "events" -> "ts")) {
      val orig = Tables.load(spark, src, table)
      orig.withColumn(tsCol, unix_micros(col(tsCol)) * 1000L)
        .write.parquet(s"$dir/$table.parquet")
      val drifted = Tables.load(spark, dir, table)
      assert(drifted.schema(tsCol).dataType === TimestampType, table)
      val a = orig.select(unix_micros(col(tsCol))).as[Long].collect().sorted.toSeq
      val b = drifted.select(unix_micros(col(tsCol))).as[Long].collect().sorted.toSeq
      assert(a === b, s"$table values drifted through nanos round-trip")
    }
  }
}
