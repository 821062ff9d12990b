package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loading for the driver-generated TPC-H-ish test data
  * (see TESTDATA.md). Tables: region nation customer supplier part
  * orders lineitem events documents embeddings.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize the events `ts` column to session-timezone TIMESTAMP,
    * whatever physical shape the generator emitted:
    *
    *  - parquet TIMESTAMP(NANOS) read with `nanosAsLong` → epoch-nano
    *    BIGINT: integer-divide to micros (double division of ~1.7e18
    *    nanos loses sub-µs exactness past 2^53, ADVICE round 1);
    *  - parquet timestamp[us] without UTC adjustment → TIMESTAMP_NTZ:
    *    cast to TIMESTAMP (every entrypoint pins
    *    spark.sql.session.timeZone=UTC, so the cast is value-preserving
    *    and matches DuckDB's naive read of the same file);
    *  - already TIMESTAMP: pass through.
    *
    * Works on batch and streaming frames alike (schema-only dispatch).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }

  /** Load one table from an sf directory (events gets `ts` normalized). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // Tolerate the nanos generation; harmless for micros data. Set once
      // per session in practice; idempotent so ad-hoc loads still work.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(path))
    } else spark.read.parquet(path)
  }

  /** Register every table as a temp view so `spark.sql` queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
