package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated TPC-H-ish test data
  * (see TESTDATA.md). Tables: region nation customer supplier part
  * orders lineitem events documents embeddings.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from an sf directory.
    *
    * The events table stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark rejects by default; read nanos as long and convert to a
    * microsecond timestamp (Spark's native precision).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      // Set once per session in practice; kept idempotent here so ad-hoc
      // loads outside Bench/Verify still work.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      // Integer division: double division of epoch nanos (~1.7e18) loses
      // sub-microsecond exactness past 2^53 (ADVICE round 1).
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(path)
  }

  /** Register every table as a temp view so `spark.sql` queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
