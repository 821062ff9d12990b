package graft.pipeline

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: per-byte cost of the oracle hash (md5-derived [[Hashing.h60]])
  * vs the engine hash (xxHash64 [[Hashing.fast60]]) on the documents
  * table — evidence for the fast-hash mode (VERDICT round 2 #4).
  *
  *   sbt "runMain graft.pipeline.HashBench /root/testdata/sf0.1"
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(make: (Column => Column) => org.apache.spark.sql.DataFrame,
        hash: Column => Column): Unit = {
      make(hash).write.mode("overwrite").format("noop").save() // warmup
      val t0 = System.nanoTime()
      make(hash).write.mode("overwrite").format("noop").save()
      println(f"[hashbench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val fingerprints = (h: Column => Column) =>
      docs.select(col("doc_id"),
        TextAnalysis.shingleFingerprint(col("text"), 3, h).as("fp"))
    val simhash = (h: Column => Column) =>
      Dedup.simHash(docs, 48, 3, hash = h)
    time("fingerprint md5")(fingerprints, Hashing.h60)
    time("fingerprint xxh")(fingerprints, Hashing.fast60)
    time("simhash md5")(simhash, Hashing.h60)
    time("simhash xxh")(simhash, Hashing.fast60)
    spark.stop()
  }
}
