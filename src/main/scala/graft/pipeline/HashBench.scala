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

    def time(label: String)(make: Hashing.HashMode => org.apache.spark.sql.DataFrame,
        mode: Hashing.HashMode): Unit = {
      make(mode).write.mode("overwrite").format("noop").save() // warmup
      val t0 = System.nanoTime()
      make(mode).write.mode("overwrite").format("noop").save()
      println(f"[hashbench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val fingerprints = (m: Hashing.HashMode) =>
      docs.select(col("doc_id"),
        TextAnalysis.shingleFingerprint(col("text"), 3, m).as("fp"))
    val simhash = (m: Hashing.HashMode) =>
      Dedup.simHash(docs, 48, 3, mode = m)
    val hofFingerprints = (m: Hashing.HashMode) =>
      docs.select(col("doc_id"), array_min(transform(
        Shingles.wordShingles(TextAnalysis.tokens(col("text")), 3),
        s => m(s))).as("fp"))
    time("fingerprint md5 (native)")(fingerprints, Hashing.HashMode.Oracle)
    time("fingerprint xxh (native)")(fingerprints, Hashing.HashMode.Fast)
    time("fingerprint md5 (HOF)")(hofFingerprints, Hashing.HashMode.Oracle)
    time("fingerprint xxh (HOF)")(hofFingerprints, Hashing.HashMode.Fast)
    time("simhash md5 (native)")(simhash, Hashing.HashMode.Oracle)
    time("simhash xxh (native)")(simhash, Hashing.HashMode.Fast)
    spark.stop()
  }
}
