package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool measuring the hub-degree cap on a synthetic skewed graph
  * (evidence for SCALE.md's 2-hop section; VERDICT round 2 #2).
  *
  * Graph: `n` vertices in a ring (degree 2) plus one celebrity hub
  * adjacent to every `hubStride`-th vertex — the hub's degree is
  * n/hubStride while every other vertex stays ≤ 3, the shape AQE alone
  * cannot fix (it splits the skewed partition but the Σdeg² row count
  * remains).
  *
  *   sbt "runMain graft.graph.SkewBench 200000 2 500"
  *     → n=200000, hubStride=2 (hub degree 100k), cap=500
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val stride = if (args.length > 1) args(1).toInt else 2
    val cap = if (args.length > 2) args(2).toLong else 500L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ring = spark.range(n).select(
      col("id").as("src"), ((col("id") + 1) % n).as("dst"))
    val hubId = n // one vertex beyond the ring
    val spokes = spark.range(0, n, stride.toLong).select(
      lit(hubId).as("src"), col("id").as("dst"))
    val g = PropertyGraph(
      spark.range(n + 1).select(col("id")),
      ring.unionByName(spokes))

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[skewbench] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s, $c rows")
    }
    time(s"2hop pairs capped($cap)")(
      Neighborhoods.neighborPairs(g, 2, Some(cap)))
    time("2hop pairs exact")(
      Neighborhoods.neighborPairs(g, 2, None))
    spark.stop()
  }
}
