package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Lineage
import graft.graph.{Communities, LabelProp, PageRank}
import graft.queries.GraphQueries

/** Evidence tool for the ITERATED graph joins (round-19 VERDICT nit #6:
  * the catalog-level `explain` of g08/g10/g15 shows only a scan of the
  * final lineage cut, because the loop's per-round plans execute eagerly
  * during query construction — so hint/stats changes to those joins were
  * invisible in the committed plan dumps). This dumps the FORMATTED plan
  * of ONE steady-state round of each loop, built on the same inputs the
  * catalog queries use (cut relations where the loop cuts them):
  *
  *   - `g10_round`: [[PageRank.oneRound]] on the cut (sym ⋈ deg) and a
  *     cut rank relation;
  *   - `g15_round`: [[LabelProp.oneRound]] on the symmetrized cached
  *     edges and a cut label relation;
  *   - `g08_large_star` / `g08_small_star`: [[Communities.largeStar]] /
  *     [[Communities.smallStar]] on the cut canonical edge relation.
  *
  *   sbt "runMain graft.tools.LoopPlanDump <sfDir> <outDir> <suffix>"
  *
  * writes `<outDir>/<name>_<suffix>.txt`.
  */
object LoopPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    implicit val spark: SparkSession =
      graft.SessionTuning.autoConfs(sfDir, cpus.toInt)
        .foldLeft(SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.ui.enabled", "false")) {
          case (b, (k, v)) => b.config(k, v) }
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("loopplan-ckpt").toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def dump(name: String, df: DataFrame): Unit = {
      val path = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      val out = new java.io.PrintStream(
        java.nio.file.Files.newOutputStream(path), true, "UTF-8")
      try Console.withOut(out) { df.explain("formatted") }
      finally out.close()
      System.err.println(s"[loopplan] wrote $path")
    }

    val edges = GraphQueries.derivedEdges(spark, sfDir)

    // g10: mirror PageRank.run's loop state — cut symDeg, cut rank.
    val e10 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val sym10 = e10.union(
      e10.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym10.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val symDeg = Lineage.cut(sym10.join(deg, Seq("src")))
    val pr = Lineage.cut(
      deg.select(col("src").as("id"), lit(500000000L).as("pr")))
    dump("g10_round", PageRank.oneRound(symDeg, pr, 1L, 85L, 100L))

    // g15: mirror LabelProp.run — plain symmetrized edges, cut labels.
    val sym15 = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val labels = Lineage.cut(
      deg.select(col("src").as("id"), col("src").as("label")))
    dump("g15_round", LabelProp.oneRound(sym15, labels))

    // g08: mirror connectedComponents — cut canonical (u > v) edges.
    val e08 = Lineage.cut(
      edges.select(col("src").cast("long").as("s"),
          col("dst").cast("long").as("d"))
        .filter(col("s") =!= col("d"))
        .select(greatest(col("s"), col("d")).as("u"),
          least(col("s"), col("d")).as("v"))
        .distinct())
    dump("g08_large_star", Communities.largeStar(e08))
    dump("g08_small_star", Communities.smallStar(e08))

    spark.stop()
  }
}
