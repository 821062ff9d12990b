package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the `formatted` physical plan of catalog queries to
  * files — the before/after plan-evidence artifacts the optimization
  * rounds commit under the per-round plans directory (one JVM for the
  * whole batch; `RunQuery ... explain` pays a session build per query).
  *
  *   sbt "runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> q1 q2 ..."
  *
  * writes `<outDir>/<query>_<suffix>.txt` for each query name.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    require(names.nonEmpty, "no query names given")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning.autoConfs(sfDir, cpus.toInt)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("dumpplans-ckpt").toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val path = java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt")
      val out = new java.io.PrintStream(
        java.nio.file.Files.newOutputStream(path), true, "UTF-8")
      try Console.withOut(out) { df.explain("formatted") }
      finally out.close()
      System.err.println(s"[dumpplans] wrote $path")
    }
    spark.stop()
  }
}
