package graft

import org.apache.spark.sql.SparkSession

import graft.config.HgnConfig
import graft.graph.{Betweenness, HgnPipeline, PropertyGraph}
import graft.ml.{Cosine, DummyVectors}
import graft.sources.{GraphCsv, Sinks}

/** CLI entry point — the reference's `python main.py -c conf.yml [-d]`
  * (`main.py:216-272`) rebuilt on the Spark-native engine:
  *
  *   load CSV graph → one-hot dummy vectors → per-edge cosine
  *   similarities → bounded betweenness → iterate (r-metrics → edge
  *   weights → delete) to convergence → communities → CSV sink.
  */
object Hgn {

  def session(appName: String = "hgn"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName(appName)
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("hgn-ckpt").toString)
    spark
  }

  def run(conf: HgnConfig)(implicit spark: SparkSession): PropertyGraph = {
    val nodes = GraphCsv.loadNodes(spark, conf.nodesPath, conf.featureNames,
      conf.nodesDelimiter, conf.nodesHasHeader, conf.nodesEncoding)
    val edges = GraphCsv.loadEdges(spark, conf.edgesPath, conf.edgesHaveWeights,
      conf.edgesDelimiter, conf.edgesHasHeader)
    val g = PropertyGraph(nodes, edges)

    // Init step (main.py:242-258): encode features, per-edge similarities,
    // betweenness. With `cached_init_step` (main.py:243-245), a previous
    // run's persisted init tables under `output.dir/init` are reused —
    // on a big graph the init betweenness is the most expensive stage,
    // and a resumed run skips the ML fit and path enumeration entirely.
    val initDir = s"${conf.outputDir}/init"
    def initPath(name: String) = new org.apache.hadoop.fs.Path(s"$initDir/$name.parquet")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val (sims, btw) =
      if (conf.cachedInitStep &&
          fs.exists(initPath("similarities")) && fs.exists(initPath("betweenness"))) {
        (spark.read.parquet(initPath("similarities").toString),
         spark.read.parquet(initPath("betweenness").toString))
      } else {
        val t0 = System.nanoTime()
        val vectors = DummyVectors.create(g.vertices, conf.featuresToCheck)
        val s0 = Cosine.edgeSimilarities(g.edges, vectors)
          .select("src", "dst", "similarity")
        val b0 = Betweenness.run(g, conf.params.maxSpLength,
          conf.params.maxMidDegree)
        val out =
          if (conf.cachedInitStep)
            (Sinks.reload(s0, initDir, "similarities"),
             Sinks.reload(b0, initDir, "betweenness"))
          else (graft.plans.Lineage.cut(s0), graft.plans.Lineage.cut(b0))
        println(f"[hgn] init step (similarities + betweenness): ${(System.nanoTime() - t0) / 1e9}%.1f s")
        out
      }

    // Main loop (iterations handled inside; betweenness init supplied).
    val result = HgnPipeline.run(g, sims, conf.params, Some(btw))

    if (conf.saveCommunities)
      Sinks.saveCommunitiesCsv(result, s"${conf.outputDir}/communities")
    result
  }

  def main(args: Array[String]): Unit = {
    val confPath = args.sliding(2).collectFirst {
      case Array("-c", p) => p
      case Array("--config-file", p) => p
    }.getOrElse(sys.error("usage: hgn -c <conf> [-d]"))
    val conf = HgnConfig.fromFile(confPath)
    implicit val spark: SparkSession = session()
    if (args.contains("-d") || args.contains("--debug"))
      spark.sparkContext.setLogLevel("DEBUG")
    else spark.sparkContext.setLogLevel("WARN")
    val g = run(conf)
    println(s"HGN finished. Nodes: ${g.vertices.count()}, Edges: ${g.edges.count()}")
    spark.stop()
  }
}
