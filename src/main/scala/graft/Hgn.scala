package graft

import org.apache.spark.sql.SparkSession

import graft.config.HgnConfig
import graft.graph.{HgnPipeline, PropertyGraph}
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
      conf.nodesDelimiter, conf.nodesHasHeader)
    val edges = GraphCsv.loadEdges(spark, conf.edgesPath, conf.edgesHaveWeights,
      conf.edgesDelimiter, conf.edgesHasHeader)
    val g = PropertyGraph(nodes, edges)

    // Init step (main.py:242-258): encode features, per-edge similarities.
    val vectors = DummyVectors.create(g.vertices, conf.featuresToCheck)
    val sims = Cosine.edgeSimilarities(g.edges, vectors)
      .select("src", "dst", "similarity")
      .localCheckpoint()

    // Main loop (betweenness init + iterate handled inside).
    val result = HgnPipeline.run(g, sims, conf.params)

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
