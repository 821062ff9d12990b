package graft

import graft.config.HgnConfig
import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** End-to-end: CSV graph in, communities CSV out, through [[Hgn.run]] —
  * the whole reference lifecycle (`main.py:216-272`) on a toy graph of two
  * feature-homogeneous triangles joined by a feature-crossing bridge.
  */
class HgnEndToEndSpec extends SparkSpec {

  test("csv -> encode -> similarities -> loop -> communities csv") {
    implicit val s: SparkSession = spark
    val dir = Files.createTempDirectory("hgn-e2e")
    Files.writeString(dir.resolve("nodes.csv"),
      """id,clan
        |1,red
        |2,red
        |3,red
        |4,blue
        |5,blue
        |6,blue
        |""".stripMargin)
    // triangle 1-2-3 (red), triangle 4-5-6 (blue), bridge 3-4.
    Files.writeString(dir.resolve("edges.csv"),
      """src,dst
        |1,2
        |2,3
        |1,3
        |4,5
        |5,6
        |4,6
        |3,4
        |""".stripMargin)
    val conf = HgnConfig(
      nodesPath = dir.resolve("nodes.csv").toString,
      edgesPath = dir.resolve("edges.csv").toString,
      featureNames = Seq("clan"),
      featuresToCheck = Seq("clan"),
      params = graft.graph.HgnParams(
        featureMinAvg = 0.5, // same-clan cosine 1.0, cross-clan 0.0
        rLvl1Thres = 0.45,
        rLvl2Thres = 0.95,
        maxEdgeWeight = 0.5,
        betweennessThres = 1.0,
        maxSteps = 5),
      outputDir = dir.resolve("out").toString)
    val result = Hgn.run(conf)
    // The bridge 3-4 has no common neighbors (r = 0, keepit false) and
    // must be deleted; the triangles are keep-worthy and survive.
    val edges = result.edges.select("src", "dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!edges.contains((3L, 4L)) && !edges.contains((4L, 3L)))
    assert(edges.size == 6)
    val commDirs = new java.io.File(conf.outputDir + "/communities")
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(commDirs.toSeq == Seq("component=1", "component=4"))
  }
}
