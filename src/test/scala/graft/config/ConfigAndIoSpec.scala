package graft.config

import graft.SparkSpec
import graft.sources.{GraphCsv, Sinks}
import graft.graph.PropertyGraph

import java.nio.file.Files

class ConfigAndIoSpec extends SparkSpec {

  test("config parses the two-level yaml subset with env interpolation") {
    val text =
      """# comment
        |input:
        |  nodes_path: /data/nodes.csv
        |  edges_path: ${GRAFT_TEST_EDGES_UNSET}/edges.csv
        |  feature_names: [id, religion, gender]
        |run_options:
        |  features_to_check: [religion]
        |  r_lvl1_thres: 0.6
        |  max_steps: 7
        |output:
        |  dir: /tmp/out
        |""".stripMargin
    val c = HgnConfig.parse(text)
    assert(c.nodesPath == "/data/nodes.csv")
    assert(c.edgesPath == "/edges.csv") // unset env var -> empty
    assert(c.featureNames == Seq("id", "religion", "gender"))
    assert(c.featuresToCheck == Seq("religion"))
    assert(c.params.rLvl1Thres == 0.6 && c.params.maxSteps == 7)
    assert(c.params.rLvl2Thres == 0.85) // default preserved
    assert(c.outputDir == "/tmp/out")
  }

  test("config keeps '#' inside values and ':' inside '='-format values") {
    val c = HgnConfig.parse(
      """input:
        |  nodes_path: /data/run#3/nodes.csv  # trailing comment stripped
        |  edges_path: /data/edges.csv
        |  feature_names: [id, f]
        |run_options.cached_init_step=true
        |output.dir=/tmp/a:b
        |""".stripMargin)
    assert(c.nodesPath == "/data/run#3/nodes.csv")
    assert(c.cachedInitStep)
    assert(c.outputDir == "/tmp/a:b")
  }

  test("config parses the optional hub-degree cap") {
    val base =
      """input:
        |  nodes_path: a
        |  edges_path: b
        |  feature_names: [x]
        |""".stripMargin
    assert(HgnConfig.parse(base).params.maxMidDegree.isEmpty)
    assert(HgnConfig.parse(base + "run_options.max_mid_degree: 500\n")
      .params.maxMidDegree.contains(500L))
  }

  test("config rejects unknown keys (typo safety), accepts tag/spark.*") {
    val base =
      """input:
        |  nodes_path: /tmp/n.csv
        |  edges_path: /tmp/e.csv
        |  feature_names: [f1]
        |""".stripMargin
    val ex = intercept[IllegalArgumentException] {
      HgnConfig.parse(base + "run_options:\n  max_sp_lenght: 3\n")
    }
    assert(ex.getMessage.contains("max_sp_lenght"))
    assert(ex.getMessage.contains("max_sp_length")) // known keys listed
    // tag + spark.* pass through untouched (reference conf sections).
    HgnConfig.parse(base + "tag: prod\nspark:\n  spark.executor.memory: 4g\n")
  }

  test("config collects the yaml spark section into sparkConf") {
    val c = HgnConfig.parse(
      """input:
        |  nodes_path: a
        |  edges_path: b
        |  feature_names: [x]
        |spark:
        |  spark.executor.memory: 4g
        |  spark.sql.shuffle.partitions: 64
        |""".stripMargin)
    assert(c.sparkConf == Map(
      "spark.executor.memory" -> "4g",
      "spark.sql.shuffle.partitions" -> "64"))
  }

  test("Hgn.session honors yaml spark.* where the engine owns the session") {
    // Reference parity (`spark_manager/spark_manager.py:79-84`): the CLI
    // session builder applies the conf map. Against this JVM's existing
    // session, getOrCreate applies the modifiable (runtime SQL) subset —
    // exactly the keys a user can expect to land post-hoc.
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val s = graft.Hgn.session(
        extraConf = Map("spark.sql.shuffle.partitions" -> "7"))
      assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("config rejects features_to_check outside feature_names") {
    intercept[IllegalArgumentException] {
      HgnConfig.parse(
        """input:
          |  nodes_path: a
          |  edges_path: b
          |  feature_names: [x]
          |run_options:
          |  features_to_check: [y]
          |""".stripMargin)
    }
  }

  test("csv graph sources apply explicit schemas") {
    val dir = Files.createTempDirectory("graftcsv")
    val nodesCsv = dir.resolve("nodes.csv")
    Files.writeString(nodesCsv, "id,religion\n1,Quaker\n2,Sojourner\n")
    val edgesCsv = dir.resolve("edges.csv")
    Files.writeString(edgesCsv, "src|dst\n1|2\n")
    val nodes = GraphCsv.loadNodes(spark, nodesCsv.toString, Seq("religion"))
    assert(nodes.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("id", "long"), ("religion", "string")))
    assert(nodes.count() == 2)
    val edges = GraphCsv.loadEdges(spark, edgesCsv.toString,
      hasWeights = false, delimiter = "|")
    assert(edges.schema.fieldNames.toSeq == Seq("src", "dst"))
    assert(edges.head().getLong(0) == 1L)
    assert(GraphCsv.edgesSchema(hasWeights = true).fieldNames.toSeq ==
      Seq("src", "dst", "weight"))
  }

  test("graph json export round-trips") {
    import spark.implicits._
    val g = PropertyGraph(
      Seq((1L, "a"), (2L, "b")).toDF("id", "feat"),
      Seq((1L, 2L)).toDF("src", "dst"))
    val out = Files.createTempDirectory("graftjson").toString + "/g"
    Sinks.exportGraphJson(g, out)
    assert(spark.read.json(s"$out/vertices").count() == 2)
    val e = spark.read.json(s"$out/edges").select("src", "dst").head()
    assert((e.getLong(0), e.getLong(1)) == (1L, 2L))
  }

  test("graphml export is one well-formed document Gephi could load") {
    import spark.implicits._
    val g = PropertyGraph(
      Seq((1L, "a<b&c"), (2L, "plain"), (3L, null.asInstanceOf[String]))
        .toDF("id", "label"),
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val dir = Files.createTempDirectory("graphml").toString
    Sinks.exportGraphML(g, dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val xml = new String(Files.readAllBytes(file.toPath), "UTF-8")
    // JDK parser accepts it => well-formed (escaping correct)
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    assert(doc.getElementsByTagName("node").getLength == 3)
    assert(doc.getElementsByTagName("edge").getLength == 2)
    assert(xml.contains("a&lt;b&amp;c"))
  }

  test("html export renders a self-contained page with the graph embedded") {
    import spark.implicits._
    val g = PropertyGraph(
      Seq((1L, "a\"quote"), (2L, "x</script><b>"), (3L, "c")).toDF("id", "label"),
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val dir = Files.createTempDirectory("graphhtml").toString
    Sinks.exportGraphHtml(g, dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val html = new String(Files.readAllBytes(file.toPath), "UTF-8")
    assert(html.startsWith("<!DOCTYPE html>") && html.trim.endsWith("</html>"))
    assert(html.contains("""{"id":1,"label":"a\"quote"}"""), "to_json escaping")
    // A feature value must not be able to close the script block.
    assert(!html.contains("x</script>"), "script-safe escaping")
    assert(html.contains("x\\u003c/script>\\u003cb>"), "escaped form present")
    assert(html.contains("""{"src":2,"dst":3}"""))
    // maxNodes caps nodes AND keeps the edge set consistent (semi-join).
    val small = Files.createTempDirectory("graphhtml2").toString
    Sinks.exportGraphHtml(g, small, maxNodes = 1)
    val h2 = new String(Files.readAllBytes(new java.io.File(small).listFiles()
      .filter(_.getName.startsWith("part-")).head.toPath), "UTF-8")
    assert(!h2.contains("""{"src":2,"dst":3}"""))
  }

  test("community csv sink partitions by component") {
    import spark.implicits._
    implicit val s = spark
    val g = PropertyGraph(
      Seq((1L, "a"), (2L, "b"), (7L, "c")).toDF("id", "feat"),
      Seq((1L, 2L)).toDF("src", "dst"))
    val out = Files.createTempDirectory("graftcomm").toString + "/comm"
    Sinks.saveCommunitiesCsv(g, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq == Seq("component=1", "component=7"))
  }
}
