package graft.sources

import java.nio.file.Files

import graft.{Hgn, SparkSpec}
import graft.config.HgnConfig
import graft.graph.HgnParams
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** S10 passthrough, e2e against embedded Derby (the one JDBC engine on
  * the offline classpath). Covers write→read roundtrip, the
  * select(columns, where) parity helper with pushdown, and the
  * config-wired communities sink at the end of a full Hgn run.
  */
class JdbcStoreSpec extends SparkSpec {

  private lazy val dbDir = {
    val d = Files.createTempDirectory("jdbc").toString
    System.setProperty("derby.system.home", d)
    d
  }
  private lazy val cfg = JdbcConfig(
    url = s"jdbc:derby:$dbDir/db;create=true",
    driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))

  test("write → read roundtrip and select() pushdown") {
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    JdbcStore.write(df, cfg, "t1", SaveMode.Overwrite)

    val back = JdbcStore.read(spark, cfg, "t1")
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("id", "name", "score"))

    val sel = JdbcStore.select(spark, cfg, "t1",
      columns = Seq("id", "name"), where = "score > 15")
    assert(sel.columns.toSeq == Seq("id", "name"))
    assert(sel.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    // The predicate must reach the JDBC scan, not filter in Spark.
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("score"),
      s"expected pushed filter in plan:\n$plan")

    // Append = insert_into_table parity.
    JdbcStore.write(Seq((4L, "d", 40.0)).toDF("id", "name", "score"),
      cfg, "t1", SaveMode.Append)
    assert(JdbcStore.read(spark, cfg, "t1").count() == 4)
  }

  test("Hgn run with a datastore config writes the communities table") {
    implicit val s = spark
    val dir = Files.createTempDirectory("jdbcrun").toString
    val nodes = s"$dir/nodes.csv"
    val edges = s"$dir/edges.csv"
    Files.write(java.nio.file.Paths.get(nodes),
      (1 to 6).map(i => s"$i,x").mkString("id,f1\n", "\n", "\n").getBytes)
    Files.write(java.nio.file.Paths.get(edges),
      Seq((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6))
        .map { case (a, b) => s"$a,$b" }.mkString("src,dst\n", "\n", "\n").getBytes)
    val conf = HgnConfig(
      nodesPath = nodes, edgesPath = edges,
      featureNames = Seq("f1"), featuresToCheck = Seq("f1"),
      params = HgnParams(rLvl1Thres = 2.0, rLvl2Thres = 2.0,
        maxEdgeWeight = 0.5, betweennessThres = 1e9, maxSteps = 2),
      outputDir = dir, saveCommunities = false,
      jdbc = Some(cfg), jdbcCommunitiesTable = "comms")
    Hgn.run(conf)
    val written = JdbcStore.read(spark, cfg, "comms")
    assert(written.count() == 6)
    assert(written.select(countDistinct(col("component"))).collect()(0).getLong(0) == 2)
  }

  test("datastore YAML section parses into a JdbcConfig") {
    val c = HgnConfig.parse(
      """input:
        |  nodes_path: /tmp/n.csv
        |  edges_path: /tmp/e.csv
        |  feature_names: [f1]
        |datastore:
        |  url: 'jdbc:derby:/tmp/x;create=true'
        |  username: u
        |  password: p
        |  driver: org.apache.derby.jdbc.EmbeddedDriver
        |  communities_table: out_comms
        |""".stripMargin)
    assert(c.jdbc.contains(JdbcConfig("jdbc:derby:/tmp/x;create=true", "u", "p",
      Some("org.apache.derby.jdbc.EmbeddedDriver"))))
    assert(c.jdbcCommunitiesTable == "out_comms")
    // Reference-style mysql host/db/port triple composes a url.
    val m = HgnConfig.parse(
      """input:
        |  nodes_path: /tmp/n.csv
        |  edges_path: /tmp/e.csv
        |  feature_names: [f1]
        |datastore:
        |  hostname: db.example.com
        |  db_name: hgn
        |  username: u
        |  password: ${NONEXISTENT_VAR_FOR_TEST}
        |""".stripMargin)
    assert(m.jdbc.map(_.url).contains("jdbc:mysql://db.example.com:3306/hgn"))
    assert(m.jdbc.map(_.password).contains(""))
  }
}
