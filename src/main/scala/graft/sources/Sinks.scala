package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.{Communities, PropertyGraph}

/** Sinks and persistence helpers (SURVEY §2.1 S3-S7).
  *
  * The reference wrote every intermediate to parquet and read it back as
  * its lineage-truncation device (`spark_manager/spark_manager.py:215-283`);
  * the Spark-4 engine checkpoints instead ([[graft.graph.HgnPipeline]]),
  * keeping parquet persistence only for durable resume points
  * (`cached_init_step`, `main.py:243-245`) and final outputs.
  */
object Sinks {

  /** S3/S4/S5: write a named intermediate and read it back persisted — the
    * reference's `reload_df` (`spark_manager.py:215-231`), for durable
    * resume points. Unlike the reference, no `repartition(1)`: the write
    * stays parallel and readers see the natural split.
    */
  def reload(df: DataFrame, dir: String, name: String,
      persist: Boolean = true): DataFrame = {
    val path = s"$dir/$name.parquet"
    df.write.mode(SaveMode.Overwrite).parquet(path)
    val back = df.sparkSession.read.parquet(path)
    // persist=false for one-shot readers (e.g. the bench harness, which
    // re-runs a query several times — repeated persists would pile
    // cached copies into executor memory and distort later measurements)
    if (persist) back.persist(StorageLevel.MEMORY_AND_DISK) else back
  }

  /** S6: compact appended batches — read, dedup, overwrite — the
    * reference's `clean_and_reload_df` (`spark_manager.py:192-213`).
    */
  def compact(spark: SparkSession, dir: String, name: String): DataFrame = {
    val pre = s"$dir/${name}_pre.parquet"
    val fin = s"$dir/$name.parquet"
    spark.read.parquet(pre).dropDuplicates()
      .write.mode(SaveMode.Overwrite).parquet(fin)
    spark.read.parquet(fin)
  }

  /** S9 replacement (SURVEY §2.1): machine-readable graph export as JSON
    * lines — vertices (with features) and edges into sibling dirs. The
    * reference's Plotly HTML scatter (`visualizer/plotly_visualizer.py`)
    * is presentation, not engine; a JSON export is the composable,
    * distributed equivalent (any plotting tool can consume it).
    */
  def exportGraphJson(g: PropertyGraph, outDir: String): Unit = {
    g.vertices.write.mode(SaveMode.Overwrite).json(s"$outDir/vertices")
    g.edges.write.mode(SaveMode.Overwrite).json(s"$outDir/edges")
  }

  /** S9 parity: GraphML export — one well-formed XML document consumable
    * directly by Gephi/NetworkX/yEd (the consumers of the reference's
    * visualizer output). GraphML is a single rooted document, so the
    * final write necessarily funnels through one task (`coalesce(1)`);
    * that is inherent to the FORMAT, and this sink is meant for the
    * end-of-pipeline, already-community-filtered graph (the node/edge
    * line RENDERING still runs distributed before the coalesce). For
    * machine-to-machine handoff at scale use [[exportGraphJson]].
    */
  def exportGraphML(g: PropertyGraph, outDir: String): Unit = {
    val features = g.vertices.columns.filterNot(_ == "id").toSeq
    def esc(c: org.apache.spark.sql.Column) = {
      // XML entity escaping; ampersand first.
      Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;", "\"" -> "&quot;")
        .foldLeft(c) { case (acc, (from, to)) =>
          regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
        }
    }
    val header =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""".stripMargin +
        features.zipWithIndex.map { case (f, i) =>
          s"""\n  <key id="d$i" for="node" attr.name="$f" attr.type="string"/>"""
        }.mkString +
        "\n  <graph id=\"G\" edgedefault=\"undirected\">"
    val nodeData = features.zipWithIndex.map { case (f, i) =>
      when(col(f).isNotNull,
        concat(lit(s"""<data key="d$i">"""), esc(col(f).cast("string")), lit("</data>")))
        .otherwise(lit(""))
    }
    val nodeLines = g.vertices.select(
      concat((lit("    <node id=\"n") +: col("id").cast("string") +: lit("\">") +:
        nodeData :+ lit("</node>")): _*).as("line"))
    val edgeLines = g.edges.select(
      concat(lit("    <edge source=\"n"), col("src").cast("string"),
        lit("\" target=\"n"), col("dst").cast("string"), lit("\"/>")).as("line"))
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val doc = Seq((0, header)).toDF("ord", "line")
      .unionByName(nodeLines.select(lit(1).as("ord"), col("line")))
      .unionByName(edgeLines.select(lit(2).as("ord"), col("line")))
      .unionByName(Seq((3, "  </graph>\n</graphml>")).toDF("ord", "line"))
    doc.coalesce(1).sortWithinPartitions("ord")
      .select("line")
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** S7: community CSV sink. The reference collected the graph into
    * NetworkX on the driver and wrote one `community_<i>.csv` per
    * component (`spark_manager/spark_manager.py:335-368`) — a driver
    * bottleneck that cannot survive scale. Here the components are
    * computed distributed (GraphX) and written with `partitionBy`, giving
    * `community=<id>/part-*.csv` per component: same information, fully
    * parallel, any cluster size.
    */
  def saveCommunitiesCsv(g: PropertyGraph, outDir: String)(
      implicit spark: SparkSession): DataFrame = {
    val components = Communities.connectedComponents(g)
    // Components drive the join: edge endpoints with no vertex row are
    // still community members, written with "UNKNOWN" string attributes —
    // exactly the reference's backfill for attribute-less NetworkX nodes
    // (`spark_manager/spark_manager.py:364-366`).
    val joined = components.join(g.vertices, Seq("id"), "left")
    val out = g.vertices.schema.fields
      .filter(f => f.name != "id" && f.dataType == org.apache.spark.sql.types.StringType)
      .foldLeft(joined)((df, f) =>
        df.withColumn(f.name, coalesce(col(f.name), lit("UNKNOWN"))))
    out.write
      .mode(SaveMode.Overwrite)
      .partitionBy("component")
      .option("header", "true")
      .csv(outDir)
    out
  }
}
