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

  /** Bucketed, sorted table write: pre-shuffles ONCE at write time so
    * every later join/aggregation on `keys` between same-bucketed tables
    * runs WITHOUT an exchange (co-located sort-merge join) — the standard
    * amortization when a big table is joined on the same key by many
    * queries. Bucket metadata lives in the session catalog
    * (`saveAsTable`), which is what lets the planner prove
    * co-partitioning. BucketingSpec asserts the exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

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

  /** S9 parity, presentation half: a self-contained HTML page rendering
    * the graph on a canvas (deterministic circle-seeded spring layout,
    * hover shows the vertex's feature JSON). The reference's Plotly
    * visualizer collected the whole graph into NetworkX on the driver
    * (`visualizer/plotly_visualizer.py:75-210`); here node/edge JSON is
    * RENDERED distributed and only funneled for the single-document write
    * (same inherent `coalesce(1)` as [[exportGraphML]]). `maxNodes` caps
    * the page (a browser cannot draw 100 TB anyway) — the cap keeps the
    * semi-joined edge set consistent, and is a LIMIT, not a collect.
    */
  def exportGraphHtml(g: PropertyGraph, outDir: String, maxNodes: Int = 5000): Unit = {
    // localCheckpoint pins ONE evaluation of the (unordered) limit: the
    // node array and the edge semi-join below must see the same subset,
    // and a re-evaluated GlobalLimit may pick different rows per subtree.
    val v = g.vertices.limit(maxNodes).localCheckpoint()
    val kept = v.select(col("id"))
    val e = g.edges
      .join(kept.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(kept.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    // "<" is JSON-escaped so no feature value can contain "</script>"
    // (or open a tag) inside the inline script block.
    def scriptSafe(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "<", "\\\\u003c")
    val nodeLines = v.select(concat(lit("    "),
      scriptSafe(to_json(struct(v.columns.toIndexedSeq.map(col): _*))), lit(",")).as("line"))
    val edgeLines = e.select(concat(lit("    "),
      scriptSafe(to_json(struct(col("src"), col("dst")))), lit(",")).as("line"))
    val header =
      """<!DOCTYPE html><html><head><meta charset="utf-8">
        |<title>graft graph</title></head><body style="margin:0">
        |<canvas id="c" width="1280" height="960"></canvas><script>
        |const nodes=[""".stripMargin
    val mid = "];\nconst edges=["
    val footer =
      """];
        |const W=1280,H=960,R=Math.min(W,H)/2-40;
        |const idx=new Map(nodes.map((n,i)=>[n.id,i]));
        |const pos=nodes.map((n,i)=>{const a=2*Math.PI*i/nodes.length;
        |  return [W/2+R*Math.cos(a),H/2+R*Math.sin(a)];});
        |for(let it=0;it<60;it++){const f=pos.map(()=>[0,0]);
        |  for(const e of edges){const s=idx.get(e.src),d=idx.get(e.dst);
        |    if(s===undefined||d===undefined)continue;
        |    const dx=pos[d][0]-pos[s][0],dy=pos[d][1]-pos[s][1];
        |    f[s][0]+=.02*dx;f[s][1]+=.02*dy;f[d][0]-=.02*dx;f[d][1]-=.02*dy;}
        |  for(let i=0;i<nodes.length;i++){
        |    f[i][0]+=.002*(W/2-pos[i][0]);f[i][1]+=.002*(H/2-pos[i][1]);
        |    pos[i][0]+=f[i][0];pos[i][1]+=f[i][1];}}
        |const x=document.getElementById('c').getContext('2d');
        |x.strokeStyle='#bbb';
        |for(const e of edges){const s=idx.get(e.src),d=idx.get(e.dst);
        |  if(s===undefined||d===undefined)continue;
        |  x.beginPath();x.moveTo(pos[s][0],pos[s][1]);
        |  x.lineTo(pos[d][0],pos[d][1]);x.stroke();}
        |x.fillStyle='#1f77b4';
        |for(const p of pos){x.beginPath();x.arc(p[0],p[1],3,0,7);x.fill();}
        |document.getElementById('c').title=nodes.length+' nodes, '
        |  +edges.length+' edges';
        |</script></body></html>""".stripMargin
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val doc = Seq((0, header)).toDF("ord", "line")
      .unionByName(nodeLines.select(lit(1).as("ord"), col("line")))
      .unionByName(Seq((2, mid)).toDF("ord", "line"))
      .unionByName(edgeLines.select(lit(3).as("ord"), col("line")))
      .unionByName(Seq((4, footer)).toDF("ord", "line"))
    doc.coalesce(1).sortWithinPartitions("ord")
      .select("line")
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** S9 parity, reference-figure half: the colored-by-community
    * spring-layout scatter (`visualizer/plotly_visualizer.py:75-210`)
    * over an ENGINE-computed layout ([[graft.graph.SpringLayout]] —
    * distributed Fruchterman-Reingold, deterministic), so unlike the
    * reference nothing NetworkX-shaped ever lands on the driver: the
    * layout relation `(id, x, y[, community])` renders to JSON lines
    * distributed and funnels only for the single-document write (the
    * inherent `coalesce(1)` of [[exportGraphML]]). Optional `edges`
    * draws the community-internal link structure under the scatter.
    * Colors derive from `hash(community) % palette` — stable across
    * exports of the same labeling.
    */
  def exportScatterHtml(layout: DataFrame, outDir: String,
      edges: Option[DataFrame] = None): Unit = {
    val hasCom = layout.columns.contains("community")
    val com =
      if (hasCom) col("community").cast("string")
      else lit("all")
    def scriptSafe(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "<", "\\\\u003c")
    val nodeLines = layout.select(concat(lit("    "),
      scriptSafe(to_json(struct(col("id"), col("x"), col("y"),
        com.as("c")))), lit(",")).as("line"))
    val edgeLines = edges.map { e =>
      val kept = layout.select(col("id"))
      e.select(col("src"), col("dst"))
        .join(kept.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(kept.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .select(concat(lit("    "),
          scriptSafe(to_json(struct(col("src"), col("dst")))),
          lit(",")).as("line"))
    }
    val header =
      """<!DOCTYPE html><html><head><meta charset="utf-8">
        |<title>graft communities</title></head><body style="margin:0">
        |<canvas id="c" width="1280" height="960"></canvas><script>
        |const nodes=[""".stripMargin
    val mid = "];\nconst edges=["
    val footer =
      """];
        |const W=1280,H=960,P=24;
        |let xm=1e18,xM=-1e18,ym=1e18,yM=-1e18;
        |for(const n of nodes){xm=Math.min(xm,n.x);xM=Math.max(xM,n.x);
        |  ym=Math.min(ym,n.y);yM=Math.max(yM,n.y);}
        |const sx=v=>P+(W-2*P)*(v-xm)/Math.max(xM-xm,1e-9);
        |const sy=v=>P+(H-2*P)*(v-ym)/Math.max(yM-ym,1e-9);
        |const pal=['#1f77b4','#ff7f0e','#2ca02c','#d62728','#9467bd',
        |  '#8c564b','#e377c2','#7f7f7f','#bcbd22','#17becf'];
        |const cix=s=>{let h=0;for(const ch of s)h=(h*31+ch.charCodeAt(0))|0;
        |  return pal[((h%pal.length)+pal.length)%pal.length];};
        |const g=document.getElementById('c').getContext('2d');
        |const pos=new Map(nodes.map(n=>[n.id,[sx(n.x),sy(n.y)]]));
        |g.strokeStyle='rgba(160,160,160,0.35)';
        |for(const e of edges){const s=pos.get(e.src),d=pos.get(e.dst);
        |  if(!s||!d)continue;
        |  g.beginPath();g.moveTo(s[0],s[1]);g.lineTo(d[0],d[1]);g.stroke();}
        |for(const n of nodes){g.fillStyle=cix(String(n.c));
        |  g.beginPath();g.arc(sx(n.x),sy(n.y),4,0,7);g.fill();}
        |document.getElementById('c').title=nodes.length+' nodes';
        |</script></body></html>""".stripMargin
    val spark = layout.sparkSession
    import spark.implicits._
    val doc = Seq((0, header)).toDF("ord", "line")
      .unionByName(nodeLines.select(lit(1).as("ord"), col("line")))
      .unionByName(Seq((2, mid)).toDF("ord", "line"))
      .unionByName(edgeLines.getOrElse(spark.emptyDataFrame
          .withColumn("line", lit("")).select("line").limit(0))
        .select(lit(3).as("ord"), col("line")))
      .unionByName(Seq((4, footer)).toDF("ord", "line"))
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
  /** `(id, features…, component)` for every community member. Components
    * drive the join: edge endpoints with no vertex row are still
    * community members, carried with "UNKNOWN" string attributes —
    * exactly the reference's backfill for attribute-less NetworkX nodes
    * (`spark_manager/spark_manager.py:364-366`).
    */
  def communitiesTable(g: PropertyGraph,
      precomputed: Option[DataFrame] = None)(
      implicit spark: SparkSession): DataFrame = {
    val components = precomputed.getOrElse(Communities.connectedComponents(g))
    val joined = components.join(g.vertices, Seq("id"), "left")
    g.vertices.schema.fields
      .filter(f => f.name != "id" && f.dataType == org.apache.spark.sql.types.StringType)
      .foldLeft(joined)((df, f) =>
        df.withColumn(f.name, coalesce(col(f.name), lit("UNKNOWN"))))
  }

  def saveCommunitiesCsv(g: PropertyGraph, outDir: String,
      precomputed: Option[DataFrame] = None)(
      implicit spark: SparkSession): DataFrame = {
    val out = communitiesTable(g, precomputed)
    out.write
      .mode(SaveMode.Overwrite)
      .partitionBy("component")
      .option("header", "true")
      .csv(outDir)
    out
  }
}
