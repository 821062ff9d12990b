import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object LangProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/r17/x30/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    println("docs: " + docs.count())
    def t[T](n: String)(f: => T): T = { val a = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime()-a)/1e9}%.1f s"); r }
    val (m, p) = graft.pipeline.LangNb.loadModel(spark, "/tmp/r17/nbmodel")
    val grid = m.gramLp.localCheckpoint()
    println("grid rows: " + grid.count())
    val grams = docs.select(col("doc_id"),
      explode(graft.pipeline.LangNb.charGrams(col("text"), 3)).as("gram"))
    t("explode count")(println(grams.count()))
    val semi = grams.join(broadcast(grid.select("gram").distinct()), Seq("gram"), "left_semi")
    t("semi count")(println(semi.count()))
    val dg = semi.groupBy("doc_id", "gram").agg(count(lit(1)).as("occ"))
    t("dg agg count")(println(dg.count()))
    val ds = dg.join(broadcast(grid), Seq("gram"))
      .groupBy("doc_id", "label").agg(sum(col("occ") * col("lp")).as("gsum"))
    t("ds count")(println(ds.count()))
    t("full classifyPersisted noop")(
      graft.pipeline.LangNb.classifyPersisted(docs, "/tmp/r17/nbmodel")
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
