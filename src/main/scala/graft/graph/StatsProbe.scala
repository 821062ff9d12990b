package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the localCheckpoint stats time bomb ([[graft.plans.Lineage]]):
  * with plain `localCheckpoint` the checkpointed leaf inherits the origin
  * plan's statistics, so an iterative join loop compounds `sizeInBytes`
  * double-exponentially (digit count doubles per iteration — measured
  * 8→15→28→56→111→222→444→886 over 8 iterations) until the driver spends
  * whole minutes per step multiplying BigInts during planning.
  * `Lineage.cut` holds the digit count constant.
  *
  *   sbt "runMain graft.graph.StatsProbe [plain]"
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val plain = args.contains("plain")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def cut(df: org.apache.spark.sql.DataFrame) =
      if (plain) df.localCheckpoint() else graft.plans.Lineage.cut(df)
    var e = cut((1L to 200L).map(i => (i, i % 50)).toDF("src", "dst"))
    for (i <- 1 to 8) {
      val j = e.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .join(e.as("c"), Seq("src"), "left_semi")
        .distinct()
      val t0 = System.nanoTime()
      val ck = cut(j)
      val digits = ck.queryExecution.optimizedPlan.stats.sizeInBytes.toString(10).length
      println(f"[statsprobe] iter $i: checkpoint ${(System.nanoTime() - t0) / 1e9}%.2f s, sizeInBytes digits=$digits")
      e = ck
    }
    spark.stop()
  }
}
