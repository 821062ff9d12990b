package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed the same way on
  * the join key must sort-merge-join with NO exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without a shuffle") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("buckdb").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '$tmp'")
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 2.0))
      .toDF("k", "id", "v")
    val dims = (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "name")
    Sinks.writeBucketed(facts, "buckdb.facts", Seq("k"), 4)
    Sinks.writeBucketed(dims, "buckdb.dims", Seq("k"), 4)

    // Force the shuffle-based join path so the assertion is about bucket
    // co-location, not about broadcast making the question moot.
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("buckdb.facts").join(spark.table("buckdb.dims"), "k")
      val plan = j.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(j.count() == 1000L)
      // Same-key aggregation is also exchange-free on a bucketed table.
      val agg = spark.table("buckdb.facts").groupBy("k").agg(sum("v"))
      assert(!agg.queryExecution.sparkPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS buckdb.facts")
      spark.sql("DROP TABLE IF EXISTS buckdb.dims")
      spark.sql("DROP DATABASE IF EXISTS buckdb")
    }
  }
}
