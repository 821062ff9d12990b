package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression guard (SCALE.md "verified plan facts"): the
  * properties the 100 TB story depends on, asserted on the EXECUTED
  * adaptive plans at sf0.001 so a change that silently degrades a plan
  * (lost pushdown, a cartesian product, a full sort where a group-limit
  * belongs) fails the suite instead of only the benchmark.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Execute THROUGH the DataFrame's own QueryExecution (collect, not a
    * side write — a write runs a separate QueryExecution and would leave
    * this one's AdaptiveSparkPlanExec un-finalized), then return the
    * FINAL adaptive plan string. All catalog results are small at
    * sf0.001, so the collect is cheap.
    */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("isFinalPlan=false"), s"$name plan not finalized:\n$p")
    p
  }

  test("q06: all filter predicates reach the parquet scan") {
    val p = planOf("q06_filtered_revenue")
    assert(p.contains("PushedFilters: [") && p.contains("l_shipdate"),
      s"pushdown lost:\n$p")
  }

  test("q02: dimension joins broadcast") {
    assert(planOf("q02_revenue_by_nation").contains("BroadcastHashJoin"))
  }

  test("q09 and p08: top-k plans as WindowGroupLimit, not a full sort") {
    assert(planOf("q09_topk_per_segment").contains("WindowGroupLimit"))
    assert(planOf("p08_ann_brute").contains("WindowGroupLimit"))
  }

  test("no cartesian products anywhere in the dedup/ANN/graph hot paths") {
    for (name <- Seq("p04_jaccard_pairs", "p05_minhash_pairs",
        "p11_embedding_dedup", "p19_contamination", "g08_components")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name grew a cross product:\n$p")
    }
  }

  test("p18: probe assignment broadcasts the representative table") {
    val p = planOf("p18_ann_ivf_probed")
    assert(p.contains("BroadcastExchange"), s"rep table not broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"), s"probe ranking is a full sort:\n$p")
  }
}
