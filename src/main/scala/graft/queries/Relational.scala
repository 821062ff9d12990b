package graft.queries

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage (SURVEY.md §2.2-§2.6): scans, filters,
  * projections, every join flavor the reference uses (inner, full/left
  * outer, left semi, left anti), aggregation, set ops, dedup, explode,
  * window functions.
  *
  * All joins here are declarative DataFrame joins — Catalyst/AQE picks
  * broadcast vs shuffle; dimension tables (region/nation/supplier/part)
  * are small enough that AQE broadcasts them automatically at any SF.
  */
object Relational {
  import Exact._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q22 anomaly-window constants: trailing frame length, z threshold,
    * minimum history before a flag can fire. MUST be defined BEFORE
    * `queries`: the oracle SQL interpolates them EAGERLY at object
    * init, and a forward reference silently reads 0 (Scala object-init
    * order) — exactly the round-11 q22 failure, where the emitted SQL
    * carried `ROWS BETWEEN 0 PRECEDING AND 1 PRECEDING` (empty frame,
    * NULL sums) while the lazily-invoked Spark closure read the
    * correct 10/3/4.
    */
  private val AN_W = 10
  private val AN_K = 3
  private val AN_MIN_N = 4

  /** Loud-overflow bound for q22's Long arithmetic: with |v| ≤ 1e8
    * cents ($1M), thr ≤ K²·n²·v² = 9·100·1e16 = 9e18 < 2⁶³−1 and
    * dev2 ≤ (2n·v)² = 4e18, so every intermediate fits in Long; a
    * larger value raise_errors instead of silently wrapping.
    */
  private val AN_V_MAX = 100000000L

  val queries: Seq[QueryDef] = Seq(
    // ---- A: aggregation over a filtered scan (TPC-H Q1 shape). Filter +
    // column pruning push into the parquet scan; partial aggregation is
    // map-side so the shuffle carries one row per (flag,status) group.
    QueryDef(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dmul(col("l_extendedprice"), lit(1) - col("l_discount")))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // ---- inner joins through two dimensions; nation is broadcast by AQE.
    QueryDef(
      "q02_revenue_by_nation",
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS num_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("num_orders"))
    },

    // ---- left semi join (SURVEY J9 shape).
    QueryDef(
      "q03_semi_join",
      """SELECT c_mktsegment, COUNT(*) AS num_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("num_customers"))
    },

    // ---- left anti join (SURVEY J8 shape).
    QueryDef(
      "q04_anti_join",
      """SELECT c_nationkey, COUNT(*) AS num_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("num_customers"))
    },

    // ---- left outer join + two-level aggregation (TPC-H Q13 shape;
    // null-aware count of the outer side).
    QueryDef(
      "q05_outer_histogram",
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey
        |) GROUP BY c_count""".stripMargin) { (s, dir) =>
      // Scale-safe plan (VERDICT r1): pre-aggregate the fact table by its
      // join key so orders shuffles ONCE (to the ~|customer|-sized count
      // table) instead of through both the join and the re-aggregation.
      val perCust = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      t(s, dir, "customer")
        .join(perCust, col("o_custkey") === col("c_custkey"), "left_outer")
        .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // ---- tight filter conjunction over one table (TPC-H Q6 shape).
    // All four predicates push down to the parquet reader.
    QueryDef(
      "q06_filtered_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .filter(col("l_discount") >= 0.03 && col("l_discount") <= 0.07)
        .filter(col("l_quantity") < 24)
        .agg(
          sum(dmul(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // ---- union + distinct (SURVEY U1/P5).
    QueryDef(
      "q07_union_distinct",
      """SELECT DISTINCT k FROM (
        |  SELECT o_custkey AS k FROM orders
        |  UNION ALL SELECT c_custkey FROM customer)""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .union(t(s, dir, "customer").select(col("c_custkey").as("k")))
        .distinct()
    },

    // ---- except (set difference).
    QueryDef(
      "q08_except",
      "SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders") {
      (s, dir) =>
        t(s, dir, "customer").select(col("c_custkey").as("k"))
          .except(t(s, dir, "orders").select(col("o_custkey").as("k")))
    },

    // ---- window function: top-3 per group with a deterministic
    // tie-break. row_number cast to long to match DuckDB's BIGINT.
    QueryDef(
      "q09_topk_per_segment",
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
    },

    // ---- explode/unnest a computed array (SURVEY §2.7 explode).
    QueryDef(
      "q10_explode_words",
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
    },

    // ---- conditional aggregation (sum(case when), SURVEY A3 shape).
    QueryDef(
      "q11_conditional_agg",
      """SELECT o_orderpriority, COUNT(*) AS total,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS finished_ratio
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val fin = sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("total"),
          fin.as("finished"),
          (fin.cast("double") / count(lit(1))).as("finished_ratio"))
    },

    // ---- time bucketing over the events table (batch equivalent of a
    // tumbling-window streaming aggregation).
    QueryDef(
      "q12_events_daily",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("total_value"))
    },

    // ---- 3-way join fact-to-dims (SURVEY J1/J2 shape at scale: the
    // lineitem-orders join shuffles on orderkey; customer joins via the
    // already-shuffled orders side).
    QueryDef(
      "q13_segment_returnflag",
      """SELECT c_mktsegment, l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  COUNT(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, l_returnflag""".stripMargin) { (s, dir) =>
      // Scale-safe plan (VERDICT r1): Catalyst won't push an aggregate
      // through a join, so pre-aggregate lineitem to one row per
      // (orderkey, returnflag) before joining — the big table crosses the
      // shuffle once, pre-reduced ~4x, and the partial sums stay in exact
      // DECIMAL so the final cast matches the oracle bit-for-bit.
      import org.apache.spark.sql.types.DecimalType
      val pre = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("rev_part"),
          count(lit(1)).as("n_part"))
      pre
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("l_returnflag"))
        .agg(sum(col("rev_part")).cast("double").as("rev"),
          sum(col("n_part")).as("n"))
    },

    // ---- collect_set equivalent with deterministic ordering (SURVEY A1:
    // the neighbor-aggregation shape used all over the reference). The set
    // is emitted as a joined string: the driver's pandas comparator can't
    // hash array cells (round-1 q14 failure). The DuckDB list() aggregate
    // keeps NULL elements while collect_set drops them, hence the FILTER.
    QueryDef(
      "q14_collect_sorted_set",
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)
        |    FILTER (WHERE c_mktsegment IS NOT NULL)), ',') AS segments,
        |  COUNT(DISTINCT c_mktsegment) AS num_segments
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
          countDistinct(col("c_mktsegment")).as("num_segments"))
    },

    // ---- full outer join with coalesced keys (SURVEY J3 shape: the
    // neighbors-x-vertices full join that backfills isolated vertices).
    QueryDef(
      "q15_full_outer",
      """SELECT COALESCE(s.k, c.k) AS nationkey,
        |  COALESCE(n_suppliers, 0) AS n_suppliers,
        |  COALESCE(n_customers, 0) AS n_customers
        |FROM (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
        |FULL OUTER JOIN (SELECT c_nationkey AS k, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
        |ON s.k = c.k""".stripMargin) { (s, dir) =>
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_suppliers"))
      val cust = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_customers"))
      sup.join(cust, col("sk") === col("ck"), "full_outer")
        .select(
          coalesce(col("sk"), col("ck")).as("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
    },

    // ---- as-of (temporal) join: each purchase matched to the user's
    // most recent at-or-before view. Spark has no ASOF operator; the
    // engine's union+window formulation ([[graft.operators.AsOfJoin]])
    // costs one key-partition + sort — vs DuckDB's native ASOF JOIN as
    // the oracle. Timestamps surface as epoch micros (BIGINT) so the
    // comparator never sees engine-specific timestamp physical types.
    QueryDef(
      "q16_asof_join",
      """WITH l AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
        |  epoch_us(r.ts) AS asof_ts_us, r.value AS asof_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsOfJoin
        .asOf(purchases, views, Seq("user_id"), "ts", Seq("ts", "value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("asof_ts_us"),
          col("asof_value"))
    },

    // ---- range (interval) join: clicks inside the 6 h window before
    // each purchase, per user. The engine's bucketized formulation
    // ([[graft.operators.RangeJoin]]) turns the range predicate into an
    // equi-join on (user, time-bin) + residual filter — vs DuckDB's
    // native range join as the oracle. bucketLen = the window length, so
    // interval fan-out is exactly 2 bins.
    QueryDef(
      "q17_range_join",
      """WITH p AS (
        |  SELECT event_id AS p_event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS end_us,
        |    epoch_us(CAST(ts AS TIMESTAMP)) - 21600000000 AS start_us
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS c_event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT p.p_event_id, c.c_event_id, c.user_id, c.ts_us
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.ts_us >= p.start_us AND c.ts_us <= p.end_us""".stripMargin) {
      (s, dir) =>
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"), col("user_id"),
            unix_micros(col("ts")).as("end_us"))
          .withColumn("start_us", col("end_us") - lit(21600000000L))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"))
        graft.operators.RangeJoin.pointsInIntervals(
            clicks, purchases, Seq("user_id"),
            "ts_us", "start_us", "end_us", bucketLen = 21600000000L)
          .select(col("p_event_id"), col("c_event_id"), col("user_id"),
            col("ts_us"))
    },

    // ---- multi-level aggregate: ROLLUP over (returnflag, linestatus)
    // computes detail rows, per-flag subtotals, and the grand total in
    // ONE pass — Catalyst expands the grouping sets before the (single)
    // shuffle and the partial aggregation stays map-side, so at 100 TB
    // this costs the same one shuffle as the plain groupBy, not three
    // passes. gid disambiguates genuine NULL group values from subtotal
    // rows (both engines: grouping(a)*2 + grouping(b)).
    QueryDef(
      "q18_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("sum_qty"), col("n"))
    },

    // ---- pivot: long-to-wide reshape (returnflag rows × linestatus
    // columns). The pivot values are DECLARED (not discovered), so the
    // plan is a single groupBy with per-column conditional aggregates —
    // no extra distinct-values job, one shuffle, map-side partials; the
    // oracle spells out the same thing with FILTER aggregates.
    QueryDef(
      "q19_pivot",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS F,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot(col("l_linestatus"), Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
    },

    // ---- offset window functions: lag over each user's event history —
    // the inter-event-gap signal that feeds sessionization and
    // bot-cadence detection. ONE hash-partition on user_id with a
    // per-partition sort (no global sort); gap math is integer epoch
    // micros so both engines agree bit-for-bit. (ts, event_id) ordering
    // makes lag deterministic under same-timestamp events.
    QueryDef(
      "q20_lag_gaps",
      """SELECT event_id, user_id,
        |  lag(event_id) OVER w AS prev_event_id,
        |  CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events").select(
          col("event_id"), col("user_id"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .as("gap_us"))
    },

    // ---- rolling-frame window: per-user moving sum/count over the last
    // 3 events (ROWS frame) — the trailing-activity feature next to
    // q20's offset window. Same single user_id hash-partition +
    // per-partition sort; the frame sum runs incrementally inside the
    // sorted partition, no self-join. Money-like 2-dp values sum in
    // exact DECIMAL so both engines agree bit-for-bit.
    QueryDef(
      "q21_rolling_sum",
      s"""SELECT event_id, user_id,
         |  ${sqlDsum("value", over = "OVER w")} AS rolling_sum,
         |  COUNT(*) OVER w AS rolling_n
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-2, Window.currentRow)
        t(s, dir, "events").select(
          col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("rolling_sum"),
          count(lit(1)).over(w).as("rolling_n"))
    },

    // ---- trailing-window anomaly flags: z-score outlier detection per
    // user (the fraud/monitoring primitive) made bit-exact cross-engine
    // by never leaving the integers — values in exact cents, the
    // variance test algebraically cleared of division and sqrt:
    //   (x − mean)² > K²·var  ⇔  (x·n − s1)² > K²·(n·s2 − s1²)
    // over the trailing frame's integer sums s1 = Σv, s2 = Σv². The
    // frame EXCLUDES the current row (1 PRECEDING) so an anomaly can't
    // suppress itself. Same single user_id hash-partition + sort as
    // q20/q21; all frame sums incremental inside the sorted partition.
    // Type pinning (round-12 fix): DuckDB's SUM(BIGINT) OVER returns
    // HUGEINT, so without the CASTs the oracle's dev2/thr materialize
    // as DECIMAL(38,0) vs Spark's int64 and the hash compare sinks on
    // type alone — same pinning as g16's modularity aggregates. DuckDB
    // computes exactly in HUGEINT and its CAST errors loudly on
    // overflow; Spark computes in Long behind a raise_error guard
    // (|v_cents| ≤ AN_V_MAX ⇒ thr ≤ 9·10·10·v² < 2⁶³), so both
    // engines fail loudly rather than silently wrapping.
    QueryDef(
      "q22_anomaly",
      s"""SELECT event_id, user_id, v_cents, n_prev, dev2, thr,
         |  (n_prev >= $AN_MIN_N AND dev2 > thr) AS is_anomaly
         |FROM (
         |  SELECT event_id, user_id, v_cents,
         |    COUNT(*) OVER w AS n_prev,
         |    CAST((v_cents * COUNT(*) OVER w - SUM(v_cents) OVER w)
         |      * (v_cents * COUNT(*) OVER w - SUM(v_cents) OVER w)
         |      AS BIGINT) AS dev2,
         |    CAST(${AN_K * AN_K} * (COUNT(*) OVER w * SUM(v_cents * v_cents) OVER w
         |      - SUM(v_cents) OVER w * SUM(v_cents) OVER w) AS BIGINT) AS thr
         |  FROM (
         |    SELECT event_id, user_id, ts,
         |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
         |    FROM events)
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN $AN_W PRECEDING AND 1 PRECEDING)
         |)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-AN_W, -1)
      val n = count(lit(1)).over(w)
      val s1 = sum(col("v_cents")).over(w)
      val s2 = sum(col("v_cents") * col("v_cents")).over(w)
      val dev = col("v_cents") * n - s1
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("v_cents"))
        .withColumn("v_cents",
          when(abs(col("v_cents")) > AN_V_MAX,
            raise_error(concat(lit(s"q22_anomaly: |v_cents| exceeds $AN_V_MAX; " +
              "Long arithmetic for dev2/thr would overflow: "),
              col("v_cents").cast("string"))))
            .otherwise(col("v_cents")))
        .select(col("event_id"), col("user_id"), col("v_cents"),
          n.as("n_prev"),
          (dev * dev).as("dev2"),
          (lit(AN_K * AN_K) * (n * s2 - s1 * s1)).as("thr"))
        .withColumn("is_anomaly",
          col("n_prev") >= AN_MIN_N && col("dev2") > col("thr"))
    }
  )

}
