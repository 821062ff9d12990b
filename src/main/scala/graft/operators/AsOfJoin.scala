package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for every left row, the single most recent
  * right row with `right.ts <= left.ts` (inclusive) per key: the standard
  * point-in-time lookup (price as of trade time, last profile state as of
  * event time) that plain equi-joins cannot express and a range-condition
  * join explodes on.
  *
  * Spark has no ASOF operator (DuckDB/Pandas do), so this is the
  * union-and-window formulation — the scalable shape:
  *
  *   1. tag right rows 0 / left rows 1, union by aligned schema;
  *   2. one window per key ordered by `(ts, side)` carries the last
  *      non-null right attributes forward (`last(..., ignoreNulls)` over
  *      an unbounded-preceding row frame);
  *   3. keep the left rows.
  *
  * Cost: ONE hash-partition of `|left| + |right|` rows on the key plus a
  * per-key sort — the same price as a sort-merge join, with NO
  * range-predicate fan-out (a naive `l.ts >= r.ts` join materializes
  * O(|matches per key|²) pairs and then aggregates them away; at 100 TB
  * that intermediate is the whole job).
  *
  * Determinism: at equal `ts` the right row sorts BEFORE the left row
  * (side 0 < 1), giving inclusive `<=` semantics exactly like DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`; left rows only ever contribute nulls
  * to the carried columns, so peer-order among tied left rows cannot
  * change any result. The right side must be unique per `(keys, ts)` —
  * enforced up front with a loud `require`-style check the caller opts
  * out of via `assumeUniqueRight` (skip the extra aggregate when
  * uniqueness is known, e.g. already deduped upstream).
  */
object AsOfJoin {

  /** Left-join `left` to the most recent `right` row per `keys`.
    *
    * Output: every `left` column, plus each requested right column `v`
    * as `asof_<v>` (null when the key has no right row at-or-before the
    * left timestamp). Include `tsCol` in `valueCols` to surface the
    * matched right timestamp itself as `asof_<tsCol>`.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String],
      assumeUniqueRight: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asOf needs at least one key column")
    require(valueCols.nonEmpty, "asOf needs at least one right value column")
    val spark = left.sparkSession
    if (!assumeUniqueRight) {
      // (keys, ts)-unique right rows are what make the carried value
      // well-defined; a duplicate would leave "which peer wins" to
      // partition order. One cheap aggregate, loud failure.
      val dup = right.groupBy((keys :+ tsCol).map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1)
      if (dup.collect().nonEmpty)
        throw new IllegalArgumentException(
          s"asOf right side has duplicate (${keys.mkString(",")}, $tsCol) " +
            "rows — dedupe it (or pass assumeUniqueRight=true only when " +
            "uniqueness is guaranteed upstream)")
    }
    val leftOnly = left.columns.filterNot(c =>
      keys.contains(c) || c == tsCol)
    // The right attributes travel as ONE struct, so every carried column
    // is guaranteed to come from the SAME right row even when some right
    // values are null (per-column last(ignoreNulls) could mix rows).
    val rStructType = org.apache.spark.sql.types.StructType(
      valueCols.map(v => right.schema(v).copy(name = v)))
    val l = left.select(
      (keys :+ tsCol).map(col) ++ leftOnly.map(col) ++
        Seq(lit(1).as("__side"),
          lit(null).cast(rStructType).as("__r")): _*)
    val r = right.select(
      (keys :+ tsCol).map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"),
          struct(valueCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (keys :+ tsCol).map(col) ++ leftOnly.map(col) ++
          valueCols.map(v => col(s"__r.$v").as(s"asof_$v")): _*)
  }
}
