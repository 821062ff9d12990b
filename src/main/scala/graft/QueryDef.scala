package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named query: a Spark implementation plus (optionally) an ANSI-SQL
  * oracle the driver runs in DuckDB over the same parquet tables.
  * Column names/types must line up between the two (the driver sorts
  * columns by name and hash-compares values).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

/** Helpers that make float results reproducible across engines.
  *
  * Summing doubles is order-dependent, so a Spark sum and a DuckDB sum of
  * the same column can differ in the last ulp and fail a hash compare.
  * The test data carries money-like values with <=2 decimal digits, so we
  * sum in exact DECIMAL(18,s) arithmetic (order-independent) and cast the
  * final scalar back to double. The oracle SQL does the same.
  */
object Exact {
  /** Order-independent sum of a <=2-dp double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal product of two <=2-dp doubles (for sum(a*b) patterns). */
  def dmul(a: Column, b: Column, scale: Int = 2): Column =
    a.cast(DecimalType(18, scale)) * b.cast(DecimalType(18, scale))

  /** Matching DuckDB SQL fragment for dsum. `over` (e.g. `"OVER w"`)
    * turns it into the windowed form — the frame applies to the SUM,
    * inside the final cast, matching a Spark `dsum`-shaped `.over(w)`.
    */
  def sqlDsum(expr: String, scale: Int = 2, over: String = ""): String = {
    val win = if (over.isEmpty) "" else s" $over"
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale)))$win AS DOUBLE)"
  }
}
