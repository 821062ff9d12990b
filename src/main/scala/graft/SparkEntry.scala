package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query catalogs from graft.queries.*; each QueryDef
  * carries the Spark implementation and (where SQL-expressible) the
  * DuckDB oracle the driver uses for hash-compare.
  */
object SparkEntry {
  private def catalogs: Seq[QueryDef] =
    _root_.graft.queries.All.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalogs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
