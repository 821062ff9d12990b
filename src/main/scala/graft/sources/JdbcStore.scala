package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S10: JDBC datastore passthrough — the Spark-native equivalent of the
  * reference's relational CRUD datastore
  * (`datastore/mysql_datastore.py:53-183`, declared but never called from
  * the reference pipeline; SURVEY §2.1 scopes it as dormant).
  *
  * The reference hand-built SQL strings (CREATE/INSERT/SELECT-where-order-
  * limit/DELETE) against a driver-side cursor. On Spark the right shape is
  * the built-in JDBC source: `spark.read.jdbc` is a distributed scan with
  * filter and column-pruning PUSHDOWN (the `where`/`columns` of the
  * reference's `select_from_table` become Catalyst filters the JDBC
  * source compiles back into the remote query), and `df.write.jdbc`
  * covers `create_table`+`insert_into_table` (mode Overwrite ≈
  * drop+create+insert, Append ≈ insert). Row-level UPDATE/DELETE are not
  * a Spark batch concept and stay out of scope, as they were never
  * reachable in the reference either.
  */
final case class JdbcConfig(
    url: String,
    user: String = "",
    password: String = "",
    driver: Option[String] = None) {
  require(url.nonEmpty, "datastore.url is required")

  private[sources] def properties: java.util.Properties = {
    val p = new java.util.Properties()
    if (user.nonEmpty) p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    driver.foreach(p.setProperty("driver", _))
    p
  }
}

object JdbcStore {

  /** Distributed scan of `table`. Compose `.select`/`.where`/`.orderBy`/
    * `.limit` on the result — Catalyst pushes the filters and the column
    * pruning down into the remote SQL, which is the reference's
    * `select_from_table(columns, where, order_by, limit)` without the
    * driver round-trip.
    */
  def read(spark: SparkSession, cfg: JdbcConfig, table: String): DataFrame =
    spark.read.jdbc(cfg.url, table, cfg.properties)

  /** `select_from_table` parity helper: explicit projection + predicate,
    * both expressed declaratively so they push down.
    */
  def select(spark: SparkSession, cfg: JdbcConfig, table: String,
      columns: Seq[String] = Nil, where: String = ""): DataFrame = {
    val base = read(spark, cfg, table)
    val filtered = if (where.nonEmpty) base.where(where) else base
    if (columns.nonEmpty) filtered.select(columns.map(base(_)): _*) else filtered
  }

  /** `create_table` + `insert_into_table` (+ `truncate`/`drop` via the
    * save mode): Overwrite drops and recreates from the DataFrame schema,
    * Append inserts into the existing table.
    */
  def write(df: DataFrame, cfg: JdbcConfig, table: String,
      mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).jdbc(cfg.url, table, cfg.properties)
}
