package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Minimal `private[sql]` bridge for [[graft.plans.Lineage]]: building a
  * DataFrame from a hand-constructed logical plan (`Dataset.ofRows`) has
  * no public equivalent. Standard Spark-extension pattern (a shim object
  * under `org.apache.spark.sql`); nothing else from the internals is
  * re-exported.
  */
object Shim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  // `AbstractDataType`/`TypeCollection` are `private[sql]`, but they are
  // the only vocabulary `ExpectsInputTypes.inputTypes` speaks — any
  // extension declaring input-type contracts needs these two names.
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
  def typeCollection(ts: org.apache.spark.sql.types.AbstractDataType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(ts: _*)
}
