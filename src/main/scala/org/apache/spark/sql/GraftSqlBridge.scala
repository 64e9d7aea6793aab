package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge to Spark's `private[sql]` Column <-> Expression converters
 * (Spark 4 moved `Column(expr)` construction behind
 * `org.apache.spark.sql.classic.ExpressionUtils`). This is the only
 * Spark-internal surface the engine touches.
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a logical plan (used by tests to execute plans
    * produced by standalone rule application). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
