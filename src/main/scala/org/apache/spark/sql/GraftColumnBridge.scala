package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression converters so
  * graft's custom Catalyst expressions (e.g. graft.functions.DotProduct)
  * can expose a public Column API. Standard extension-library technique:
  * the classic converters live behind `org.apache.spark.sql.classic.
  * ExpressionUtils`, package-private since the Spark Connect split.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the hook a custom
    * whole-operator node (graft.plans.AsOfJoinPlan) needs to surface a
    * public DataFrame API. `Dataset.ofRows` is `private[sql]` since the
    * Spark Connect split. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (classic API). */
  def analyzed(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
