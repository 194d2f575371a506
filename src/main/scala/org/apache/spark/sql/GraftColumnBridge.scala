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
}
