package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT dot_product(a.embedding, b.embedding) ...")` works
  * alongside the Column API.
  */
object GraftFunctions {
  private def buildDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"dot_product expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  /** Register into an existing session (temp function). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", buildDot, "scala_udf")

  val dotProductInfo = new ExpressionInfo(
    classOf[DotProduct].getCanonicalName, "dot_product")
}

/** Session-creation-time injection for spark-submit users:
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("dot_product"),
      GraftFunctions.dotProductInfo,
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_product expects 2 arguments, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }))
}
