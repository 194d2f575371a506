package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CdcBoundaries, DotProduct, IntDotProduct, Winnow}

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT dot_product(a.embedding, b.embedding) ...")` and
  * `winnow(text[, k, window])` work alongside the Column API.
  */
object GraftFunctions {
  private[graft] def buildDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"dot_product expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  private def intArg(fn: String, e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }

  private[graft] def buildIntDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"int_dot_product expects 2 arguments, got ${exprs.length}")
    IntDotProduct(exprs.head, exprs(1))
  }

  private[graft] def buildCdc(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(text) => CdcBoundaries(text, k = 8, divisor = 64)
    case Seq(text, k, d) =>
      CdcBoundaries(text, intArg("cdc_boundaries", k, "k"),
        intArg("cdc_boundaries", d, "divisor"))
    case _ => throw new IllegalArgumentException(
      s"cdc_boundaries expects (text) or (text, k, divisor), got ${exprs.length} arguments")
  }

  private[graft] def buildWinnow(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(text) => Winnow(text, k = 8, window = 6)
    case Seq(text, k, w) =>
      Winnow(text, intArg("winnow", k, "k"), intArg("winnow", w, "window"))
    case _ => throw new IllegalArgumentException(
      s"winnow expects (text) or (text, k, window), got ${exprs.length} arguments")
  }

  /** Register into an existing session (temp functions + optimizer rule).
    * Idempotent: a name already present is left alone — re-registration
    * would be a no-op behaviorally (the builders are stable objects) but
    * SimpleFunctionRegistry logs a "replaced a previously registered
    * function" warning per name, and multi-query mains (Bench/Verify)
    * call this per session set-up path. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    put("dot_product", buildDot)
    put("int_dot_product", buildIntDot)
    put("winnow", buildWinnow)
    put("cdc_boundaries", buildCdc)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BoundLevenshtein)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BoundLevenshtein
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
  }

  val dotProductInfo = new ExpressionInfo(
    classOf[DotProduct].getCanonicalName, "dot_product")
  val intDotProductInfo = new ExpressionInfo(
    classOf[IntDotProduct].getCanonicalName, "int_dot_product")
  val winnowInfo = new ExpressionInfo(
    classOf[Winnow].getCanonicalName, "winnow")
  val cdcInfo = new ExpressionInfo(
    classOf[CdcBoundaries].getCanonicalName, "cdc_boundaries")
}

/** Session-creation-time injection for spark-submit users:
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_product"),
      GraftFunctions.dotProductInfo,
      (exprs: Seq[Expression]) => GraftFunctions.buildDot(exprs)))
    ext.injectFunction((FunctionIdentifier("int_dot_product"),
      GraftFunctions.intDotProductInfo,
      (exprs: Seq[Expression]) => GraftFunctions.buildIntDot(exprs)))
    ext.injectFunction((FunctionIdentifier("winnow"),
      GraftFunctions.winnowInfo,
      (exprs: Seq[Expression]) => GraftFunctions.buildWinnow(exprs)))
    ext.injectFunction((FunctionIdentifier("cdc_boundaries"),
      GraftFunctions.cdcInfo,
      (exprs: Seq[Expression]) => GraftFunctions.buildCdc(exprs)))
    ext.injectOptimizerRule(_ => graft.plans.BoundLevenshtein)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
