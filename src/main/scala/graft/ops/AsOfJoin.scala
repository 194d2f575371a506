package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-match) left join — the time-series join Spark has no
  * built-in operator for: each left row picks up the right row with the
  * LARGEST rightTime <= leftTime within the same key (inclusive, matching
  * DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`).
  *
  * Technique (SURVEY.md §"custom operators" preference (a) — compose
  * built-ins): tag both sides, union, and run `last(_, ignoreNulls)` over
  * a (key)-partitioned (time, side)-ordered running window; right rows
  * sort BEFORE left rows at equal time, which gives the inclusive bound.
  *
  * 100 TB shape: ONE shuffle on the key + one sort — same cost as a
  * sort-merge join; no range cross-product, no per-row probe. The
  * composition gets it from Catalyst built-ins (and AQE/codegen) for
  * free; [[asOfExec]] plans the same semantics through the custom
  * whole-operator path ([[graft.plans.AsOfJoinExec]] — preference (c)),
  * which skips the union row-blowup and the window buffer entirely.
  */
object AsOfJoin {

  /** @param rightValues (rightColumn, outputName) pairs to carry onto
    *                    matched left rows (null when no match). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[(String, String)]): DataFrame = {

    val leftCols = left.columns.toSeq
    val rStruct = struct(rightValues.map { case (c, _) => col(c) }: _*)
    val rStructType = right.select(rStruct.as("_rv")).schema.head.dataType
    val lStruct = struct(leftCols.map(col): _*)
    val lStructType = left.select(lStruct.as("_lv")).schema.head.dataType

    val lPrep = left.select(
      col(key).as("_k"), col(leftTime).as("_t"), lit(1).as("_side"),
      lStruct.as("_lv"), lit(null).cast(rStructType).as("_rv"))
    // a null right time must match NOTHING (ASOF `l.t >= r.t` is never
    // true for null) — unfiltered it would sort first (nulls-first asc)
    // and become a universal match candidate for the whole partition
    val rPrep = right.filter(col(rightTime).isNotNull).select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      lit(null).cast(lStructType).as("_lv"), rStruct.as("_rv"))

    // `_rv` as the final sort key makes the pick deterministic when several
    // right rows share the same (key, rightTime): the running `last` always
    // sees them in the same order regardless of partitioning/run (struct
    // ordering is lexicographic over the carried values). Left rows have a
    // null `_rv` — constant, so their relative order is unaffected.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lPrep.unionByName(rPrep)
      .withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out = leftCols.map(c => col(s"_lv.$c").as(c)) ++
      rightValues.zipWithIndex.map { case ((src, outName), i) =>
        col("_match").getField(src).as(outName)
      }
    matched.select(out: _*)
  }

  /** Same as-of semantics through the WHOLE-OPERATOR path (preference
    * (c)): plans [[graft.plans.AsOfJoinPlan]], which
    * [[graft.plans.AsOfJoinStrategy]] lowers to the sort-merge
    * [[graft.plans.AsOfJoinExec]] — one shuffle per side, one streaming
    * merge pass with O(1) state. Requires the strategy to be registered
    * (`GraftFunctions.register(spark)` or
    * `spark.sql.extensions=graft.GraftExtensions`). */
  def asOfExec(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan = GraftColumnBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"asOfExec: column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    // As-of over two slices of the SAME table is the common case (events →
    // purchases vs views), so left and right share exprIds. The analyzer's
    // DeduplicateRelations would regenerate the right subtree's ids but
    // cannot know which side OUR key/time/value expressions meant (the
    // classic self-join ambiguity) — so mint unambiguous right-side ids
    // ourselves with an alias projection before building the node.
    val rAliases = rPlan.output.map(a => Alias(a, a.name)())
    val rFresh = Project(rAliases, rPlan)
    def rAttr(n: String) = rAliases.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"asOfExec: column '$n' not in [${rAliases.map(_.name).mkString(", ")}]"))
      .toAttribute
    val rvals = rightValues.map { case (src, _) => rAttr(src) }
    val valAttrs = rightValues.map { case (src, outName) =>
      AttributeReference(outName, rAttr(src).dataType, nullable = true)()
    }
    GraftColumnBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(
        attr(lPlan, key), rAttr(key),
        attr(lPlan, leftTime), rAttr(rightTime),
        rvals, valAttrs, lPlan, rFresh))
  }
}
