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
  * sort-merge join; no range cross-product, no per-row probe. This is the
  * plan a custom AsOfJoinExec would produce; the composition gets it from
  * Catalyst built-ins (and AQE/codegen) for free.
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
}
