package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the ANALYZE/summary surface an engine needs before
  * planning work on an unknown table: per column, row count, null count,
  * exact distinct count, and min/max (stringified for a uniform schema).
  *
  * ONE pass over the data: all per-column aggregates run in a single
  * aggregation (count-distincts plan as one Expand ×k — k row copies,
  * each carrying one column, all partial/map-side combinable), then the
  * 1-row wide result pivots driver-free into one row per column. At
  * 100 TB this is the profile you can actually afford: a single scan, no
  * per-column jobs, no driver collection of data values.
  *
  * Numeric min/max stringify AFTER aggregation (min of the value, not of
  * its string form — "9" > "10" lexicographically). Callers profiling
  * doubles should cast to DECIMAL first for engine-portable rendering.
  */
object Profile {
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    wide.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_s"),
        col(s"_max_$c").as("max_s"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Pre-join skew report: the top-k join keys by their JOIN OUTPUT
    * contribution (n_left × n_right) plus each key's share of the total
    * estimated output — the number that decides whether a join needs
    * salting/AQE skew handling BEFORE burning a cluster on it. A key
    * holding >1% of a 100 TB join's output is the straggler task.
    *
    * Cost: one map-combinable count per side (rows never cross the
    * wire, only (key, count)), a full-outer join of the two count
    * tables (each ≤ |distinct keys|), one tiny total, and a
    * TakeOrdered top-k — nothing here scans the fact tables twice.
    * Ties on out_rows break by key, so the report is deterministic.
    */
  def joinSkew(left: DataFrame, right: DataFrame, key: String,
      k: Int = 20): DataFrame = {
    val lc = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    val prod = lc.join(rc, Seq(key), "full_outer")
      .select(col(key),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("out_rows", col("n_left") * col("n_right"))
    val total = prod.agg(sum(col("out_rows")).as("_total"))
    prod.crossJoin(broadcast(total))
      .withColumn("out_share",
        col("out_rows").cast("double") / col("_total").cast("double"))
      .drop("_total")
      .orderBy(col("out_rows").desc, col(key))
      .limit(k)
  }
}
