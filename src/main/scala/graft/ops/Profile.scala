package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — the ANALYZE/summary surface an engine needs before
  * planning work on an unknown table: per column, row count, null count,
  * exact distinct count, and min/max (stringified for a uniform schema).
  *
  * One aggregation LEG per column, unioned. The tempting alternative —
  * all columns in a single agg — plans k exact count-distincts as ONE
  * Expand ×(k+1): every input row is copied k+1 times before the
  * shuffle, so profiling 4 columns shuffles 5× the table's rows
  * (measured 90× DuckDB on the bench). Per-column legs instead read
  * ONLY their own column (columnar pruning keeps total bytes read
  * identical to the wide agg), rewrite as the no-Expand
  * one-distinct plan (partials keyed by value, map-side combinable),
  * and union k one-row results. No per-row multiplication, no driver
  * collection of data values; at 100 TB the k value-keyed shuffles of
  * distinct values are strictly smaller than one 5× row-copy shuffle.
  *
  * Numeric min/max stringify AFTER aggregation (min of the value, not of
  * its string form — "9" > "10" lexicographically). Callers profiling
  * doubles should cast to DECIMAL first for engine-portable rendering.
  *
  * INPUT CONTRACT: `df` should be a (possibly filtered) TABLE SCAN.
  * The bytes-read-identical argument above relies on columnar pruning;
  * a DERIVED frame (a join/aggregation output) would re-execute its
  * whole upstream once per column leg — persist such a frame first, or
  * accept the single-agg Expand form instead. Profiling is an
  * ANALYZE-style pre-planning surface, so scans are the expected input
  * (the in-repo callers all pass scans).
  */
object Profile {
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(count(lit(1)).as("_n"),
          count(col(c)).as("_nn"),
          countDistinct(col(c)).as("_nd"),
          min(col(c)).cast("string").as("_min"),
          max(col(c)).cast("string").as("_max"))
        .select(lit(c).as("col_name"),
          col("_n").as("n_rows"),
          (col("_n") - col("_nn")).as("n_null"),
          col("_nd").as("n_distinct"),
          col("_min").as("min_s"),
          col("_max").as("max_s"))
    }.reduce(_.unionAll(_))
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
