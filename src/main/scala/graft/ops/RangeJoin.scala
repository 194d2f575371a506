package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded time-range self/two-table join.
  *
  * A naive `a.ts BETWEEN b.ts - w AND b.ts + w` theta join plans as a
  * broadcast-nested-loop (O(n·m) compares) — unusable at scale. The
  * scalable Spark shape: quantize time into `window`-sized buckets,
  * explode ONE side into its bucket and the two adjacent buckets, then
  * EQUI-join on (key, bucket) and post-filter the exact predicate. Every
  * candidate pair shares a bucket, so the join is a hash join with
  * ≤ 3× row amplification on one side — the standard interval-join
  * technique (e.g. Flink's interval join uses the same idea).
  */
object RangeJoin {

  /** Pairs of rows from `left` and `right` with equal `key` whose `time`
    * values are within `windowSeconds` of each other (|lt − rt| ≤ w).
    *
    * @param selfJoin when true (left and right are the SAME dataset),
    *                 emit each unordered pair once via `i < j`; when
    *                 false, keep every (left, right) match — an ordered
    *                 i<j filter would silently drop half the pairs of a
    *                 genuine two-table join. */
  def timeWindowPairs(left: DataFrame, right: DataFrame, key: String,
      time: String, idCol: String, windowSeconds: Long,
      selfJoin: Boolean = true): DataFrame = {
    val w = windowSeconds
    val lb = (unix_micros(col(time)) / (w * 1000000L)).cast("long")
    val l = left.select(col(key).as("k"), col(idCol).as("i"),
      col(time).as("lt"), lb.as("b"))
    val r = right.select(col(key).as("k"), col(idCol).as("j"),
        col(time).as("rt"),
        explode(array((-1 to 1).map(d => lb + d): _*)).as("b"))
    val pairPred = if (selfJoin) col("i") < col("j") else lit(true)
    l.join(r, Seq("k", "b"))
      .filter(pairPred &&
        abs(unix_micros(col("lt")) - unix_micros(col("rt"))) <= w * 1000000L)
      .select(col("k"), col("i"), col("j"), col("lt"), col("rt"))
    // no trailing distinct: the three exploded buckets are pairwise
    // distinct and the left row carries exactly one bucket, so each
    // (left, right) pair joins at most once — a dedup here would only
    // add a full shuffle of the widest relation and would silently
    // collapse genuine duplicate input matches
  }
}
