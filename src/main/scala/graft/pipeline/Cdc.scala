package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shaping: turn an append-only change log (the
  * stream the reference's change feed emits — SURVEY.md §0) into the two
  * standard consumable forms:
  *
  *  - [[latestSnapshot]]: current state, one row per key — the "MERGE
  *    INTO current" view.
  *  - [[scd2]]: full slowly-changing-dimension type-2 history, each
  *    version carrying [valid_from, valid_to) and an is_current flag.
  *
  * Both are ONE window pass partitioned by the business key: at 100 TB
  * the change log shuffles once on the key (well-distributed), each
  * partition streams sorted — no self-joins, no driver state. Ordering
  * within a key is (ts, tiebreak) so concurrent same-timestamp changes
  * resolve deterministically on any cluster.
  */
object Cdc {

  /** Latest row per `key` by (ts, tiebreak) — change-log compaction.
    * Null timestamps sort LAST explicitly (Spark's and DuckDB's defaults
    * differ, and a null-ts change must not masquerade as newest). */
  def latestSnapshot(changes: DataFrame, key: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc_nulls_last, col(tiebreak).desc_nulls_last)
    changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Incremental aggregate maintenance — the materialized-view refresh
    * primitive: merge a small delta batch into an existing per-key
    * aggregate WITHOUT rescanning history. `base` holds (key, n, total);
    * the delta is aggregated to the same shape and full-outer-merged with
    * coalesced sums, so keys new in the delta appear and untouched keys
    * pass through.
    *
    * 100 TB shape: the base never rescans — cost is ONE aggregation of
    * the delta (tiny) plus one join keyed by the group key; with the base
    * bucketed/partitioned by key the join is co-located and shuffle-free
    * on the big side. sum/count are the self-maintainable aggregates;
    * min/max stay refreshable only for inserts (deletes force a rescan —
    * the classic view-maintenance asymmetry, worth knowing at 100 TB).
    * Decimal sums keep the merge bit-identical to a from-scratch
    * recompute at any parallelism. */
  def incrementalAgg(base: DataFrame, delta: DataFrame, key: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dAgg = delta.groupBy(col(key))
      .agg(count(lit(1)).as("_d_n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("_d_total"))
    base.join(dAgg, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_d_n"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(java.math.BigDecimal.ZERO)
            .cast(DecimalType(18, 2)))
          + coalesce(col("_d_total"), lit(java.math.BigDecimal.ZERO)
            .cast(DecimalType(18, 2)))).as("total"))
  }

  /** Aggregate a change-log slice to the (key, n, total) shape
    * [[incrementalAgg]] maintains. */
  def aggShape(df: DataFrame, key: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("total"))
  }

  /** TIME TRAVEL: reconstruct the table state as of `asOf` from the
    * append-only changelog — the latest row per key among changes at or
    * before the cut; keys born later are absent. Equivalent to picking,
    * per key, the [[scd2]] version whose [valid_from, valid_to) interval
    * covers `asOf` (spec-asserted — the two temporal models must agree).
    * The ts filter pushes to the scan, so a time-travel read touches
    * only the history prefix. */
  def snapshotAsOf(changes: DataFrame, key: String, ts: String,
      tiebreak: String, asOf: Column): DataFrame =
    latestSnapshot(changes.filter(col(ts) <= asOf), key, ts, tiebreak)

  /** MERGE-INTO semantics: apply an I/U/D changeset to a base snapshot.
    * The changeset is compacted to the LAST op per key first
    * ([[latestSnapshot]] — a key touched many times in one batch applies
    * only its final state, the Delta/Iceberg MERGE contract), then one
    * full-outer join on the key settles every row: final op D drops the
    * key, I/U replace the whole row (insert-on-existing degrades to
    * update, update-on-missing to insert — idempotent replay), untouched
    * base rows pass through.
    *
    * 100 TB shape: the base is scanned ONCE and only joined on the key;
    * with the base bucketed by key the join co-locates and the shuffle
    * carries just the (small) compacted changeset. `payload` names the
    * replaceable columns — everything except key, ts, and op. */
  def applyChangeset(base: DataFrame, changes: DataFrame, key: String,
      ts: String, tiebreak: String, opCol: String): DataFrame = {
    val last = latestSnapshot(changes, key, ts, tiebreak)
    val payload = base.columns.filterNot(_ == key).toSeq
    val chg = last.select(
      (col(key) +: col(opCol).as("_chg_op") +:
        payload.map(c => col(c).as(s"_chg_$c"))): _*)
    base.join(chg, Seq(key), "full_outer")
      .filter(coalesce(col("_chg_op"), lit("")) =!= "D")
      .select((col(key) +: payload.map(c =>
        when(col("_chg_op").isNotNull, col(s"_chg_$c"))
          .otherwise(col(c)).as(c))): _*)
  }

  /** SCD-2 history: every change becomes a version valid from its own
    * timestamp until the next change of the same key. `is_current` means
    * "no successor ROW exists" — detected via a lead over a constant, so
    * a successor with a null timestamp (or even a null tiebreak) still
    * supersedes its predecessor; testing any successor COLUMN for null
    * would wrongly mark both rows current. */
  def scd2(changes: DataFrame, key: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc_nulls_last, col(tiebreak).asc_nulls_last)
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current",
        when(lead(lit(1), 1).over(w).isNull, 1).otherwise(0))
  }
}
