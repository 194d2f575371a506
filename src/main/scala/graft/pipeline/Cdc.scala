package graft.pipeline

import org.apache.spark.sql.DataFrame
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
