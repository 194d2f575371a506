package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic SampleItem source — the reference's HTTP generator endpoint
  * re-expressed as a distributed `spark.range` projection
  * (EtlProcess.cs:212-243, SURVEY.md §2.10 G1-G4).
  *
  * Scale note: `spark.range` parallelizes across executors with no data
  * movement; every column is a codegen'd expression, so generating 10^9
  * rows is scan-speed work. The reference loops on one thread.
  */
object Generator {

  /** G2-G4. `frozenNow`/`deterministicIds` give the seeded test mode
    * required for oracle hashing (SURVEY.md §7.4.3); production callers
    * omit them and get the reference's nondeterminism (fresh UUIDs,
    * wall-clock timestamps — EtlProcess.cs:230-231).
    *
    * Keeps the reference's `Name` format string `yyyyMMhhmm` verbatim —
    * no day-of-month, 12-hour `hh` (EtlProcess.cs:234; quirk documented
    * in SURVEY.md §7.4.4) — and the `Partition_{A,B,C}` assignment via
    * `(char)(65 + i % 3)` (EtlProcess.cs:236).
    *
    * The output deliberately INCLUDES the generator ordinal `i` (not part
    * of the SampleItem schema): deterministic-mode consumers (Parity's
    * oracle queries) order and inject by it. Pipeline callers drop it
    * before landing (`.drop("i")`).
    */
  def sampleItems(
      spark: SparkSession,
      count: Long,
      frozenNow: Option[String] = None,
      deterministicIds: Boolean = false): DataFrame = {
    val now: Column = frozenNow.map(s => to_timestamp(lit(s)))
      .getOrElse(current_timestamp())
    val id: Column = if (deterministicIds) col("i").cast("string") else expr("uuid()")
    spark.range(1, count + 1).toDF("i").select(
      id.as("id"),
      date_format(now, "yyyy-MM-dd HH:mm:ss").as("Date"),
      format_string("Sample item #%d of %d generated", col("i"), lit(count)).as("Desc"),
      lit("true").as("Done"),
      concat(lit("Item_"), date_format(now, "yyyyMMhhmm"), lit("_"), col("i")).as("Name"),
      lit("Additional field info").as("Pr"),
      concat(lit("Partition_"), expr("char(65 + CAST(i % 3 AS INT))"))
        .as("LogicalPartition"),
      col("i"))
  }
}
