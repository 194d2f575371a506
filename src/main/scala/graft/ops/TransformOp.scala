package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core "T": `SampleItem → TransformedItem` projection
  * (EtlProcess.cs:245-260, SURVEY.md §2.2 P1-P7) as pure column
  * expressions — no UDF, fully codegen'd, so it runs at scan speed on any
  * number of executors.
  */
object TransformOp {

  /** P2: `String.IsNullOrWhiteSpace(x) ? default : x` (EtlProcess.cs:251-252). */
  // rlike ^\s*$, not trim() === "": the reference's IsNullOrWhiteSpace
  // treats tabs/newlines as blank and Spark's trim only strips spaces
  def blankCoalesce(c: Column, default: Column): Column =
    when(c.isNull || c.rlike("^\\s*$"), default).otherwise(c)

  /** P1. `batchId` is minted once per micro-batch on the DRIVER (P4 —
    * `lit(UUID.randomUUID)`, never per-row `uuid()`); `seq` is the caller's
    * deterministic stand-in for the reference's arrival-order counter (P5;
    * see [[graft.streaming.TransformStream]]). `now` is injectable for the
    * seeded oracle mode (SURVEY.md §7.4.3).
    */
  def transform(
      src: DataFrame,
      batchId: Column,
      seq: Column,
      preferredLocations: String,
      now: Column = current_timestamp()): DataFrame = {
    // P6: Env("PreferredLocations")?.Split(",")[0] (EtlProcess.cs:257)
    val firstLocation = preferredLocations.split(",").headOption.orNull
    src.select(
      col("id"),
      col("Date").as("SourceDate"),
      now.as("TransformTimeStamp"),
      blankCoalesce(col("Desc"),
        format_string("Empty Description in source for item %s", col("id")))
        .as("Description"),
      col("Done"),
      blankCoalesce(col("Name"),
        format_string("Empty Name in source for item %s", col("id")))
        .as("Name"),
      col("Pr"),
      format_string("Data added from transform function [%s]", seq)
        .as("AdditionalData"),
      batchId.as("TransformBatch"),
      lit(firstLocation).as("UpdateLocation"))
  }
}
