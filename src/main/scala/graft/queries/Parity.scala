package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Generator
import graft.ops.TransformOp

/** Reference-parity queries, oracle-checked in the seeded deterministic
  * mode (SURVEY.md §7.4.3): frozen clock, sequential ids. The DuckDB
  * oracles are table-less (built from `range()`), so the full generator
  * and Transform semantics — including the blank-coalesce defaults P2 and
  * the `yyyyMMhhmm` Name quirk — are hash-verified end-to-end.
  */
object Parity {
  private val N = 1000L
  private val FrozenNow = "2026-01-01 00:00:00"
  private val PreferredLocations = "East US,West US"

  /** Generator output with null/blank Desc/Name injected to exercise the
    * P2 blank-coalesce paths (EtlProcess.cs:251-252). Injection rules are
    * mirrored verbatim in the oracle SQL.
    */
  private[queries] def transformInput(s: SparkSession): DataFrame = {
    val base = Generator.sampleItems(s, N, Some(FrozenNow), deterministicIds = true)
    base
      .withColumn("Desc",
        when(col("i") % 10 === 0, lit(""))
          .when(col("i") % 10 === 5, lit("   "))
          .when(col("i") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("Desc")))
      .withColumn("Name",
        when(col("i") % 11 === 0, lit(""))
          .when(col("i") % 13 === 0, lit(null).cast("string"))
          .otherwise(col("Name")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_generate" -> ((s, _) => {
      Generator.sampleItems(s, N, Some(FrozenNow), deterministicIds = true)
        .orderBy(col("i")).drop("i")
    }),

    "ref_transform" -> ((s, _) => {
      val withSeq = transformInput(s)
        .withColumn("seq", row_number().over(Window.orderBy(col("i"))))
      TransformOp.transform(withSeq, lit("batch-0"), col("seq"),
          PreferredLocations, now = to_timestamp(lit(FrozenNow)))
        .orderBy(col("id").cast("int"))
    })
  )

  // DuckDB note: Desc/Date/Name are keywords/type names → quoted aliases.
  // Name format yyyyMMhhmm of 2026-01-01 00:00 = 2026 01 12(hh of midnight) 00.
  val oracle: Map[String, String] = Map(
    "ref_generate" ->
      s"""SELECT CAST(i AS VARCHAR) AS id,
         |'2026-01-01 00:00:00' AS "Date",
         |'Sample item #' || i || ' of $N generated' AS "Desc",
         |'true' AS "Done",
         |'Item_2026011200_' || i AS "Name",
         |'Additional field info' AS "Pr",
         |'Partition_' || chr(65 + CAST(i % 3 AS INT)) AS "LogicalPartition"
         |FROM (SELECT range AS i FROM range(1, ${N + 1})) ORDER BY i""".stripMargin,

    "ref_transform" ->
      s"""WITH src AS (
         |  SELECT CAST(i AS VARCHAR) AS id, i,
         |    CASE WHEN i % 10 = 0 THEN ''
         |         WHEN i % 10 = 5 THEN '   '
         |         WHEN i % 7 = 0 THEN NULL
         |         ELSE 'Sample item #' || i || ' of $N generated' END AS d,
         |    CASE WHEN i % 11 = 0 THEN ''
         |         WHEN i % 13 = 0 THEN NULL
         |         ELSE 'Item_2026011200_' || i END AS nm
         |  FROM (SELECT range AS i FROM range(1, ${N + 1})))
         |SELECT id,
         |'2026-01-01 00:00:00' AS "SourceDate",
         |TIMESTAMP '2026-01-01 00:00:00' AS "TransformTimeStamp",
         |CASE WHEN d IS NULL OR regexp_matches(d, '^\\s*$$')
         |     THEN 'Empty Description in source for item ' || id ELSE d END AS "Description",
         |'true' AS "Done",
         |CASE WHEN nm IS NULL OR regexp_matches(nm, '^\\s*$$')
         |     THEN 'Empty Name in source for item ' || id ELSE nm END AS "Name",
         |'Additional field info' AS "Pr",
         |'Data added from transform function [' || i || ']' AS "AdditionalData",
         |'batch-0' AS "TransformBatch",
         |'East US' AS "UpdateLocation"
         |FROM src ORDER BY i""".stripMargin
  )
}
