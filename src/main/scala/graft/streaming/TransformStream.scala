package graft.streaming

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery
import graft.model.Model
import graft.ops.TransformOp

/** The streaming Transform leg — the reference's change-feed-driven
  * micro-batch processor (EtlProcess.cs:181-209, SURVEY.md §3.2) as
  * Structured Streaming over the Parquet landing zone:
  *
  *  - source: file stream over `landingDir`; `maxFilesPerTrigger`
  *    reproduces the `MaxItemsPerInvocation=10` backpressure knob
  *    (EtlProcess.cs:186).
  *  - checkpointing: Spark's `checkpointLocation` replaces the
  *    `transformsLease` lease container (SURVEY.md §1.4).
  *  - P4: ONE batch GUID per micro-batch, minted driver-side inside
  *    `foreachBatch` (`lit(UUID.randomUUID)`) — per-row `uuid()` would
  *    silently change semantics (SURVEY.md §7.4.1).
  *  - P5: the reference's arrival-order counter is change-feed order,
  *    which is not reproducible; we define the deterministic order
  *    `orderBy(id)` within the batch and document the deviation
  *    (SURVEY.md §7.4.2). The unpartitioned window is safe because a
  *    micro-batch is bounded by the backpressure knob; at cluster scale
  *    the seq would be per-source-partition, matching the reference's
  *    per-Cosmos-partition ordering guarantee.
  *  - idempotent replay (§7.4.8): each micro-batch overwrites its own
  *    `batch=<epochId>` subdirectory; epochId is stable across retries,
  *    so at-least-once redelivery converges to exactly-once output.
  */
final class TransformStream(
    spark: SparkSession,
    landingDir: String,
    outDir: String,
    checkpointDir: String,
    preferredLocations: String,
    maxFilesPerTrigger: Int = 1,
    frozenNow: Option[String] = None,
    trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
    sourceOverride: Option[DataFrame] = None) {

  /** `trigger` mirrors the reference's timer cadence (cron `0 *&#47;2 * * * *`,
    * EtlProcess.cs:23): pass `Trigger.ProcessingTime("2 minutes")` for the
    * production shape; tests/demos omit it and drain with
    * `processAllAvailable()`.
    *
    * `sourceOverride`: any streaming DataFrame in the SampleItem schema
    * replaces the landing-zone file stream — the seam where a
    * store-native change feed plugs in (`spark.readStream
    * .format("http-feed")...`, see graft.sources.v2.HttpFeedStream);
    * everything downstream (per-batch GUID, seq, idempotent per-epoch
    * overwrite) is source-agnostic. */
  def start(): StreamingQuery = {
    val src = sourceOverride.getOrElse(spark.readStream
      .schema(Model.sampleItemSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(landingDir))

    val writer0 = src.writeStream
      .option("checkpointLocation", checkpointDir)
    val writer = trigger.fold(writer0)(writer0.trigger)
    writer
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // persist: BOTH actions below (emptiness probe + write) would
        // otherwise re-execute the micro-batch source scan — double I/O
        // per trigger, and the progress metrics (numInputRows, which
        // StreamingRunAudit reports) would double-count the batch
        val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (!pinned.isEmpty) {
            val batchGuid = UUID.randomUUID().toString // P4: driver-side, per batch
            // single-partition window: one maxFilesPerTrigger-bounded
            // micro-batch, by design
            val seqW = Window.orderBy(col("id"))
            val withSeq = pinned.withColumn("seq", row_number().over(seqW))
            val now = frozenNow.map(s => to_timestamp(lit(s)))
              .getOrElse(current_timestamp())
            val out = TransformOp.transform(
              withSeq, lit(batchGuid), col("seq"), preferredLocations, now)
            out.write.mode(SaveMode.Overwrite)
              .parquet(s"$outDir/batch=$epochId")
          }
        } finally { pinned.unpersist(); () }
      }
      .start()
  }

  /** Read back the transformed table across all micro-batch directories.
    * Plain directory read: partition discovery turns `batch=N` subdirs into
    * a `batch` column. (No glob — Spark 4.1's FileStreamSink.hasMetadata
    * throws FileNotFoundException on literal glob paths.)
    */
  def readTransformed(): DataFrame =
    try spark.read.parquet(outDir)
    catch {
      // zero micro-batches ever committed → empty typed result, not a
      // crash. The schema must include the `batch` partition column that
      // discovery adds on every NON-empty read, or a caller selecting it
      // fails exactly (and only) in the empty case.
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          Model.transformedItemSchema
            .add("batch", org.apache.spark.sql.types.IntegerType))
    }
}
