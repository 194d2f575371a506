package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming MERGE: maintain a key-compacted snapshot table from a
  * STREAM of I/U/D changes — the Structured-Streaming-into-MERGE
  * pattern every lakehouse upsert pipeline runs. Each micro-batch
  * applies [[graft.pipeline.Cdc.applyChangeset]] against the on-disk
  * snapshot and atomically replaces it (write-aside + directory swap:
  * the new snapshot is fully materialized while the old one is still
  * the readable truth, then a rename flips them).
  *
  * Delivery semantics: the file source + checkpoint give at-least-once
  * batch delivery; MERGE replay is idempotent (insert-on-existing
  * degrades to update, delete-on-missing is a no-op — spec'd in
  * CorpusSpec), so a redelivered batch converges to the same snapshot.
  * Sequential per-batch application preserves last-writer-wins per key,
  * so the final snapshot equals one global changeset application.
  *
  * Scale shape: per trigger, ONE key-equi-join of the snapshot against
  * the (small, compacted) batch — with the snapshot bucketed by key the
  * join co-locates; the full-directory rewrite is the local-FS stand-in
  * for a transactional table format's MERGE commit, and is the one
  * piece a real deployment swaps for Delta/Iceberg.
  */
final class UpsertStream(
    spark: SparkSession,
    landingDir: String,
    snapshotDir: String,
    checkpointDir: String,
    schema: StructType,
    key: String,
    ts: String,
    tiebreak: String,
    opCol: String,
    maxFilesPerTrigger: Int = 1) {

  private def snapshotOrEmpty(): DataFrame = {
    val payloadSchema = StructType(schema.fields.filterNot(_.name == opCol))
    try spark.read.schema(payloadSchema).parquet(snapshotDir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payloadSchema)
    }
  }

  def start(): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val next = graft.pipeline.Cdc.applyChangeset(
            snapshotOrEmpty(), batch, key, ts, tiebreak, opCol)
          // write-aside then swap: `next` lazily READS the current
          // snapshot, so the old directory must survive until the new
          // one is fully on disk
          val tmp = snapshotDir + ".next"
          next.write.mode(SaveMode.Overwrite).parquet(tmp)
          val fs = new java.io.File(snapshotDir)
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(fs)
          require(new java.io.File(tmp).renameTo(fs),
            s"snapshot swap failed: $tmp -> $snapshotDir")
        }
      }
      .start()

  /** The current snapshot (empty-typed before the first commit). */
  def readSnapshot(): DataFrame = snapshotOrEmpty()
}
