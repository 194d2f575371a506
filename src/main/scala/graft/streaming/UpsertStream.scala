package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming MERGE: maintain a key-compacted snapshot table from a
  * STREAM of I/U/D changes — the Structured-Streaming-into-MERGE
  * pattern every lakehouse upsert pipeline runs. Each micro-batch
  * applies [[graft.pipeline.Cdc.applyChangeset]] against the on-disk
  * snapshot and replaces it via write-aside + a two-rename swap
  * (snapshot -> .old, .next -> snapshot): a complete committed state
  * exists on disk at every instant, and reads recover from whichever
  * side is complete after a crash — at most the in-flight batch is
  * lost, and the checkpoint redelivers exactly that batch.
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

  private def payloadSchema =
    StructType(schema.fields.filterNot(_.name == opCol))

  private def tmpDir = snapshotDir + ".next"
  private def oldDir = snapshotDir + ".old"

  /** Crash-safe read: prefer the committed snapshot; after a crash
    * inside the swap window, recover from the COMPLETE side — `.next`
    * if its write finished (parquet `_SUCCESS` marker), else `.old`
    * (the previous committed state). A crash can therefore lose at most
    * the in-flight batch — which the checkpoint redelivers — never
    * previously committed state. (Single writer; readers see the
    * snapshot as of the last completed swap.) */
  private def snapshotOrEmpty(): DataFrame = {
    def ok(d: String) = new java.io.File(d, "_SUCCESS").exists()
    val source =
      if (ok(snapshotDir)) Some(snapshotDir)
      else if (ok(tmpDir)) Some(tmpDir)
      else if (ok(oldDir)) Some(oldDir)
      else None
    source.map(d => spark.read.schema(payloadSchema).parquet(d))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payloadSchema))
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
          import graft.sources.ParquetSlices.deleteRecursively
          // clear debris from a previous crashed swap BEFORE reading:
          // snapshotOrEmpty prefers the committed snapshot, so stale
          // .next/.old must not survive into the next window
          val (snap, tmp, old) = (new java.io.File(snapshotDir),
            new java.io.File(tmpDir), new java.io.File(oldDir))
          val base = snapshotOrEmpty().localCheckpoint(true)
          deleteRecursively(tmp); deleteRecursively(old)
          val next = graft.pipeline.Cdc.applyChangeset(
            base, batch, key, ts, tiebreak, opCol)
          // write-aside, then a two-rename swap: the committed snapshot
          // survives (as .old) until .next is COMPLETE and in place, so
          // a crash at any point leaves a recoverable complete state
          // (see snapshotOrEmpty). `base` is checkpointed above because
          // `next` must not lazily read the directory being renamed.
          next.write.mode(SaveMode.Overwrite).parquet(tmpDir)
          if (snap.exists())
            require(snap.renameTo(old), s"swap: $snapshotDir -> $oldDir")
          require(tmp.renameTo(snap), s"swap: $tmpDir -> $snapshotDir")
          deleteRecursively(old)
        }
      }
      .start()

  /** The current snapshot (empty-typed before the first commit). */
  def readSnapshot(): DataFrame = snapshotOrEmpty()
}
