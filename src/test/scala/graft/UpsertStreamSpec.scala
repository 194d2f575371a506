package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.UpsertStream

/** Streaming MERGE: a file stream of I/U/D change batches maintained
  * into a compacted snapshot, applied batch-by-batch. */
class UpsertStreamSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("sequential micro-batch MERGE equals one global changeset apply") {
    val land = Files.createTempDirectory("upsert_land")
    val snap = Files.createTempDirectory("upsert_snap").toString + "/table"
    val ckpt = Files.createTempDirectory("upsert_ckpt").toString
    // batch 0: three inserts
    val b0 = Seq(
      (1L, t(1), "a0", 1.0, 100L, "I"),
      (2L, t(1), "b0", 2.0, 101L, "I"),
      (3L, t(1), "c0", 3.0, 102L, "I"))
    // batch 1: update k1, delete k2, insert k4; k3 deleted THEN revived
    // within the batch (compaction must keep only the final U)
    val b1 = Seq(
      (1L, t(2), "a1", 10.0, 200L, "U"),
      (2L, t(2), "b1", 0.0, 201L, "D"),
      (4L, t(2), "d0", 4.0, 202L, "I"),
      (3L, t(2), "c1", 0.0, 203L, "D"),
      (3L, t(3), "c2", 30.0, 204L, "U"))
    val cols = Seq("k", "ts", "tag", "v", "seq", "op")
    graft.sources.ParquetSlices.writeSingleFile(
      b0.toDF(cols: _*), land.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      b1.toDF(cols: _*), land.resolve("b1.parquet"))
    // the file source orders pending files by modification time; pin the
    // times so b0 provably precedes b1 even on coarse-mtime filesystems
    java.nio.file.Files.setLastModifiedTime(land.resolve("b0.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(land.resolve("b1.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000100000L))
    val schema = b0.toDF(cols: _*).schema
    val us = new UpsertStream(spark, land.toString, snap, ckpt,
      schema, "k", "ts", "seq", "op", maxFilesPerTrigger = 1)
    val q = us.start()
    q.processAllAvailable(); q.stop()
    val got = us.readSnapshot().collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("tag"),
        r.getAs[Double]("v")))).toMap
    assert(got == Map(1L -> (("a1", 10.0)), 3L -> (("c2", 30.0)),
      4L -> (("d0", 4.0))), s"snapshot: $got")
    // sequential application must equal ONE global changeset apply
    val all = (b0 ++ b1).toDF(cols: _*)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        schema.fields.filterNot(_.name == "op")))
    val global = graft.pipeline.Cdc
      .applyChangeset(empty, all, "k", "ts", "seq", "op")
      .collect().map(r => r.getLong(0) -> ((r.getAs[String]("tag"),
        r.getAs[Double]("v")))).toMap
    assert(got == global, "stream-of-batches MERGE diverged from global apply")
  }
}
