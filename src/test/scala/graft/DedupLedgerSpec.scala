package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.{ExtractLoadJob, RunAudit, RunLock}
import graft.sources.Generator
import graft.streaming.EventStreams

/** Opt-in dedup paths: content-ledger on the batch leg (SURVEY.md §7.4.7)
  * and watermark-bounded dedup on the stream.
  */
class DedupLedgerSpec extends SparkSpec {

  test("dedupeByContent: re-running the same extract lands nothing new") {
    val base = Files.createTempDirectory("ledger")
    // frozen generator → identical content each run (ids regenerate at landing)
    def src() = Some(Generator.sampleItems(spark, 40,
      Some("2026-01-01 00:00:00"), deterministicIds = true).drop("i"))
    val landing = base.resolve("landing").toString
    val audit = new RunAudit(base.resolve("audit").toString)
    def job() = new ExtractLoadJob(spark, () => src(), landing,
      new RunLock(base.resolve(s"lock${System.nanoTime}")), audit, "w",
      dedupeByContent = true)
    job().runOnce()
    job().runOnce()
    assert(spark.read.parquet(landing).count() == 40,
      "second identical run must land zero rows")
    val msgs = audit.read(spark).collect().map(_.AdditionlInfo).sorted
    assert(msgs.exists(_.startsWith("Successful extracted and saved 40")))
    assert(msgs.exists(_.startsWith("Successful extracted and saved 0")))
  }

  test("without dedupeByContent the reference's duplication is preserved") {
    val base = Files.createTempDirectory("noledger")
    def src() = Some(Generator.sampleItems(spark, 15,
      Some("2026-01-01 00:00:00"), deterministicIds = true).drop("i"))
    val landing = base.resolve("landing").toString
    def job() = new ExtractLoadJob(spark, () => src(), landing,
      new RunLock(base.resolve(s"lock${System.nanoTime}")),
      new RunAudit(base.resolve("audit").toString), "w")
    job().runOnce(); job().runOnce()
    assert(spark.read.parquet(landing).count() == 30,
      "parity mode must keep the reference's re-landing behavior")
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    val dir = Files.createTempDirectory("sdedup")
    val fixture = Tables.events(spark, sf).limit(200)
    graft.sources.ParquetSlices.writeSingleFile(fixture, dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(fixture, dir.resolve("b1.parquet")) // same 200 events twice
    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = EventStreams.dedupedEvents(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup")
    assert(got.count() == 200, s"expected 200 unique events, got ${got.count()}")
    assert(got.select("event_id").distinct().count() == 200)
  }
}
