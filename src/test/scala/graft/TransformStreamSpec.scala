package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Generator
import graft.streaming.TransformStream

/** §3.2 streaming-leg semantics: per-batch constant TransformBatch (P4),
  * deterministic in-batch seq (P5), checkpoint restart with no duplicate
  * ids (at-least-once → effectively-once, SURVEY.md §7.4.8).
  */
class TransformStreamSpec extends SparkSpec {

  private def land(dir: String, n: Long, tag: String): Unit =
    Generator.sampleItems(spark, n).drop("i")
      .withColumn("id", concat(lit(tag + "-"), col("id")))
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  test("two micro-batches: constant batch guid within, distinct across; seq is 1..n") {
    val base = Files.createTempDirectory("stream")
    val landing = base.resolve("landing").toString
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString

    land(landing, 7, "a")
    val ts = new TransformStream(spark, landing, out, cp, "East US,West US")
    val q1 = ts.start()
    q1.processAllAvailable(); q1.stop()
    land(landing, 5, "b")
    val q2 = ts.start()
    q2.processAllAvailable(); q2.stop()

    val got = ts.readTransformed()
    assert(got.count() == 12)
    // P4: one TransformBatch guid per micro-batch
    val perBatch = got.groupBy(col("batch"))
      .agg(countDistinct(col("TransformBatch")).as("g"), count(lit(1)).as("n"))
      .collect()
    assert(perBatch.forall(_.getAs[Long]("g") == 1L))
    assert(perBatch.map(_.getAs[Long]("n")).sorted.toSeq == Seq(5L, 7L))
    // distinct guids across batches
    assert(got.select("TransformBatch").distinct().count() == 2)
    // P5: seq embedded in AdditionalData covers 1..n per batch
    val seqs = got.select(
      regexp_extract(col("AdditionalData"), "\\[(\\d+)\\]", 1).cast("int").as("seq"),
      col("batch")).collect().groupBy(_.getAs[Any]("batch"))
    seqs.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("seq")).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // P2 invariant: no null/blank Description or Name ever
    assert(got.filter(col("Description").isNull || trim(col("Description")) === "" ||
      col("Name").isNull || trim(col("Name")) === "").count() == 0)
  }

  test("StreamingRunAudit appends one audit row per committed micro-batch") {
    val base = Files.createTempDirectory("stream-audit")
    val landing = base.resolve("landing").toString
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString
    val audit = new graft.pipeline.RunAudit(base.resolve("audit").toString)
    val listener = new graft.pipeline.StreamingRunAudit(spark, audit, "stream-worker")
    spark.streams.addListener(listener)
    try {
      land(landing, 7, "a")
      land(landing, 5, "b")
      // maxFilesPerTrigger=1 + two landed files -> two non-empty batches
      val q = new TransformStream(spark, landing, out, cp, "East US").start()
      q.processAllAvailable(); q.stop()
      // progress events are async on the listener bus — poll until both
      // batches' rows land (or time out and let the assertion report)
      def tryRead() =
        try audit.read(spark).collect() catch { case _: Exception => Array.empty[graft.model.OrchestrationRun] }
      var waited = 0
      while (waited < 100 && tryRead().length < 2) { Thread.sleep(100); waited += 1 }
      val runs = tryRead()
      assert(runs.length >= 2, s"expected >=2 audit rows, got ${runs.length}")
      assert(runs.forall(_.Succeeded), "a committed batch audited as failed")
      assert(runs.forall(r => r.OrchestrationWorker == "stream-worker" &&
        !r.EndTime.before(r.StartTime) && r.Duration >= 0))
      assert(runs.map(_.AdditionlInfo).exists(_.contains("7 input rows")) &&
        runs.map(_.AdditionlInfo).exists(_.contains("5 input rows")),
        s"per-batch row counts missing: ${runs.map(_.AdditionlInfo).toSeq}")
    } finally spark.streams.removeListener(listener)
  }

  test("Trigger.AvailableNow backfill drains everything, honors backpressure, then stops itself") {
    val base = Files.createTempDirectory("stream3")
    val landing = base.resolve("landing").toString
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString

    // 4 landing files; maxFilesPerTrigger=1 → the backfill must take
    // FOUR bounded micro-batches, not one giant catch-up batch
    (1 to 4).foreach(k => land(landing, 3, s"f$k"))
    val ts = new TransformStream(spark, landing, out, cp, "East US",
      maxFilesPerTrigger = 1,
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    val q = ts.start()
    // AvailableNow terminates on its own once the backlog is drained
    assert(q.awaitTermination(120000L), "AvailableNow query did not self-terminate")
    val got = ts.readTransformed()
    assert(got.count() == 12)
    assert(got.select("batch").distinct().count() == 4,
      "backpressure ignored during backfill")
    // each micro-batch carried its own lineage guid
    assert(got.select("TransformBatch").distinct().count() == 4)
  }

  test("restart from checkpoint does not reprocess or duplicate ids") {
    val base = Files.createTempDirectory("stream2")
    val landing = base.resolve("landing").toString
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString

    land(landing, 6, "x")
    val ts = new TransformStream(spark, landing, out, cp, "East US")
    val q1 = ts.start(); q1.processAllAvailable(); q1.stop()
    // restart with NO new data: checkpoint must prevent re-emission
    val q2 = ts.start(); q2.processAllAvailable(); q2.stop()
    val got = ts.readTransformed()
    assert(got.count() == 6)
    assert(got.select("id").distinct().count() == 6, "replay duplicated ids")
  }
}
