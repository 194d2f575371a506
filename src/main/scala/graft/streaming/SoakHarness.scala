package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Generator

/** Streaming soak — exactly-once under CHURN, not just under planted
  * batches. The specs (TransformStreamSpec, EventStreamsSpec) prove the
  * semantics on controlled 2-4 batch scenarios with graceful
  * `processAllAvailable()` drains; this harness runs the same two
  * stateful paths for minutes at a realistic feed rate while a churn
  * loop repeatedly KILLS the queries mid-flight (abrupt `stop()` with
  * batches in progress, never a drain) and restarts them from their
  * checkpoints:
  *
  *  - the Transform leg (`TransformStream`): at-least-once file-stream
  *    redelivery made exactly-once by the idempotent per-epoch
  *    overwrite sink — after churn, every landed id must appear EXACTLY
  *    once with its batch lineage intact;
  *  - watermark dedup state (`EventStreams.dedupedEvents`): every event
  *    is fed TWICE (duplicate files seconds apart), so a restart that
  *    loses dedup state double-emits and a restart that replays the
  *    source without state re-emits — the output must hold exactly one
  *    row per planted event_id.
  *
  * Run: `sbt "runMain graft.streaming.Soak [seconds]"` (default 60;
  * the committed evidence run is 600 — see BASELINE.md). Prints one
  * JSON line and exits non-zero on any exactly-once violation.
  * SoakSpec runs a short-cycle version in CI so the harness itself
  * can't rot. */
object Soak {

  final case class Result(seconds: Long, restarts: Int, repairs: Int,
      itemBatches: Long,
      itemsFed: Long, itemsOut: Long, itemIdsDistinct: Long,
      eventsPlanted: Long, eventsOut: Long, eventIdsDistinct: Long) {
    def ok: Boolean =
      itemsOut == itemsFed && itemIdsDistinct == itemsFed &&
        eventsOut == eventsPlanted && eventIdsDistinct == eventsPlanted
  }

  /** Drive the soak for ~`soakSeconds` with a kill/restart every
    * ~`cycleSeconds`. Returns the final tally (caller asserts `ok`). */
  def run(spark: SparkSession, soakSeconds: Long, cycleSeconds: Long,
      feedIntervalMs: Long = 250L, rowsPerFeed: Int = 40): Result = {
    val base = Files.createTempDirectory("graft_soak")
    val (landI, outI, cpI) = (base.resolve("landI").toString,
      base.resolve("outI").toString, base.resolve("cpI").toString)
    val (landE, outE, cpE) = (base.resolve("landE").toString,
      base.resolve("outE").toString, base.resolve("cpE").toString)

    // ---- feeder thread: appends one small parquet file per tick to the
    // items landing zone, and each EVENTS file twice (the planted
    // at-least-once duplicate the dedup state must absorb across kills)
    @volatile var feeding = true
    @volatile var fedBatches = 0L
    @volatile var fedItems = 0L
    @volatile var fedEvents = 0L
    val t0 = System.currentTimeMillis()
    def feedOnce(k: Long): Unit = {
      val n = rowsPerFeed
      Generator.sampleItems(spark, n.toLong).drop("i")
        .withColumn("id", concat(lit(s"b$k-"), col("id")))
        .coalesce(1).write.mode(SaveMode.Append).parquet(landI)
      val ev = spark.range(n.toLong).select(
        (lit(k * 100000L) + col("id")).as("event_id"),
        timestamp_millis(lit(t0) + lit(k * 1000L) + col("id") * 10).as("ts"),
        (col("id") % 97).as("user_id"))
      ev.coalesce(1).write.mode(SaveMode.Append).parquet(landE)
      ev.coalesce(1).write.mode(SaveMode.Append).parquet(landE) // dup file
      fedBatches += 1; fedItems += n; fedEvents += n
    }
    // first tick SYNCHRONOUSLY: the file-stream sources resolve their
    // landing paths at start(), so both dirs must exist before the
    // queries do
    feedOnce(0L)
    val feeder = new Thread(() => {
      var k = 1L
      while (feeding) {
        feedOnce(k); k += 1
        Thread.sleep(feedIntervalMs)
      }
    }, "soak-feeder")

    def startItems() = new TransformStream(spark, landI, outI, cpI,
      "East US,West US", maxFilesPerTrigger = 2).start()
    def startEvents() = {
      val src = spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .option("maxFilesPerTrigger", "4")
        .parquet(landE)
      EventStreams.dedupedEvents(src, watermark = "10 minutes")
        .writeStream
        .option("checkpointLocation", cpE)
        .format("parquet").option("path", outE)
        .outputMode("append").start()
    }

    feeder.start()
    var restarts = 0
    var repairs = 0
    // The abrupt kills are not only a replay test — they reproduce a
    // real recovery hazard: an interrupt can land a torn state
    // SNAPSHOT whose checksum then fails every restart (see
    // StateRepair). A soak cycle that finds its query dead therefore
    // first attempts the targeted snapshot repair; any OTHER failure
    // (including a torn delta) is a genuine exactly-once break and
    // fails the soak.
    def repairOrRethrow(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      q.exception.foreach { ex =>
        if (StateRepair.repairTornSnapshot(ex).isDefined) repairs += 1
        else throw ex
      }
    val deadline = t0 + soakSeconds * 1000L
    var qi = startItems(); var qe = startEvents()
    while (System.currentTimeMillis() < deadline) {
      Thread.sleep(math.min(cycleSeconds * 1000L,
        math.max(1000L, deadline - System.currentTimeMillis())))
      if (System.currentTimeMillis() < deadline) {
        // abrupt: no drain — batches die mid-flight and must replay
        qi.stop(); qe.stop()
        repairOrRethrow(qi); repairOrRethrow(qe)
        restarts += 1
        qi = startItems(); qe = startEvents()
      }
    }
    feeding = false; feeder.join()
    // final graceful drain so the tally sees every fed row; a drain that
    // dies on a torn snapshot gets the same bounded repair-and-restart
    def drain(q0: org.apache.spark.sql.streaming.StreamingQuery,
        start: () => org.apache.spark.sql.streaming.StreamingQuery) = {
      var q = q0; var attempts = 0; var done = false
      while (!done) {
        try { q.processAllAvailable(); done = true }
        catch { case e: Throwable =>
          attempts += 1
          if (attempts > 5 || StateRepair.repairTornSnapshot(e).isEmpty) throw e
          repairs += 1; q.stop(); q = start()
        }
      }
      q
    }
    qi = drain(qi, startItems _); qe = drain(qe, startEvents _)
    qi.stop(); qe.stop()

    val items = spark.read.parquet(outI)
    val events = spark.read.parquet(outE) // file-sink metadata log = committed only
    Result(
      seconds = (System.currentTimeMillis() - t0) / 1000L,
      restarts = restarts,
      repairs = repairs,
      itemBatches = fedBatches,
      itemsFed = fedItems,
      itemsOut = items.count(),
      itemIdsDistinct = items.select("id").distinct().count(),
      eventsPlanted = fedEvents,
      eventsOut = events.count(),
      eventIdsDistinct = events.select("event_id").distinct().count())
  }

  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toLong).getOrElse(60L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = run(spark, seconds, cycleSeconds = 15L)
    println(s"""{"soak":${if (r.ok) "\"ok\"" else "\"FAIL\""},""" +
      s""""seconds":${r.seconds},"restarts":${r.restarts},""" +
      s""""torn_snapshot_repairs":${r.repairs},""" +
      s""""items_fed":${r.itemsFed},"items_out":${r.itemsOut},""" +
      s""""item_ids_distinct":${r.itemIdsDistinct},""" +
      s""""events_planted":${r.eventsPlanted},"events_out":${r.eventsOut},""" +
      s""""event_ids_distinct":${r.eventIdsDistinct}}""")
    spark.stop()
    if (!r.ok) sys.exit(1)
  }
}
