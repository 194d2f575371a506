package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Event, EventStreams}

/** Drives the streaming analytics over a file stream of the events
  * fixture split into two chronological micro-batches, so watermarks
  * advance and sessions/windows actually close across batches.
  */
class EventStreamsSpec extends SparkSpec {

  // events fixture normalized to microsecond timestamps
  private def fixture = graft.Tables.events(spark, sf)

  /** Write the fixture into two chronological parquet slices — as FILES
    * in the stream dir root (the file-stream source does not recurse into
    * non-partition subdirectories). */
  private def landTwoBatches(): String = {
    val dir = Files.createTempDirectory("evstream")
    val cut = fixture.selectExpr("percentile_approx(ts, 0.5) AS c").collect()(0).getTimestamp(0)
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("ts") <= cut), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("ts") > cut), dir.resolve("b1.parquet"))
    dir.toString
  }

  test("watermarked hourly windows close and emit in append mode") {
    val dir = landTwoBatches()
    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.hourlyCounts(src, "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("hourly").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hourly")
    assert(got.count() > 0, "no windows closed — watermark never advanced")
    // emitted (closed) windows must agree with the batch ground truth
    val batch = fixture
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = got.select(col("hour"), col("event_type"), col("n").as("stream_n"))
      .join(batch, Seq("hour", "event_type"))
    assert(joined.filter(col("stream_n") =!= col("n")).count() == 0,
      "closed streaming window disagrees with batch aggregation")
  }

  test("windowed HLL distinct users: streaming equals batch sketch exactly") {
    val dir = landTwoBatches()
    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.hourlyDistinctUsers(src, "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("hll_users").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hll_users")
    assert(got.count() > 0, "no windows closed")
    // the sketch register-merge across micro-batches must land on the
    // SAME estimate as one batch pass over the same rows...
    val batch = fixture
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("batch_est"),
        countDistinct(col("user_id")).as("exact"))
    val j = got.join(batch, Seq("hour", "event_type"))
    assert(j.filter(col("approx_users") =!= col("batch_est")).count() == 0,
      "streaming sketch diverged from the batch sketch")
    // ...and stay inside the published rsd band of the exact count
    assert(j.filter(abs(col("approx_users") - col("exact")) >
      col("exact") * 0.06 + lit(1.0)).count() == 0,
      "sketch estimate left the tolerance band")
  }

  test("stream-stream interval join pairs responses within the time bound") {
    val dir = landTwoBatches()
    def src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val types = fixture.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    val (trigT, respT) = (types(0), types(1))
    val q = EventStreams.correlate(
        src.filter(col("event_type") === trigT),
        src.filter(col("event_type") === respT),
        "user_id", within = "15 minutes", watermark = "2 hours")
      .select(col("event_id"), col("_r_event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("correlated").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("correlated").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch ground truth: same pairing as a plain self-join
    val a = fixture.filter(col("event_type") === trigT)
      .select(col("event_id").as("i"), col("user_id"), col("ts"))
    val b = fixture.filter(col("event_type") === respT)
      .select(col("event_id").as("j"), col("user_id").as("u2"), col("ts").as("t2"))
    val expect = a.join(b, col("user_id") === col("u2") &&
        col("t2") >= col("ts") &&
        col("t2") <= col("ts") + expr("INTERVAL 15 minutes"))
      .select(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty, "fixture produced no correlated pairs — bad test setup")
    assert(got == expect,
      s"stream join disagrees with batch: ${got.size} vs ${expect.size} pairs")
  }

  test("left-outer interval join emits unmatched triggers after the watermark") {
    val dir = landTwoBatches()
    def src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val types = fixture.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    val (trigT, respT) = (types(0), types(1))
    val q = EventStreams.correlate(
        src.filter(col("event_type") === trigT),
        src.filter(col("event_type") === respT),
        "user_id", within = "15 minutes", watermark = "2 hours",
        joinType = "left_outer")
      .select(col("event_id"), col("ts"), col("_r_event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("lo_correlated").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("lo_correlated").collect()
    val matched = rows.filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val unmatched = rows.filter(_.isNullAt(2)).map(_.getLong(0)).toSet
    // matched pairs must equal the inner-join ground truth
    val a = fixture.filter(col("event_type") === trigT)
      .select(col("event_id").as("i"), col("user_id"), col("ts"))
    val b = fixture.filter(col("event_type") === respT)
      .select(col("event_id").as("j"), col("user_id").as("u2"),
        col("ts").as("t2"))
    val pairs = a.join(b, col("user_id") === col("u2") &&
        col("t2") >= col("ts") &&
        col("t2") <= col("ts") + expr("INTERVAL 15 minutes"))
      .select(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matched == pairs, "outer join changed the matched pairs")
    // null-padded rows: exactly the triggers with NO in-window response
    // among those the watermark finalized (on-time rows are never lost,
    // late finalization may withhold the tail — so subset + nonempty,
    // and NEVER a row that actually had a match)
    val matchedTriggers = pairs.map(_._1)
    assert(unmatched.nonEmpty, "no drop-off rows emitted")
    assert(unmatched.intersect(matchedTriggers).isEmpty,
      "a matched trigger also emitted null-padded")
    // a trigger appears EITHER matched (possibly to several responses)
    // OR null-padded once — never null-padded twice
    val nullPadded = rows.filter(_.isNullAt(2)).map(_.getLong(0))
    assert(nullPadded.distinct.length == nullPadded.length,
      "a trigger emitted null-padded more than once")
  }

  test("left-outer interval join survives a kill/restart without loss or dupes") {
    // The reference contract is at-least-once delivery made effectively
    // exactly-once by idempotent application; for the drop-off stream the
    // equivalent claim is: a query killed between micro-batches and
    // restarted from its checkpoint lands on EXACTLY the rows an
    // uninterrupted run produces — matched pairs AND null-padded
    // drop-offs, no loss, no duplicate emission from replayed state.
    val fx = fixture
    val cut = fx.selectExpr("percentile_approx(ts, 0.5) AS c")
      .collect()(0).getTimestamp(0)
    // name the trigger/response types EXPLICITLY (and verify they
    // exist) instead of destructuring a sorted distinct() — a fixture
    // regeneration reshuffling the type set would otherwise silently
    // change which streams this test exercises
    val (trigT, respT) = ("click", "error")
    val types = fx.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(types.contains(trigT) && types.contains(respT),
      s"fixture no longer has '$trigT'/'$respT' events: $types")
    def landB0(dir: java.nio.file.Path): Unit = {
      graft.sources.ParquetSlices.writeSingleFile(
        fx.filter(col("ts") <= cut), dir.resolve("b0.parquet"))
      Files.setLastModifiedTime(dir.resolve("b0.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    }
    def landB1(dir: java.nio.file.Path): Unit = {
      graft.sources.ParquetSlices.writeSingleFile(
        fx.filter(col("ts") > cut), dir.resolve("b1.parquet"))
      Files.setLastModifiedTime(dir.resolve("b1.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1000000100000L))
    }
    // one run = correlate left_outer into an exactly-once parquet sink
    // (its _spark_metadata commit log is what makes replay invisible)
    def run(src: java.nio.file.Path, ckpt: String, out: String): Unit = {
      def stream = spark.readStream.schema(fx.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
      val q = EventStreams.correlate(
          stream.filter(col("event_type") === trigT),
          stream.filter(col("event_type") === respT),
          "user_id", within = "15 minutes", watermark = "2 hours",
          joinType = "left_outer")
        .select(col("event_id"), col("_r_event_id"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .start(out)
      q.processAllAvailable(); q.stop()
    }
    def read(out: String): Map[(Long, Option[Long]), Long] =
      spark.read.parquet(out).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // interrupted: batch 0, "crash" (stop), batch 1 arrives, restart
    // from the SAME checkpoint into the SAME sink
    val srcI = Files.createTempDirectory("lo_restart_src")
    val ckptI = Files.createTempDirectory("lo_restart_ckpt").toString
    val outI = Files.createTempDirectory("lo_restart_out").toString + "/t"
    landB0(srcI)
    run(srcI, ckptI, outI)
    landB1(srcI)
    run(srcI, ckptI, outI)
    // reference: same two files, same trigger pacing, never interrupted
    val srcR = Files.createTempDirectory("lo_ref_src")
    val ckptR = Files.createTempDirectory("lo_ref_ckpt").toString
    val outR = Files.createTempDirectory("lo_ref_out").toString + "/t"
    landB0(srcR); landB1(srcR)
    run(srcR, ckptR, outR)
    val (got, ref) = (read(outI), read(outR))
    assert(ref.nonEmpty && ref.keys.exists(_._2.isEmpty),
      "reference run produced no drop-off rows — bad test setup")
    assert(got == ref,
      s"restart diverged from uninterrupted run: ${got.size} vs ${ref.size} " +
        s"distinct rows; lost=${(ref.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- ref.keySet).take(3)}")
  }

  test("stream-static enrichment joins every batch against the dimension") {
    val dir = landTwoBatches()
    val dim = fixture.select(col("user_id")).distinct()
      .withColumn("tier", (col("user_id") % 3).cast("int"))
    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.enrich(src, dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enriched")
    assert(got.count() == fixture.count(), "enrichment dropped or duplicated rows")
    assert(got.filter(col("tier").isNull).count() == 0)
    assert(got.filter(col("tier") =!= (col("user_id") % 3).cast("int")).count() == 0)
  }

  test("rows later than the watermark are dropped from closed windows") {
    val dir = Files.createTempDirectory("late")
    val ordered = fixture.orderBy(col("ts"))
    val cut = fixture.selectExpr("percentile_approx(ts, 0.5) AS c")
      .collect()(0).getTimestamp(0)
    // batch 0: everything AFTER the cut (advances the watermark far ahead);
    // batch 1: the OLDER half arrives late — beyond the 2h watermark, so
    // it must not be double-counted into already-closed windows
    graft.sources.ParquetSlices.writeSingleFile(
      ordered.filter(col("ts") > cut), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      ordered.filter(col("ts") <= cut), dir.resolve("b1.parquet"))
    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = EventStreams.hourlyCounts(src, "2 hours")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("late")
    // Spark's watermark contract: on-time data is NEVER lost; data beyond
    // the watermark MAY or may not be processed (dropping is best-effort).
    // The hard append-mode invariants: a window emits AT MOST once, and
    // an emitted count never exceeds the batch ground truth.
    val dupes = got.groupBy(col("hour"), col("event_type")).count()
      .filter(col("count") > 1).count()
    assert(dupes == 0, "append mode emitted the same window twice")
    val batch = fixture
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("true_n"))
    val over = got.join(batch, Seq("hour", "event_type"))
      .filter(col("n") > col("true_n")).count()
    assert(over == 0, "an emitted window over-counted vs batch ground truth")
  }

  test("stateful sessionization closes sessions across micro-batches") {
    val dir = landTwoBatches()
    val ss = spark
    import ss.implicits._
    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Event]
    val q = EventStreams.sessionize(spark, src)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions")
    assert(got.count() > 0, "no sessions closed across batches")
    // session invariants: positive counts, start <= end, seq >= 1
    assert(got.filter(col("n_events") < 1 ||
      col("session_start") > col("session_end") || col("session_seq") < 1).count() == 0)
    // cross-check against the batch sessionizer (q20): closed streaming
    // sessions must appear in the batch result with identical bounds
    val batch = SparkEntry.queries("q20_sessionize")(spark, sf)
    val j = got.join(batch,
      got("user_id") === batch("user_id") &&
        got("session_start") === batch("session_start") &&
        got("session_end") === batch("session_end") &&
        got("n_events") === batch("n_events"))
    assert(j.count() == got.count(),
      "a closed streaming session has no matching batch session")
  }

  test("sessionization is provider-identical under the RocksDB state store") {
    // the production state backend at 100 TB state: RocksDB keeps keyed
    // state off-heap/on-disk instead of executor heap. Results must be
    // byte-identical to the default HDFS-backed provider.
    val dir = landTwoBatches()
    val ss = spark
    import ss.implicits._
    def run(name: String): Set[(Long, Long, Long)] = {
      val src = spark.readStream.schema(fixture.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event]
      val q = EventStreams.sessionize(spark, src)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(name).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
          r.getAs[Long]("n_events"))).toSet
    }
    val default = run("sess_default")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val rocks =
      try run("sess_rocksdb")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    assert(rocks.nonEmpty && rocks == default,
      s"RocksDB state store diverged: ${rocks.size} vs ${default.size}")
  }

  test("streaming as-of enrichment matches the batch as-of join on emitted rows") {
    val dir = landTwoBatches()
    def src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.asOfEnrich(spark,
        src.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("user_id"), col("value")),
        src.filter(col("event_type") === "view")
          .select(col("event_id"), col("ts"), col("user_id"), col("value")))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_stream").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("asof_stream")
    assert(got.count() > 0, "no facts emitted — watermark never advanced")
    // exactly-once per fact
    assert(got.groupBy(col("event_id")).count().filter(col("count") > 1).count() == 0,
      "a fact was emitted more than once")
    // every emitted row must carry the batch operator's exact match
    val batch = SparkEntry.queries("q27_asof_join")(spark, sf)
    val agreed = got.join(batch,
      got("event_id") === batch("event_id") &&
        got("view_ts") <=> batch("view_ts") &&
        got("view_value") <=> batch("view_value"))
    assert(agreed.count() == got.count(),
      "a streaming as-of match disagrees with the batch as-of join")
  }

  test("streaming as-of stays exact under out-of-order cross-batch arrival") {
    // half of every user's events in each micro-batch, massively out of
    // order — emission waits for the watermark, so matches must still be
    // final and identical to batch
    val dir = Files.createTempDirectory("evstream-asof-ooo")
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("event_id") % 2 === 0), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("event_id") % 2 === 1), dir.resolve("b1.parquet"))
    def src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = EventStreams.asOfEnrich(spark,
        src.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("ts"), col("user_id"), col("value")),
        src.filter(col("event_type") === "view")
          .select(col("event_id"), col("ts"), col("user_id"), col("value")))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_stream_ooo").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("asof_stream_ooo")
    assert(got.count() > 0)
    val batch = SparkEntry.queries("q27_asof_join")(spark, sf)
    val agreed = got.join(batch,
      got("event_id") === batch("event_id") &&
        got("view_ts") <=> batch("view_ts") &&
        got("view_value") <=> batch("view_value"))
    assert(agreed.count() == got.count(),
      "out-of-order arrival broke streaming as-of exactness")
  }

  test("sessionize never emits crossed bounds under out-of-order batches") {
    // interleave by event parity: every user's events arrive half in each
    // micro-batch, massively out of order ACROSS batches — a late merge
    // must extend bounds with min/max, never drag session_end backwards
    val dir = Files.createTempDirectory("evstream-ooo")
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("event_id") % 2 === 0), dir.resolve("b0.parquet"))
    graft.sources.ParquetSlices.writeSingleFile(
      fixture.filter(col("event_id") % 2 === 1), dir.resolve("b1.parquet"))
    val ss = spark
    import ss.implicits._
    val src = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Event]
    val q = EventStreams.sessionize(spark, src)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_ooo").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions_ooo")
    assert(got.filter(col("session_start") > col("session_end")).count() == 0,
      "late merge dragged session_end before session_start")
    assert(got.filter(col("n_events") < 1).count() == 0)
  }
}
