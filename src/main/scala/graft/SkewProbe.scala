package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew probe for the shared pair-detector valve
  * (VERDICT r11 item 7): appends a PLANTED DEGENERATE hot block to the
  * sf1 replica — n identical documents, n identical images, n users
  * with identical flat hour profiles — and drives the four split-valve
  * detectors (MinHash-LSH, SimHash, phash, SAX) with their REAL default
  * caps, recording wall seconds, the max single-task peak execution
  * memory, and total spill. The point being proven: the valve's
  * per-buffer bound (≤ ~maxBucket members regardless of block size)
  * holds at data scale, so the hot block costs pair-OUTPUT volume (the
  * query's semantics — C(n,2) pairs exist) but never an aggregation
  * buffer proportional to the block.
  *
  * Output volume caps the experiment size: n identical items emit
  * C(n,2) owned pairs by definition, so n = 2·10⁴ (≈2·10⁸ pairs per
  * detector) is the largest honest probe that completes in minutes —
  * the MEMORY bound it certifies is size-independent (G grows with the
  * block, sub-posting width does not).
  *
  * Run: `sbt "runMain graft.SkewProbe [sfDir] [n]"` (defaults:
  * bench_ab/sf1, 20000). Prints one JSON line; numbers are recorded in
  * BASELINE.md.
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench_ab/sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(20000)
    val base = 1L << 40 // clear of every replica key band
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.default.parallelism", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false") // the Bench protocol
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.silenceBoundedWindowWarn()
    import spark.implicits._

    // ---- planted corpora ------------------------------------------------
    val hotText = ("the same exact document body repeated verbatim " * 8).trim
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(spark.range(n)
        .select((col("id") + base).as("doc_id"), lit(hotText).as("text")))

    // n users, each with the SAME flat 24-hour profile (one event per
    // hour) — the flat shape word + identical mass lands every planted
    // user in ONE (word, band) block
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"))
      .unionByName(spark.range(n.toLong * 24)
        .select((col("id") % n + base).as("user_id"),
          to_timestamp(concat(lit("2020-05-01 "),
            lpad(floor(col("id") / n).cast("int").cast("string"), 2, "0"),
            lit(":30:00"))).as("ts")))

    // 50k distinct background images + n byte-identical ones
    val hotImg = graft.ext.Multimodal.Pgm.encodeP5(
      graft.ext.Multimodal.PgmImage(8, 8, Array.tabulate(64)(i => (i * 37) % 256)))
    val media = spark.range(50000).map { id =>
      // seeded-random pixels: 50k genuinely DISTINCT images (a modular
      // gradient would alias to 256 distinct payloads and plant its own
      // accidental hot blocks)
      val rnd = new java.util.Random(id)
      (id, graft.ext.Multimodal.Pgm.encodeP5(graft.ext.Multimodal.PgmImage(
        8, 8, Array.fill(64)(rnd.nextInt(256)))))
    }.toDF("media_id", "payload")
      .unionByName(spark.range(n)
        .select((col("id") + base).as("media_id"), lit(hotImg).as("payload")))

    // ---- instrumented runs ----------------------------------------------
    @volatile var peak = 0L
    @volatile var spilled = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          peak = math.max(peak, m.peakExecutionMemory)
          spilled += m.memoryBytesSpilled + m.diskBytesSpilled
        }
      }
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (sys.env.contains("SKEW_PROBE_EXPLAIN"))
          System.err.println(
            s"[probe] stage ${s.stageInfo.stageId}: ${s.stageInfo.name}")
    }
    spark.sparkContext.addSparkListener(listener)

    val only = sys.env.get("SKEW_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)

    def probe(name: String, df: => DataFrame): String = {
      if (!only.forall(_.contains(name))) return s""""$name":"skipped""""
      peak = 0L; spilled = 0L
      if (sys.env.contains("SKEW_PROBE_EXPLAIN"))
        System.err.println(s"[probe] $name plan:\n" +
          df.queryExecution.executedPlan.toString.take(8000))
      val t0 = System.nanoTime()
      val pairs = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Tables.sweepOperatorCaches(spark)
      val minPairs = n.toLong * (n - 1) / 2
      require(pairs >= minPairs,
        s"$name under-emitted: $pairs < C($n,2)=$minPairs — the valve dropped pairs")
      f""""$name":{"sec":$sec%.1f,"pairs":$pairs,"task_peak_mb":${peak / (1 << 20)},"spill_mb":${spilled / (1 << 20)}}"""
    }

    val results = Seq(
      probe("minhash", graft.ext.Dedup.minhashLshPairs(docs)),
      probe("simhash", graft.ext.Dedup.simhashPairs(docs)),
      probe("phash", graft.ext.Multimodal.phashPairs(spark, media)),
      probe("sax", graft.ext.TimeSeries.saxNeighbors(events)))
    println(s"""{"probe":"planted-skew","sf":"$sfDir","n":$n,${results.mkString(",")}}""")
    spark.stop()
  }
}
