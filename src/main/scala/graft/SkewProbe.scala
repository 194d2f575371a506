package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew probe for the shared pair-detector valve
  * (VERDICT r11 item 7; extended to the fuzzy detector in r13): appends
  * a PLANTED DEGENERATE hot block to a replica — n identical documents,
  * n identical images, n users with identical flat hour profiles, n
  * parts sharing one (brand, size) blocking key with identical names —
  * and drives the five split-valve detectors (MinHash-LSH, SimHash,
  * phash, SAX, fuzzy edit-distance) with their REAL default caps,
  * recording wall seconds, the max single-task peak execution memory,
  * and total spill. The point being proven: the valve's per-buffer
  * bound (≤ ~maxBucket members regardless of block size) holds at data
  * scale, so the hot block costs pair-OUTPUT volume (the query's
  * semantics — C(n,2) pairs exist) but never an aggregation buffer
  * proportional to the block, and the quadratic scan spreads over
  * G·(G+1)/2 tasks instead of serializing onto one.
  *
  * Output volume caps the experiment size: n identical items emit
  * C(n,2) owned pairs by definition, so n = 2·10⁴ (≈2·10⁸ pairs per
  * detector) is the largest honest probe that completes in minutes —
  * the MEMORY bound it certifies is size-independent (G grows with the
  * block, sub-posting width does not). All five detectors run at the
  * same n, fuzzy included (rounds 13 and earlier capped fuzzy at 8000
  * because its per-pair bounded-DP cost is ~100× a xor+popcount; the
  * full-n run measured r14 — minutes, not hours — so the cap is gone
  * and the probe table is symmetric).
  *
  * Run: `sbt "runMain graft.SkewProbe [sfDir] [n]"` (defaults:
  * bench_ab/sf1, 20000). Prints one JSON line; numbers are recorded in
  * BASELINE.md. A CI-scale variant runs in SkewProbeSpec (n=2000 on
  * sf0.01 with the caps lowered to force the split) so the
  * GenerateExec-buffering regression can never silently return.
  */
object SkewProbe {

  /** One probe measurement. `pairs` passed the detector's own
    * `require(pairs >= C(n,2))` under-emission gate before this is
    * constructed. */
  final case class Result(name: String, sec: Double, pairs: Long,
      taskPeakMb: Long, spillMb: Long) {
    def json: String =
      f""""$name":{"sec":$sec%.1f,"pairs":$pairs,"task_peak_mb":$taskPeakMb,"spill_mb":$spillMb}"""
  }

  /** The planted corpora: each background table from `sfDir` plus n
    * degenerate rows keyed above `base` (clear of every replica key
    * band). `bgImages` controls the distinct-image background size
    * (50k at probe scale; smaller in CI). */
  final case class Corpora(docs: DataFrame, events: DataFrame,
      media: DataFrame, parts: DataFrame)

  def planted(spark: SparkSession, sfDir: String, n: Int,
      bgImages: Int = 50000): Corpora = {
    import spark.implicits._
    val base = 1L << 40
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

    // distinct background images + n byte-identical ones
    val hotImg = graft.ext.Multimodal.Pgm.encodeP5(
      graft.ext.Multimodal.PgmImage(8, 8, Array.tabulate(64)(i => (i * 37) % 256)))
    val media = spark.range(bgImages).map { id =>
      // seeded-random pixels: genuinely DISTINCT images (a modular
      // gradient would alias to 256 distinct payloads and plant its own
      // accidental hot blocks)
      val rnd = new java.util.Random(id)
      (id, graft.ext.Multimodal.Pgm.encodeP5(graft.ext.Multimodal.PgmImage(
        8, 8, Array.fill(64)(rnd.nextInt(256)))))
    }.toDF("media_id", "payload")
      .unionByName(spark.range(n)
        .select((col("id") + base).as("media_id"), lit(hotImg).as("payload")))

    // n parts on ONE (brand, size) blocking key with byte-identical
    // names — the degenerate shape that serialized the pre-valve fuzzy
    // detector's quadratic scan onto a single join task
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"))
      .unionByName(spark.range(n)
        .select((col("id") + base).as("p_partkey"),
          lit("identically named planted widget assembly unit").as("p_name"),
          lit("Brand#HOT").as("p_brand"), lit(999).as("p_size")))
    Corpora(docs, events, media, parts)
  }

  /** The five detectors over the planted corpora, at REAL default caps
    * unless `maxBucket` is supplied (the CI spec lowers it to force the
    * split at small n). Paired with the n whose C(n,2) pairs each must
    * emit. */
  def detectors(c: Corpora, n: Int,
      maxBucket: Option[Int] = None): Seq[(String, Int, () => DataFrame)] = {
    def mb(dflt: Int): Int = maxBucket.getOrElse(dflt)
    Seq(
      ("minhash", n, () => graft.ext.Dedup.minhashLshPairs(c.docs, maxBucket = mb(4096))),
      ("simhash", n, () => graft.ext.Dedup.simhashPairs(c.docs, maxBucket = mb(4096))),
      ("phash", n, () => graft.ext.Multimodal.phashPairs(c.media.sparkSession,
        c.media, maxBucket = mb(4096))),
      ("sax", n, () => graft.ext.TimeSeries.saxNeighbors(c.events, maxBucket = mb(4096))),
      ("fuzzy", n, () => graft.ext.Dedup.editDistancePairs(
        c.parts, "p_partkey", "p_name", Seq("p_brand", "p_size"), maxDist = 8,
        maxBucket = mb(4096))))
  }

  /** Drive each detector to completion under a task-metrics listener:
    * count the emitted pairs (failing loudly if the valve under-emits
    * the planted block's C(n,2)), record wall/task-peak/spill. */
  def probeAll(spark: SparkSession, sfDir: String, n: Int,
      only: Option[Set[String]] = None, bgImages: Int = 50000,
      maxBucket: Option[Int] = None): Seq[Result] = {
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
    try {
      val c = planted(spark, sfDir, n, bgImages)
      detectors(c, n, maxBucket).flatMap { case (name, nPlanted, mk) =>
        if (!only.forall(_.contains(name))) None
        else {
          peak = 0L; spilled = 0L
          val df = mk()
          if (sys.env.contains("SKEW_PROBE_EXPLAIN"))
            System.err.println(s"[probe] $name plan:\n" +
              df.queryExecution.executedPlan.toString.take(8000))
          val t0 = System.nanoTime()
          val pairs = df.count()
          val sec = (System.nanoTime() - t0) / 1e9
          Tables.sweepOperatorCaches(spark)
          val minPairs = nPlanted.toLong * (nPlanted - 1) / 2
          require(pairs >= minPairs,
            s"$name under-emitted: $pairs < C($nPlanted,2)=$minPairs — the " +
              "valve dropped pairs")
          Some(Result(name, sec, pairs, peak / (1 << 20), spilled / (1 << 20)))
        }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench_ab/sf1")
    val n = args.lift(1).map(_.toInt).getOrElse(20000)
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
    val only = sys.env.get("SKEW_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = probeAll(spark, sfDir, n, only)
    println(s"""{"probe":"planted-skew","sf":"$sfDir","n":$n,${results.map(_.json).mkString(",")}}""")
    spark.stop()
  }
}
