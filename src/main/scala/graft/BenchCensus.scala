package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job/stage census — the fixed-cost profiler behind the bench floor
  * work. Runs every `SparkEntry.queries` entry ONCE (after the same
  * warmup and under the same session config as [[Bench]]) and prints
  * one line per query: seconds, JOB count, STAGE count, TASK count.
  *
  * Why jobs and stages and not just seconds: at fixture scale most of
  * the suite is latency-bound, and the per-query latency is almost a
  * linear function of how many jobs (driver round-trips: broadcast
  * builds, persist materializations, probe actions) and stages
  * (scheduler waves) a plan spawns. A 1-row answer arriving via 6 jobs
  * is a plan-shape defect that a seconds-only view files under
  * "noise"; this census names it. The round-8/9 floor cuts (probe
  * fusion via Observation, lazy persists, single-chain rewrites) were
  * all found by exactly this counting, done ad hoc — this main makes
  * it repeatable.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *   sbt "runMain graft.BenchCensus"` — output sorted by job count
  * descending, then seconds. SPARK_GRAFT_BENCH_ONLY restricts the set.
  */
object BenchCensus {

  /** One census row: (query, seconds, jobs, stages, tasks). */
  final case class Row(name: String, sec: Double, jobs: Int, stages: Int,
      tasks: Int)

  /** Run each named query once and count its jobs/stages/tasks via a
    * SparkListener. Queries that throw are dropped (the bench and
    * correctness gates own failure reporting; the census only
    * profiles). Registered listener is removed before returning so
    * repeated calls on a shared session don't stack counters. */
  def census(spark: SparkSession, sfDir: String,
      names: Seq[String]): Seq[Row] = {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // listener events are async; a fixed sleep lets late events from
    // query N leak into query N+1 on a loaded host. Drain the bus
    // properly: LiveListenerBus.waitUntilEmpty is private[spark], so
    // reach it via reflection (no-arg on Spark 3.1+, timeout-arg on
    // older); fall back to count-quiescence polling if the internals
    // ever move.
    val drainBus: () => Unit = {
      val sc = spark.sparkContext
      try {
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        val m = bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        m match {
          case Some(wait0) => () => { wait0.invoke(bus); () }
          case None =>
            val wait1 = bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
            () => { wait1.invoke(bus, Long.box(2000L)); () }
        }
      } catch { case _: Throwable => () => {
        // quiescence fallback: settle once the counters stop moving
        var prev = (-1, -1, -1); var same = 0; var spins = 0
        while (same < 2 && spins < 25) {
          Thread.sleep(20)
          val cur = (jobs, stages, tasks)
          if (cur == prev) same += 1 else { same = 0; prev = cur }
          spins += 1
        }
      } }
    }
    try names.flatMap { name =>
      val fn = SparkEntry.queries(name)
      drainBus() // flush any straggler events into the PRIOR reset
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      val r = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        drainBus()
        Some(Row(name, (System.nanoTime() - t0) / 1e9, jobs, stages, tasks))
      } catch { case _: Throwable => None }
      finally Tables.sweepOperatorCaches(spark)
      r
    }
    finally spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same rationale as Bench: AQE's per-exchange replan latency
      // would drown the very fixed costs this census exists to count
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.silenceBoundedWindowWarn()

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qnames = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // warmup (JIT + codegen + page cache), mirroring Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    qnames.take(3).foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => } finally spark.catalog.clearCache()
    }

    val rows = census(spark, sfDir, qnames)
    println(f"${"query"}%-30s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    rows.sortBy(r => (-r.jobs, -r.sec)).foreach { r =>
      println(f"${r.name}%-30s ${r.sec}%7.3f ${r.jobs}%5d ${r.stages}%7d ${r.tasks}%6d")
    }
    println(f"TOTAL ${rows.size}%d queries  ${rows.map(_.sec).sum}%7.1f s  " +
      f"jobs=${rows.map(_.jobs).sum}%d stages=${rows.map(_.stages).sum}%d " +
      f"tasks=${rows.map(_.tasks).sum}%d")
    spark.stop()
  }
}
