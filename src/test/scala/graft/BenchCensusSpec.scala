package graft

/** The census is a measurement instrument — this spec pins that the
  * instrument reads: every profiled query reports at least one job and
  * one stage, a failing query is dropped rather than poisoning the
  * report, and the listener is removed afterwards (repeat calls on the
  * shared suite session must not stack counters). */
class BenchCensusSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("census counts jobs/stages/tasks per query and survives a bad name") {
    val rows = BenchCensus.census(spark, sfDir,
      Seq("q1_agg", "q8_sort_limit"))
    assert(rows.map(_.name) == Seq("q1_agg", "q8_sort_limit"))
    rows.foreach { r =>
      assert(r.jobs >= 1 && r.stages >= 1 && r.tasks >= 1 && r.sec > 0,
        s"empty census counters: $r")
    }
    // a query that throws is dropped, not reported as zeros: point a
    // real query at a directory with no fixture tables
    val dropped = BenchCensus.census(spark, "/tmp/graft_no_such_sf",
      Seq("q1_agg"))
    assert(dropped.isEmpty)
  }

  test("quality_mad_outliers holds its fused 2-job shape") {
    // the round-10 medianMadOfGrid fusion: one broadcast-build job
    // (grid + single-partition med/mad chain) + one output job. A
    // regression back to chained broadcasts reads 4-5 jobs here.
    // AQE must be OFF for the count: its stage-by-stage materialization
    // spawns phantom per-exchange jobs (Bench runs with AQE off too).
    // Also warm the fixture scan first: Tables.t's first read of a path
    // spawns a one-time schema-inference job that would count against
    // the pin in an isolated suite run (Bench/BenchCensus warm it too).
    val conf = spark.conf
    val prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SparkEntry.queries("quality_mad_outliers")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Tables.sweepOperatorCaches(spark)
      val rows = BenchCensus.census(spark, sfDir, Seq("quality_mad_outliers"))
      assert(rows.head.jobs <= 2,
        s"mad_outliers fused shape regressed: ${rows.head}")
    } finally conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("repeat census calls do not stack listeners") {
    val a = BenchCensus.census(spark, sfDir, Seq("q8_sort_limit"))
    val b = BenchCensus.census(spark, sfDir, Seq("q8_sort_limit"))
    // same query, same data: a stacked leftover listener would double
    // the second read's counts
    assert(math.abs(a.head.jobs - b.head.jobs) <= 1,
      s"job counts diverged across calls: $a vs $b")
  }
}
