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

  test("repeat census calls do not stack listeners") {
    val a = BenchCensus.census(spark, sfDir, Seq("q8_sort_limit"))
    val b = BenchCensus.census(spark, sfDir, Seq("q8_sort_limit"))
    // same query, same data: a stacked leftover listener would double
    // the second read's counts
    assert(math.abs(a.head.jobs - b.head.jobs) <= 1,
      s"job counts diverged across calls: $a vs $b")
  }
}
