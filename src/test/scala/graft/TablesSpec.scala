package graft

/** The scanCache eviction contract: inserts purge entries belonging to
  * stopped sessions, so a long-lived JVM cycling sessions never retains
  * dead SessionStates. Only one SparkContext can exist per JVM (and the
  * suite-shared one must outlive this spec), so the spec swaps
  * [[Tables.stoppedProbe]] — the ONLY seam — to mark a real
  * `newSession()` as stopped and drives the genuine insert path.
  */
class TablesSpec extends SparkSpec {

  test("scanCache evicts a stopped session's entries on the next insert") {
    val s2 = spark.newSession()
    Tables.t(s2, sf, "region").count()
    assert(Tables.cachedScanSessions.contains(s2),
      "setup: s2's scan should be cached")
    val saved = Tables.stoppedProbe
    try {
      Tables.stoppedProbe = _ eq s2
      // a cache HIT must stay purge-free (hot path pays nothing) …
      Tables.t(s2, sf, "region")
      assert(Tables.cachedScanSessions.contains(s2),
        "a hit must not trigger the purge")
      // … and the next INSERT evicts s2. A THIRD session guarantees a
      // cache miss (the suite-shared session may already hold every
      // fixture table from other suites, which would make this a hit)
      val s3 = spark.newSession()
      Tables.t(s3, sf, "nation").count()
      assert(!Tables.cachedScanSessions.contains(s2),
        "stopped session survived an insert-path purge")
      assert(Tables.cachedScanSessions.contains(s3),
        "live session must keep its entries")
    } finally Tables.stoppedProbe = saved
  }

  test("tf fanout is adaptive: single-file input keeps the round-robin, " +
      "multi-file input at the target skips it") {
    val target = spark.sparkContext.defaultParallelism
    // the fixture tables are single parquet FILES → fanout kept
    val single = Tables.tf(spark, sf, "region")
    assert(single.queryExecution.executedPlan.toString
        .contains("RoundRobinPartitioning"),
      "single-file fixture scan must keep the round-robin pre-balance")
    // a table written as >= target part files → fanout skipped: the scan
    // alone yields that many independent tasks
    val dir = java.nio.file.Files.createTempDirectory("graft_tf_adaptive")
    try {
      spark.range(1000L).repartition(target)
        .write.mode("overwrite").parquet(s"$dir/many.parquet")
      assert(Tables.dataFileCount(spark, s"$dir/many.parquet") >= target,
        "setup: expected one part file per partition")
      val multi = Tables.tf(spark, dir.toString, "many")
      assert(!multi.queryExecution.executedPlan.toString
          .contains("RoundRobinPartitioning"),
        "multi-file scan must skip the full-corpus round-robin exchange")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
