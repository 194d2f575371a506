package graft

import graft.streaming.Soak

/** CI guard for the soak harness: a short-cycle run (~20s, 2+ abrupt
  * kill/restarts) must already hold exactly-once on both legs. The
  * committed 10-minute evidence run uses the same code path
  * (`runMain graft.streaming.Soak 600`) — this spec exists so the
  * harness can't rot between evidence runs. */
class SoakSpec extends SparkSpec {

  test("short soak with abrupt kill/restart stays exactly-once on both legs") {
    val r = Soak.run(spark, soakSeconds = 20L, cycleSeconds = 6L,
      feedIntervalMs = 200L, rowsPerFeed = 20)
    assert(r.restarts >= 2, s"churn loop never killed a query: $r")
    assert(r.itemsOut == r.itemsFed && r.itemIdsDistinct == r.itemsFed,
      s"transform leg lost or duplicated ids under churn: $r")
    assert(r.eventsOut == r.eventsPlanted &&
      r.eventIdsDistinct == r.eventsPlanted,
      s"dedup state lost or duplicated events under churn: $r")
  }
}
