package graft

import java.nio.file.Files
import org.apache.spark.SparkException
import graft.streaming.{Soak, StateRepair}

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

  /** Builds the exact exception shape Spark raises for a checkpoint
    * checksum mismatch (typed condition + fileName parameter, nested
    * under the wrappers the state store adds), pointing at real files. */
  private def tornFailure(file: java.nio.file.Path): Throwable =
    new SparkException(errorClass = "CANNOT_LOAD_STATE_STORE.UNCATEGORIZED",
      messageParameters = Map.empty[String, String],
      cause = new SparkException(
        errorClass = "CHECKPOINT_FILE_CHECKSUM_VERIFICATION_FAILED",
        messageParameters = Map("fileName" -> file.toUri.toString,
          "expectedSize" -> "2076", "expectedChecksum" -> "1",
          "computedSize" -> "2069", "computedChecksum" -> "2"),
        cause = null))

  test("StateRepair deletes a torn snapshot and its crc sidecar, and is idempotent") {
    val dir = Files.createTempDirectory("graft_repair")
    val snap = dir.resolve("59.snapshot")
    val crc = dir.resolve("59.snapshot.crc")
    Files.write(snap, Array.fill(2069)(7.toByte))
    Files.write(crc, Array.fill(12)(1.toByte))
    val repaired = StateRepair.repairTornSnapshot(tornFailure(snap))
    assert(repaired.contains(snap.toUri.toString))
    assert(!Files.exists(snap) && !Files.exists(crc),
      "torn snapshot or its crc sidecar survived the repair")
    // double delivery of the same failure must not wedge a retry loop
    assert(StateRepair.repairTornSnapshot(tornFailure(snap)).isDefined)
  }

  test("StateRepair refuses a torn DELTA — deltas are the source of truth") {
    val dir = Files.createTempDirectory("graft_repair_delta")
    val delta = dir.resolve("60.delta")
    Files.write(delta, Array.fill(100)(7.toByte))
    assert(StateRepair.repairTornSnapshot(tornFailure(delta)).isEmpty)
    assert(Files.exists(delta), "repair must never touch a delta file")
  }

  test("StateRepair refuses non-local checkpoint schemes — no phantom repairs") {
    // an hdfs:/s3a: fileName used to be treated as a RELATIVE local
    // path: deleteIfExists no-oped, yet the repair reported success and
    // the caller's retry loop spun on a permanently wedged query. A
    // non-file scheme must fall through to the fatal-rethrow path.
    def remote(uri: String): Throwable =
      new SparkException(
        errorClass = "CHECKPOINT_FILE_CHECKSUM_VERIFICATION_FAILED",
        messageParameters = Map("fileName" -> uri,
          "expectedSize" -> "2076", "expectedChecksum" -> "1",
          "computedSize" -> "2069", "computedChecksum" -> "2"),
        cause = null)
    assert(StateRepair.repairTornSnapshot(
      remote("hdfs://nn:8020/ckpt/state/0/0/59.snapshot")).isEmpty)
    assert(StateRepair.repairTornSnapshot(
      remote("s3a://bucket/ckpt/state/0/0/59.snapshot")).isEmpty)
    // bare paths (no scheme) remain repairable
    assert(StateRepair.toLocalPath("relative/59.snapshot").isDefined)
    assert(StateRepair.toLocalPath("/abs/59.snapshot").isDefined)
  }

  test("StateRepair ignores unrelated failures") {
    assert(StateRepair.repairTornSnapshot(
      new RuntimeException("boom", new IllegalStateException("x"))).isEmpty)
  }
}
