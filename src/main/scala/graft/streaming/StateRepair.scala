package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.SparkThrowable

/** Self-healing for a real crash-recovery hazard the soak harness
  * (graft.streaming.Soak) caught live: an abrupt query stop can
  * interrupt the HDFS-backed state store's MAINTENANCE thread while it
  * renames a state snapshot, landing a partially-flushed `N.snapshot`
  * next to its already-complete `.crc` sidecar (observed tear: expected
  * 2076 bytes, found 2069). Spark 4's checkpoint file checksums
  * (`spark.sql.streaming.checkpoint.fileChecksum.enabled`, default on)
  * then fail EVERY subsequent state load with
  * CHECKPOINT_FILE_CHECKSUM_VERIFICATION_FAILED — the provider's
  * delta-fallback never engages because the snapshot read aborts the
  * whole load — so one torn optimization file wedges the query
  * permanently.
  *
  * The repair is safe precisely because of what a snapshot IS: a read
  * optimization. State version V loads from the newest intact snapshot
  * <= V plus the committed delta chain above it, and deltas are
  * committed via atomic rename BEFORE the batch commits (they stay
  * around for `spark.sql.streaming.minBatchesToRetain` versions,
  * default 100). Deleting a torn snapshot therefore restores exactly
  * the state a fallback would have produced. A torn DELTA is the
  * opposite case — deltas are the source of truth, so that checksum
  * failure must stay fatal — and this repair refuses it by suffix.
  *
  * Disabling the checksum conf would also "fix" the soak, by reading
  * the torn snapshot as silent state corruption. Kept ON; detection
  * plus targeted repair is the correct trade.
  */
object StateRepair {

  /** Walk `e`'s cause chain; if the failure is a checksum mismatch on a
    * state SNAPSHOT file, delete that snapshot and its `.crc` sidecar
    * and return the deleted path. Anything else — including a torn
    * delta — returns None (caller re-raises). Idempotent: a repeat call
    * on the same failure finds the file already gone and still returns
    * the path, so a caller retry loop cannot wedge on double delivery
    * of one failure.
    */
  def repairTornSnapshot(e: Throwable): Option[String] = {
    for {
      fileName <- tornSnapshotFile(e)
      p <- toLocalPath(fileName)
    } yield {
      Files.deleteIfExists(p)
      Files.deleteIfExists(p.resolveSibling(p.getFileName.toString + ".crc"))
      fileName
    }
  }

  /** The torn-snapshot detector, factored out for the spec: the first
    * CHECKPOINT_FILE_CHECKSUM_VERIFICATION_FAILED in the cause chain
    * whose `fileName` message parameter ends in `.snapshot`. Uses the
    * typed SparkThrowable condition + parameters, not message parsing.
    */
  def tornSnapshotFile(e: Throwable): Option[String] = {
    var cur = e
    while (cur != null) {
      cur match {
        case st: SparkThrowable
            if st.getCondition == "CHECKPOINT_FILE_CHECKSUM_VERIFICATION_FAILED" =>
          val f = st.getMessageParameters.get("fileName")
          if (f != null && f.endsWith(".snapshot")) return Some(f)
        case _ =>
      }
      cur = if (cur.getCause eq cur) null else cur.getCause
    }
    None
  }

  /** Checkpoint file names arrive as `file:/...` URIs or bare local
    * paths — those this repair can act on. Any OTHER URI scheme
    * (hdfs:, s3a:, ...) is a checkpoint this local java.nio delete
    * cannot touch: returning a path for it would make deleteIfExists
    * silently no-op on a phantom relative path and report a "repair"
    * that repaired nothing, so non-local schemes return None and the
    * caller falls through to its fatal-rethrow branch. */
  private val uriScheme = "^[a-zA-Z][a-zA-Z0-9+.-]*:".r
  private[graft] def toLocalPath(fileName: String): Option[java.nio.file.Path] =
    if (fileName.startsWith("file:"))
      Some(Paths.get(java.net.URI.create(fileName.replace(" ", "%20"))))
    else if (uriScheme.findPrefixOf(fileName).isEmpty)
      Some(Paths.get(fileName)) // bare path
    else None // hdfs:/s3a:/...: not locally repairable
}
