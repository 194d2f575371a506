package graft.pipeline

import java.nio.file.{Files, Path, StandardCopyOption, FileAlreadyExistsException, NoSuchFileException}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** Filesystem run-lock mirroring the reference's ETag-CAS orchestration
  * lease (EtlProcess.cs:262-344, SURVEY.md §2.9 O1, §7.4.9):
  *
  *  - acquire succeeds if the lease is free, or if it EXPIRED (timeout,
  *    default 5 min per EtlProcess.cs:24) — expired takeover sets the
  *    `forced` flag, which flows into the audit row as `ForcedLease`
  *    (EtlProcess.cs:114,126).
  *  - CAS primitive: `Files.createFile` (O_CREAT|O_EXCL — atomic, exactly
  *    one winner) replaces Cosmos's `IfMatchEtag`; expired-lease takeover
  *    uses atomic rename-to-graveyard (exactly one renamer wins on POSIX).
  *  - release is HOLDER-VERIFIED, mirroring ReleaseLeaseAsync's ETag CAS
  *    (EtlProcess.cs:321-338): the lock content is compared to the caller's
  *    lease before deletion, so a slow holder whose expired lease was
  *    stolen cannot delete the new holder's lock — it just lost the lease.
  *  - an unparseable lock file (crash between create and write) self-
  *    expires on file mtime, like the reference lease's LeaseTimeOut.
  *
  * On a real cluster this lives on shared storage (HDFS/NFS/object store
  * with conditional put); the semantics — skip the run if another driver
  * holds a live lease — are identical.
  */
final class RunLock(dir: Path, timeoutMillis: Long = 5 * 60 * 1000) {

  final case class Lease(worker: String, startMillis: Long, forced: Boolean)

  private val lockFile = dir.resolve("lease.lock")

  private def writeLock(worker: String, startMillis: Long): Unit = {
    val tmp = dir.resolve(s".lease-${UUID.randomUUID()}.tmp")
    Files.write(tmp, s"$worker\n$startMillis".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, lockFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** `!Locked || (Locked && now > LeaseTimeOut)` → acquire (EtlProcess.cs:94,286). */
  def tryAcquire(worker: String,
      nowMillis: Long = System.currentTimeMillis()): Option[Lease] = {
    Files.createDirectories(dir)
    try {
      Files.createFile(lockFile) // atomic CAS: one winner
      writeLock(worker, nowMillis)
      Some(Lease(worker, nowMillis, forced = false))
    } catch {
      case _: FileAlreadyExistsException =>
        val expired = readLock() match {
          case Some((_, start)) => nowMillis > start + timeoutMillis
          case None =>
            // partial/empty write (crash between createFile and writeLock):
            // fall back to file mtime so the stale lock self-expires instead
            // of blocking every future run forever
            try nowMillis > Files.getLastModifiedTime(lockFile).toMillis + timeoutMillis
            catch { case _: Exception => false } // vanished → racing release; skip
        }
        if (!expired) None
        else {
          // forced takeover of a timed-out lease (EtlProcess.cs:286-292):
          // atomic rename — exactly one contender wins the steal.
          val graveyard = dir.resolve(s".lease-expired-${UUID.randomUUID()}")
          try {
            Files.move(lockFile, graveyard, StandardCopyOption.ATOMIC_MOVE)
            Files.deleteIfExists(graveyard)
            Files.createFile(lockFile)
            writeLock(worker, nowMillis)
            Some(Lease(worker, nowMillis, forced = true))
          } catch {
            case _: NoSuchFileException => None        // lost the steal race
            case _: FileAlreadyExistsException => None // lost the re-create race
          }
        }
    }
  }

  private def readLock(): Option[(String, Long)] =
    try {
      val lines = new String(Files.readAllBytes(lockFile),
        StandardCharsets.UTF_8).split("\n")
      if (lines.length >= 2) Some((lines(0).trim, lines(1).trim.toLong)) else None
    } catch { case _: Exception => None }

  /** Holder-verified release (EtlProcess.cs:321-338): only the lease that
    * currently OWNS the lock may delete it. A slow worker releasing after
    * its lease expired and was stolen gets `false` ("lost lease") and must
    * leave the new holder's lock alone — without this check, the stale
    * release would free the lock under the new holder and a third worker
    * could acquire while the second still runs. */
  def release(lease: Lease): Boolean = readLock() match {
    case Some((w, s)) if w == lease.worker && s == lease.startMillis =>
      // atomic rename-then-delete: exactly one of {releaser, stealer} wins
      val graveyard = dir.resolve(s".lease-released-${UUID.randomUUID()}")
      try {
        Files.move(lockFile, graveyard, StandardCopyOption.ATOMIC_MOVE)
        Files.deleteIfExists(graveyard)
        true
      } catch { case _: NoSuchFileException => false }
    case _ => false // lost lease: a newer holder owns (or already freed) it
  }

  def isLocked: Boolean = Files.exists(lockFile)
}
