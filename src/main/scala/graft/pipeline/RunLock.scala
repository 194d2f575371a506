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
  *  - release deletes the lock; the caller appends the audit row.
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
        val expired = try {
          val lines = new String(Files.readAllBytes(lockFile),
            StandardCharsets.UTF_8).split("\n")
          lines.length >= 2 && nowMillis > lines(1).trim.toLong + timeoutMillis
        } catch { case _: Exception => false } // partial write → treat as live
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

  /** Release resets the lock (EtlProcess.cs:321-338). Holder-only by contract. */
  def release(): Unit = Files.deleteIfExists(lockFile)

  def isLocked: Boolean = Files.exists(lockFile)
}
