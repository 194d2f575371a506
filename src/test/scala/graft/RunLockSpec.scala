package graft

import java.nio.file.Files
import graft.pipeline.RunLock

/** O1 lease semantics (EtlProcess.cs:262-344): free-acquire, contention
  * skip, expiry takeover with forced flag, release, steal-race safety.
  */
class RunLockSpec extends SparkSpec {

  private def freshLock(timeoutMs: Long = 5000) =
    new RunLock(Files.createTempDirectory("runlock"), timeoutMs)

  test("acquire on free lease succeeds, unforced") {
    val l = freshLock()
    val lease = l.tryAcquire("w1")
    assert(lease.isDefined && !lease.get.forced)
    assert(l.isLocked)
  }

  test("second acquire while live is refused") {
    val l = freshLock()
    assert(l.tryAcquire("w1").isDefined)
    assert(l.tryAcquire("w2").isEmpty)
  }

  test("release frees the lease") {
    val l = freshLock()
    val lease = l.tryAcquire("w1")
    assert(lease.isDefined)
    assert(l.release(lease.get))
    assert(!l.isLocked)
    assert(l.tryAcquire("w2").isDefined)
  }

  test("stale release after steal does NOT delete the new holder's lock") {
    val l = freshLock(timeoutMs = 1000)
    val old = l.tryAcquire("w1", nowMillis = 1000)
    val stolen = l.tryAcquire("w2", nowMillis = 5000) // w1 long expired
    assert(stolen.isDefined && stolen.get.forced)
    // slow original holder finishes late: release must be refused
    assert(!l.release(old.get), "stale holder must lose the lease, not free it")
    assert(l.isLocked, "new holder's lock must survive the stale release")
    assert(l.tryAcquire("w3", nowMillis = 5500).isEmpty, "no third worker may acquire")
    assert(l.release(stolen.get))
  }

  test("unparseable (empty) lock file self-expires on mtime") {
    val dir = Files.createTempDirectory("runlock")
    val l = new RunLock(dir, 50)
    // simulate a crash between createFile and writeLock
    val lockFile = Files.createFile(dir.resolve("lease.lock"))
    val mtime = Files.getLastModifiedTime(lockFile).toMillis
    assert(l.tryAcquire("w1", nowMillis = mtime + 10).isEmpty,
      "fresh empty lock is live")
    val lease = l.tryAcquire("w1", nowMillis = mtime + 200)
    assert(lease.isDefined && lease.get.forced,
      "stale empty lock must expire via mtime instead of blocking forever")
  }

  test("expired lease is taken over with forced=true") {
    val l = freshLock(timeoutMs = 50)
    assert(l.tryAcquire("w1").isDefined)
    Thread.sleep(120)
    val stolen = l.tryAcquire("w2")
    assert(stolen.isDefined && stolen.get.forced,
      "takeover of a timed-out lease must be flagged forced (EtlProcess.cs:286-292)")
  }

  test("live lease within timeout is NOT taken over") {
    val l = freshLock(timeoutMs = 60000)
    assert(l.tryAcquire("w1").isDefined)
    assert(l.tryAcquire("w2").isEmpty)
  }

  test("concurrent acquires: exactly one winner") {
    val l = freshLock()
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 16).map { i =>
      val t = new Thread(() => {
        start.await()
        if (l.tryAcquire(s"w$i").isDefined) winners.incrementAndGet()
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join())
    assert(winners.get() == 1)
  }
}
