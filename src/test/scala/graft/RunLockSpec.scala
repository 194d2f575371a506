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
    assert(l.tryAcquire("w1").isDefined)
    l.release()
    assert(!l.isLocked)
    assert(l.tryAcquire("w2").isDefined)
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
