package graft

import org.apache.spark.sql.functions._
import graft.ext.TimeSeries

/** Semantics of the shape-blocked series similarity: the candidate
  * contract (identical shapes always collide, cross-word pairs never
  * emit), exactness of the within-block distances against a local
  * brute force, and the fat-bucket valve. */
class TimeSeriesSpec extends SparkSpec {

  /** (user, hour, count) triples -> an events frame with `count` rows
    * at hour `hour` for `user`. */
  private def eventsOf(rows: (Long, Int, Int)*) = {
    val ss = spark
    import ss.implicits._
    rows.flatMap { case (u, h, n) => Seq.fill(n)((u, f"2024-03-05 $h%02d:15:00")) }
      .toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
  }

  test("identical profiles always pair at dist 0; different shapes never cross words") {
    val ev = eventsOf(
      (1L, 9, 5), (1L, 10, 5), (1L, 20, 1),   // morning-heavy
      (2L, 9, 5), (2L, 10, 5), (2L, 20, 1),   // identical to 1
      (3L, 1, 5), (3L, 2, 5), (3L, 3, 1))     // night-heavy: other word
    val got = TimeSeries.saxNeighbors(ev, relTenths = 2).collect()
    assert(got.length == 1, s"expected exactly the (1,2) pair: ${got.mkString(",")}")
    assert(got.head.getLong(1) == 1L && got.head.getLong(2) == 2L &&
      got.head.getLong(3) == 0L && got.head.getLong(4) == 22L)
  }

  test("blocked pairs match a local brute force within words") {
    // deterministic pseudo-random corpus: 12 users, arbitrary hour mix
    val rows = for {
      u <- 1L to 12L
      h <- 0 until 24
      n = ((u * 31 + h * 7) % 5).toInt if n > 0
    } yield (u, h, n)
    val ev = eventsOf(rows: _*)
    val prof = TimeSeries.hourProfiles(ev).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2), r.getInt(3)))
    val expect = (for {
      a <- prof; b <- prof if a._1 < b._1 && a._4 == b._4
      d = a._2.zip(b._2).map { case (x, y) => math.abs(x - y) }.sum
      if d * 10 <= (a._3 + b._3) * 2
    } yield (a._1, b._1, d)).toSet
    val got = TimeSeries.saxNeighbors(ev, relTenths = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, s"blocked pairs diverged from brute force:\n$got\nvs\n$expect")
  }

  test("maxBucket splits fat blocks without changing the pair set") {
    // 8 identical users = one 8-wide block; cap at 4 -> same 28 pairs,
    // emitted from bounded sub-postings (split-don't-drop)
    val ev = eventsOf((1L to 8L).map(u => (u, 12, 3)): _*)
    val uncapped = TimeSeries.saxNeighbors(ev, relTenths = 2,
      maxBucket = Int.MaxValue).collect().map(_.toSeq).toSet
    assert(uncapped.size == 28) // C(8,2)
    val capped = TimeSeries.saxNeighbors(ev, relTenths = 2, maxBucket = 4)
      .collect().map(_.toSeq).toSet
    assert(capped == uncapped, "split changed the pair set")
  }

  test("mass banding never loses cross-magnitude pairs (brute force)") {
    // same shape scaled by u: totals span several log2 bands, and the
    // (4,6) pair sits EXACTLY on the feasible ratio boundary 1.5
    val base = Seq(9 -> 3, 10 -> 2, 20 -> 1)
    val rows = for { u <- 1L to 12L; (h, n) <- base } yield (u, h, n * u.toInt)
    val ev = eventsOf(rows: _*)
    val prof = TimeSeries.hourProfiles(ev).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2), r.getInt(3)))
    val expect = (for {
      a <- prof; b <- prof if a._1 < b._1 && a._4 == b._4
      d = a._2.zip(b._2).map { case (x, y) => math.abs(x - y) }.sum
      if d * 10 <= (a._3 + b._3) * 2
    } yield (a._1, b._1, d)).toSet
    assert(expect.exists { case (a, b, _) => Set(a, b) == Set(4L, 6L) },
      "fixture lost its boundary pair — adjust the corpus")
    val got = TimeSeries.saxNeighbors(ev, relTenths = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect, s"banded pairs diverged from brute force:\n$got\nvs\n$expect")
  }

  test("skew-adversarial: 600 identical profiles, tiny cap, exact pair count") {
    // one degenerate (word, band) block of 600 residents; maxBucket=64
    // forces the two-phase split — the buffer bound is asserted on
    // Posting.bounded directly in PostingSpec; here the RESULT must be
    // the full C(600,2) pair set, each exactly once
    val ev = eventsOf((1L to 600L).map(u => (u, 12, 3)): _*)
    val got = TimeSeries.saxNeighbors(ev, relTenths = 2, maxBucket = 64)
    assert(got.count() == 600L * 599 / 2)
    // exactly once: no pair may appear twice
    assert(got.select("k1", "k2").distinct().count() == 600L * 599 / 2)
  }
}
