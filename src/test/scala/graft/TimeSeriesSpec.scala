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

  test("maxBucket valve drops fat blocks instead of cross-producting them") {
    // 8 identical users = one 8-wide block; cap at 4 -> zero pairs
    val ev = eventsOf((1L to 8L).map(u => (u, 12, 3)): _*)
    assert(TimeSeries.saxNeighbors(ev, relTenths = 2).count() == 28) // C(8,2)
    assert(TimeSeries.saxNeighbors(ev, relTenths = 2, maxBucket = 4).count() == 0)
  }
}
