package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series similarity search over per-key activity profiles — the
  * streaming-analytics ask (cf. "Time Series Similarity Search for
  * Streaming Data in Distributed Systems", EDBT 2019, PAPERS.md): find
  * keys (users, devices, tenants) whose activity SHAPE matches, at
  * corpus scale, without an all-pairs distance matrix.
  *
  * Representation: the classic two-step discretization —
  *   1. PAA (piecewise aggregate approximation): the 24 hour-of-day
  *      counts collapse to 6 contiguous 4-hour segment sums;
  *   2. CLIPPING (the 2-symbol SAX alphabet): segment bit s is set iff
  *      segment s's mass exceeds the series mean (`seg*6 > total` in
  *      exact integers — no division, no floats).
  * The resulting 6-bit SHAPE WORD is this domain's LSH bucket: an
  * equi-join key under which exact L1 distance runs only within
  * same-shape blocks — the same posting-list discipline as
  * [[Dedup.minhashLshPairs]] and [[Multimodal.phashPairs]], and the
  * same CANDIDATE contract as any LSH stage: identical series always
  * collide (recall 1 at dist 0 by construction), near-identical series
  * straddling a segment-mean threshold can be missed, and the
  * recall/cost dial is the word width.
  *
  * 100 TB shape: the profile build is ONE pass (24 conditional sums,
  * map-side combinable); blocking shuffles only (word, key, series)
  * rows; pair emission happens inside the task per posting list with
  * `maxBucket` as the fat-block valve (a word shared by millions of
  * flat-profile keys must cap, not cross-product). No self-join of the
  * event table, no driver state.
  */
object TimeSeries {

  /** Per-key 24-slot hour-of-day activity profile, its exact event
    * total, and its 6-bit clipped shape word. One aggregation pass
    * over the events. */
  def hourProfiles(events: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val prof = events.groupBy(col(keyCol).as("key"))
      .agg(array((0 until 24).map(h =>
        sum(when(hour(col("ts")) === h, 1L).otherwise(0L))): _*).as("series"))
    val segSum = (s: Int) =>
      expr(s"aggregate(slice(series, ${s * 4 + 1}, 4), 0L, (a, x) -> a + x)")
    prof
      .withColumn("total", expr("aggregate(series, 0L, (a, x) -> a + x)"))
      .withColumn("word", (0 until 6).map(s =>
          when(segSum(s) * 6 > col("total"), lit(1 << s)).otherwise(lit(0)))
        .reduce(_ + _))
  }

  /** Shape-blocked similar-series pairs: same clipped-PAA word AND
    * relative L1 distance over the full 24-slot profiles within
    * `relTenths`/10 of the pair's combined mass — the threshold
    * `dist * 10 <= (total_a + total_b) * relTenths` is exact integer
    * arithmetic AND scale-free, so the same setting means the same
    * shape tolerance whether a key has 60 events or 60 million.
    * Returns (word, k1, k2, dist, n_events) with k1 < k2. */
  def saxNeighbors(events: DataFrame, relTenths: Int = 2,
      keyCol: String = "user_id", maxBucket: Int = Int.MaxValue): DataFrame = {
    require(relTenths >= 0 && relTenths <= 20,
      s"relTenths is tenths of the combined mass; got $relTenths")
    val posting = hourProfiles(events, keyCol)
      .groupBy(col("word"))
      .agg(sort_array(collect_list(
        struct(col("key"), col("total"), col("series")))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucket))
    val pairs = flatten(transform(sequence(lit(1), size(col("ms")) - 1), i =>
      transform(slice(col("ms"), i + 1, size(col("ms")) - i), e =>
        struct(element_at(col("ms"), i).as("a"), e.as("b")))))
    posting.select(col("word"), explode(pairs).as("p"))
      .select(col("word"), col("p.a.key").as("k1"), col("p.b.key").as("k2"),
        expr("aggregate(zip_with(p.a.series, p.b.series, (x, y) -> abs(x - y))," +
          " 0L, (a, v) -> a + v)").as("dist"),
        (col("p.a.total") + col("p.b.total")).as("n_events"))
      .filter(col("dist") * 10 <= col("n_events") * relTenths)
  }
}
