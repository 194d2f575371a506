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
  * 100 TB shape — the word alone is NOT enough. A 6-bit word has 64
  * values, so bucket population grows linearly with key count by
  * construction (~n/64 even without skew); two extra mechanisms keep
  * every buffer and every task bounded, both RESULT-INVARIANT:
  *   - MASS BAND as a second block key: L1 distance is at least the
  *     difference of totals, so a pair passing the relative threshold
  *     has total ratio ≤ (10+relTenths)/(10−relTenths); banding totals
  *     by floor(floor(log2 total)/w) with 2^w ≥ that ratio (exact
  *     integer arithmetic — `bin()` bit length, no floats) guarantees
  *     any qualifying pair sits in the same or adjacent bands. Each key
  *     posts to its own band as RESIDENT and the next as VISITOR; a
  *     pair is emitted only where ≥ 1 member is resident — exactly one
  *     block owns each pair, and a single flat-profile word now spreads
  *     across the corpus's whole mass spectrum.
  *   - SPLIT-don't-drop fat blocks via [[Posting.bounded]]: per-block
  *     counts first (map-combinable), blocks over `maxBucket` split
  *     into group-pair sub-postings BEFORE any collect_list, so no
  *     aggregation buffer ever exceeds ~maxBucket members regardless
  *     of corpus size or skew; [[Posting.owns]] keeps each pair
  *     emitted exactly once.
  * The profile build stays ONE pass (24 conditional sums, map-side
  * combinable); blocking shuffles only (word, band, key, series) rows;
  * pairs are FILTERED AT EMISSION inside the task (rejected candidates
  * cost 24 abs-diffs and never allocate a row). No self-join of the
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
    *
    * `maxBucket` bounds every posting buffer and every task's pair
    * scan; it never changes the result (split, not drop — see the
    * object scaladoc). Returns (word, k1, k2, dist, n_events), k1 < k2.
    */
  def saxNeighbors(events: DataFrame, relTenths: Int = 2,
      keyCol: String = "user_id", maxBucket: Int = 4096): DataFrame = {
    require(relTenths >= 0 && relTenths <= 20,
      s"relTenths is tenths of the combined mass; got $relTenths")
    // smallest w with 2^w >= (10+r)/(10-r), in exact integers; banding
    // is only sound while the feasible total ratio is finite (r < 10)
    val w: Int = if (relTenths >= 10) 0 else {
      var k = 1
      while ((1L << k) * (10 - relTenths) < 10 + relTenths) k += 1
      k
    }
    val prof = hourProfiles(events, keyCol)
    val posts =
      if (w == 0)
        prof.select(col("word"), lit(0L).as("band"),
          struct(col("key"), lit(true).as("res"), col("total"),
            col("series")).as("m"))
      else {
        // floor(log2 total) = bit length - 1, exactly, via bin()
        val band = expr(s"(length(bin(total)) - 1) DIV $w")
        prof.select(col("word"), col("key"), col("total"), col("series"),
            explode(array(
              struct(band.as("band"), lit(true).as("res")),
              struct((band + 1).as("band"), lit(false).as("res")))).as("b"))
          .select(col("word"), col("b.band").as("band"),
            struct(col("key"), col("b.res").as("res"), col("total"),
              col("series")).as("m"))
      }
    val posting = Posting.bounded(posts, Seq("word", "band"), "m", maxBucket)
    def l1(a: Column, b: Column): Column =
      aggregate(zip_with(a.getField("series"), b.getField("series"),
        (x, y) => abs(x - y)), lit(0L), (acc, v) => acc + v)
    // filter DIRECTLY ON THE STREAMED PAIRS: a rejected candidate costs
    // 24 abs-diffs in the codegen filter and never reaches the
    // projection (the simhashPairs discipline)
    Posting.streamPairs(
        posting
          // pin the pair-emission width: the posting shuffle is tiny in
          // BYTES, so AQE's byte-based coalescing would run the
          // compute-bound pair scan on one task
          .transform(graft.Tables.fanout))
      .filter((col("a.res") || col("b.res")) &&
        Posting.owns(col("a"), col("b")) &&
        l1(col("a"), col("b")) * 10 <=
          (col("a.total") + col("b.total")) * relTenths)
      .select(col("word"), col("a.key").as("k1"), col("b.key").as("k2"),
        l1(col("a"), col("b")).as("dist"),
        (col("a.total") + col("b.total")).as("n_events"))
  }
}
