package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row for the typed stateful ops. */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Open-session state carried between micro-batches. */
final case class SessionState(seq: Long, startMicros: Long, lastMicros: Long, n: Long)

/** A closed session emitted downstream. */
final case class ClosedSession(user_id: Long, session_seq: Long, n_events: Long,
    session_start: Timestamp, session_end: Timestamp)

/** Tagged union row for the streaming as-of state machine. */
final case class TaggedAsOf(user_id: Long, ts: Timestamp, left: Boolean,
    event_id: Long, value: Double)

/** A left (fact) row waiting for its watermark-final as-of match. */
final case class AsOfPend(ts_us: Long, event_id: Long, value: Double)

/** A buffered right (reference) observation. */
final case class AsOfRightRow(ts_us: Long, value: Double)

/** Keyed state for [[EventStreams.asOfEnrich]]: pending lefts + the
  * compacted right history (everything inside the watermark horizon plus
  * ONE latest-before-horizon row — the minimum any as-of needs). */
final case class AsOfState(lefts: List[AsOfPend], rights: List[AsOfRightRow])

/** An emitted as-of-enriched fact row (null view_* = no prior right). */
final case class AsOfEnriched(event_id: Long, user_id: Long, ts: Timestamp,
    value: Double, view_ts: Option[Timestamp], view_value: Option[Double])

/** Streaming analytics over the events stream — the engine's exposure of
  * event-time windows + watermarks and keyed custom state (SURVEY.md §2.8:
  * the reference is processing-time only; these are the north-star
  * streaming extensions).
  *
  * Scale notes: the windowed aggregate is keyed state partitioned by
  * (window, event_type) — state size is bounded by the watermark horizon,
  * not the stream length. Sessionization state is one small record per
  * ACTIVE user; closed sessions leave state immediately on emission.
  */
object EventStreams extends Serializable {

  /** Event-time tumbling window with a watermark: late rows beyond
    * `watermark` are dropped, windows close (and emit, in append mode)
    * once the watermark passes their end. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total"))

  /** Event-time windowed APPROXIMATE distinct users. The HLL++ sketch
    * buffer lives in the state store keyed by (window, event_type) and
    * register-merges across micro-batches — per-window state is the
    * sketch (KBs), never the user set, so cardinality state stays
    * bounded by watermark horizon × sketch size even at millions of
    * distinct users per window. The streaming answer is IDENTICAL to
    * the batch `approx_count_distinct` over the same rows (register max
    * is merge-order independent — spec-asserted), which is what makes
    * the estimate replayable for a backfill.
    */
  def hourlyDistinctUsers(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("approx_users"), col("n"))

  /** java.sql.Timestamp ↔ epoch MICROSECONDS (getTime alone is
    * millisecond-precision and silently truncates the fixture's
    * microsecond event times). */
  private def toMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Stream-static enrichment join: each micro-batch hash-joins against
    * the (broadcast) dimension snapshot — the standard pattern for
    * attaching slowly-changing reference data to a stream without
    * stateful join machinery. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-STREAM interval join: pair each `trigger` row with the
    * `response` rows of the same `key` arriving within `within` after it
    * (click→conversion correlation). Both sides carry watermarks and the
    * join condition bounds event time in both directions, so Spark can
    * expire buffered state once the watermark passes `trigger.ts +
    * within` — state is bounded by (watermark + within) horizon, never
    * the stream length. Response columns come back `_r_`-prefixed. */
  def correlate(trigger: DataFrame, response: DataFrame, key: String,
      within: String = "15 minutes",
      watermark: String = "2 hours", joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer")(joinType),
      s"correlate: joinType must be inner or left_outer, got $joinType")
    val l = trigger.withWatermark("ts", watermark)
    // rename BEFORE attaching the watermark so the event-time tag
    // unambiguously rides on the renamed column
    val r = response.select(response.columns.map(c => col(c).as(s"_r_$c")): _*)
      .withWatermark("_r_ts", watermark)
    // left_outer: an UNMATCHED trigger row is held in state until the
    // watermark proves no in-window response can still arrive, then
    // emits null-padded exactly once — the "funnel drop-off" stream the
    // inner join can never produce. State stays bounded by the same
    // watermark + interval expiry as the inner form.
    l.join(r,
      col(key) === col(s"_r_$key") &&
        col("_r_ts") >= col("ts") &&
        col("_r_ts") <= col("ts") + expr(s"INTERVAL $within"),
      joinType)
  }

  /** Streaming exactly-once-per-key dedup: duplicates of `event_id`
    * arriving within the watermark horizon are dropped; state is bounded
    * by the horizon (dropDuplicatesWithinWatermark), not stream length —
    * the scalable form of a dedup ledger for at-least-once sources. */
  def dedupedEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** STREAMING as-of enrichment — the streaming form of
    * [[graft.ops.AsOfJoin]]: each `facts` row (purchase) is emitted once,
    * enriched with the latest `refs` row (view) of the same `user_id`
    * with `ref.ts <= fact.ts` (inclusive; ties pick the largest value —
    * the identical contract as the batch operator and DuckDB ASOF).
    *
    * Exactness under out-of-order arrival: a fact emits only when the
    * WATERMARK passes its event time — at that point no matching ref can
    * still arrive (any such row would be dropped as late), so the match
    * is final. Until then the fact is buffered in keyed state.
    *
    * State is bounded: per key, the facts and refs inside the watermark
    * horizon plus ONE compacted ref (the latest at-or-before the
    * horizon — the minimum state ANY as-of needs, since an arbitrarily
    * old ref is still "the latest prior" for future facts). Facts leave
    * state on emission; refs behind the horizon compact to that single
    * row; an event-time timeout flushes pending facts when the key goes
    * quiet. Facts that themselves arrive later than the watermark (the
    * source's at-least-once tail) are DROPPED before the state update
    * ever sees them — flatMapGroupsWithState filters rows older than the
    * watermark — the standard append-mode watermark caveat.
    *
    * Inputs need columns (event_id, ts, user_id, value). */
  def asOfEnrich(spark: SparkSession, facts: DataFrame, refs: DataFrame,
      watermark: String = "2 hours"): Dataset[AsOfEnriched] = {
    import spark.implicits._

    def tag(df: DataFrame, isLeft: Boolean): DataFrame =
      df.select(col("user_id"), col("ts"), lit(isLeft).as("left"),
        (if (isLeft) col("event_id") else lit(0L)).as("event_id"),
        col("value"))

    def update(uid: Long, rows: Iterator[TaggedAsOf],
        state: GroupState[AsOfState]): Iterator[AsOfEnriched] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
      val (newL, newR) = rows.toSeq.partition(_.left)
      val lefts = (prev.lefts ++ newL.map(e =>
          AsOfPend(toMicros(e.ts), e.event_id, e.value)))
        .sortBy(p => (p.ts_us, p.event_id))
      // (ts, value) order makes the ties-pick-largest-value rule a plain
      // "last match wins" scan, same as the batch operator's struct sort
      val rights = (prev.rights ++ newR.map(e =>
          AsOfRightRow(toMicros(e.ts), e.value)))
        .sortBy(r => (r.ts_us, r.value))
      val (emit, pend) = lefts.partition(_.ts_us <= wmUs)
      val out = emit.map { l =>
        val m = rights.foldLeft(Option.empty[AsOfRightRow]) {
          case (acc, r) => if (r.ts_us <= l.ts_us) Some(r) else acc
        }
        AsOfEnriched(l.event_id, uid, fromMicros(l.ts_us), l.value,
          m.map(r => fromMicros(r.ts_us)), m.map(_.value))
      }
      val (rOld, rLive) = rights.partition(_.ts_us <= wmUs)
      val kept = rOld.lastOption.toList ++ rLive
      if (pend.isEmpty && kept.isEmpty) state.remove()
      else {
        state.update(AsOfState(pend, kept))
        if (pend.nonEmpty)
          // flush the oldest pending fact as soon as the watermark can
          // have passed it; must stay strictly ahead of the current wm
          state.setTimeoutTimestamp(math.max(pend.head.ts_us / 1000L + 1,
            state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

    tag(facts, isLeft = true).unionByName(tag(refs, isLeft = false))
      .withWatermark("ts", watermark)
      .as[TaggedAsOf]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stateful sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState: emits each session as it CLOSES — either a
    * later event arrives past the gap, or the EVENT-TIME TIMEOUT fires
    * once the watermark passes gap beyond the session's end (so a user
    * who goes quiet still gets their final session, and their state is
    * REMOVED — state is bounded by active users, not users ever seen).
    * Timestamps are tracked at full microsecond precision so bounds match
    * the batch sessionizer exactly.
    *
    * Late events within the open session's horizon merge with min/max
    * bounds (a late arrival must never drag `lastMicros` backwards —
    * that would both corrupt session_end and mis-trigger gap splits);
    * events later than the watermark horizon are dropped by the
    * watermark itself. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMillis: Long = 30 * 60 * 1000,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMicros = gapMillis * 1000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[ClosedSession] = {
      // (no early `return`: a non-local return marker in a Spark closure
      // is not serializable)
      if (state.hasTimedOut) {
        // watermark passed session_end + gap with no new events: final close
        val s = state.get
        state.remove()
        Iterator(ClosedSession(userId, s.seq, s.n,
          fromMicros(s.startMicros), fromMicros(s.lastMicros)))
      } else {
      val sorted = rows.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
      var cur = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      sorted.foreach { e =>
        val t = toMicros(e.ts)
        cur match {
          case Some(s) if t - s.lastMicros <= gapMicros =>
            cur = Some(s.copy(startMicros = math.min(s.startMicros, t),
              lastMicros = math.max(s.lastMicros, t), n = s.n + 1))
          case Some(s) =>
            closed += ClosedSession(userId, s.seq, s.n,
              fromMicros(s.startMicros), fromMicros(s.lastMicros))
            cur = Some(SessionState(s.seq + 1, t, t, 1))
          case None =>
            cur = Some(SessionState(1, t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // fire once the watermark passes the gap horizon; the timestamp
        // must stay ahead of the current watermark or Spark rejects it
        state.setTimeoutTimestamp(math.max(
          s.lastMicros / 1000L + gapMillis,
          state.getCurrentWatermarkMs() + 1))
      }
      closed.result().iterator
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
