package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) observation for the top-k aggregator. */
final case class Scored(score: Double, id: Long)

/** Space-bounded exact top-k per group as a typed `Aggregator`
  * (SURVEY.md §2.11 — the user-extension aggregation point).
  *
  * Scale rationale: the buffer is AT MOST k entries, and Spark runs
  * typed aggregators with map-side partial aggregation — so each mapper
  * ships ≤ k rows per group to the reducer, versus a window-rank plan
  * that shuffles every row of every group before ranking. For "top 10 of
  * billions per group" this is the shape that survives 100 TB. Ordering
  * is (score, id) descending — totally ordered, so results are exact and
  * deterministic under any partitioning.
  */
final class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Long]] {
  require(k > 0)

  private val desc: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (s.score, s.id)).reverse

  private def trim(buf: Seq[Scored]): Seq[Scored] = buf.sorted(desc).take(k)

  // invariant: the buffer is always sorted descending, so the common case
  // (a full buffer and a row below the cutoff) is one comparison — not a
  // per-row k·log k re-sort on the hot path
  override def zero: Seq[Scored] = Nil
  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size >= k && desc.lteq(buf.last, a)) buf
    else trim(buf :+ a)
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = trim(b1 ++ b2)
  override def finish(buf: Seq[Scored]): Seq[Long] = buf.map(_.id)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
