package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One surviving counter of the sketch: item, estimated count, and the
  * maximum possible overestimation (the count the item inherited when it
  * evicted another — 0 means the count is EXACT). */
final case class HeavyHitter(item: String, count: Long, err: Long)

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") as a
  * typed `Aggregator`: at most `capacity` counters per partial buffer, so
  * finding the frequent items of 100 TB of tokens costs one map-side-
  * combined aggregation shipping ≤ capacity rows per mapper — no shuffle
  * of the raw term stream and no unbounded state anywhere.
  *
  * Guarantees (standard for the sketch): every true count is within
  * [count - err, count]; any item with true frequency > n/capacity is
  * guaranteed present. With capacity ≥ distinct items the sketch never
  * evicts (err = 0 for all) and the result is EXACT — that regime is
  * oracle-checked against DuckDB; the bounded regime's error bound is
  * spec-gated on a skewed synthetic stream.
  */
final class SpaceSaving(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[HeavyHitter]] {
  require(capacity > 0)

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)],
      item: String): Map[String, (Long, Long)] =
    buf.get(item) match {
      case Some((c, e)) => buf.updated(item, (c + 1, e))
      case None if buf.size < capacity => buf.updated(item, (1L, 0L))
      case None =>
        // evict the minimum counter (ties: lexicographically greatest item,
        // so the choice is deterministic); the newcomer inherits its count
        // as the overestimation bound
        val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
        (buf - minItem).updated(item, (minC + 1, minC))
    }

  override def merge(b1: Map[String, (Long, Long)],
      b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    // standard sketch merge: pointwise sum, absent counters inherit the
    // other sketch's minimum as overestimation; then trim to capacity
    val min1 = if (b1.size < capacity) 0L else b1.values.map(_._1).min
    val min2 = if (b2.size < capacity) 0L else b2.values.map(_._1).min
    val keys = b1.keySet ++ b2.keySet
    val summed = keys.iterator.map { k =>
      // a key absent from a sketch saw at most that SKETCH'S OWN minimum
      // in its substream (it may have been evicted at up to that count) —
      // inheriting the other sketch's minimum breaks the count upper bound
      val (c1, e1) = b1.getOrElse(k, (min1, min1))
      val (c2, e2) = b2.getOrElse(k, (min2, min2))
      k -> (c1 + c2, e1 + e2)
    }.toMap
    if (summed.size <= capacity) summed
    else summed.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(capacity).toMap
  }

  override def finish(buf: Map[String, (Long, Long)]): Seq[HeavyHitter] =
    buf.toSeq.map { case (i, (c, e)) => HeavyHitter(i, c, e) }
      .sortBy(h => (-h.count, h.item))

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[HeavyHitter]] = ExpressionEncoder()
}
