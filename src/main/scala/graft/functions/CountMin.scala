package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count–Min sketch (Cormode & Muthukrishnan) over a token stream as a
  * typed `Aggregator`: `depth × width` long counters per partial buffer
  * (the default 4×256 is 8 KB), map-side combined, merged by pointwise
  * sum — point-frequency estimates over 100 TB of tokens with NO shuffle
  * of the term stream and constant state everywhere. Estimates only ever
  * OVERcount (est ≥ true, w.h.p. est ≤ true + εN).
  *
  * Deterministic and oracle-checkable: the sketch state is a pure
  * function of the multiset of tokens. Bucketing derives all `depth`
  * rows from ONE md5 per occurrence (Kirsch–Mitzenmacher double
  * hashing): h1 = first 8 md5 hex digits, h2 = next 8, row r probes
  * bucket `(h1 + r·h2) mod width` — both halves and the modular walk are
  * reproducible in DuckDB SQL, so the driver can recompute every counter
  * cell exactly ([[graft.queries.Corpus]] `text_cms_freq`).
  */
final class CountMin(depth: Int = 4, width: Int = 256)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], item: String): Array[Long] = {
    val (h1, h2) = CountMin.hashPair(item)
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.bucket(h1, h2, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** Weighted Count–Min: inserts `(item, weight)` — `weight` occurrences
  * at once. The sketch is ADDITIVE, so building it from an exact
  * (term, count) aggregate yields the BIT-IDENTICAL counter array to
  * inserting every raw occurrence ([[CountMin]]); the input stream is
  * then vocabulary-sized instead of corpus-sized, and one md5 is paid
  * per TERM instead of per occurrence. The scale shape for "sketch +
  * exact counts from the same scan" consumers (`text_cms_freq`). */
final class CountMinWeighted(depth: Int = 4, width: Int = 256)
    extends Aggregator[(String, Long), Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], item: (String, Long)): Array[Long] = {
    val (h1, h2) = CountMin.hashPair(item._1)
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.bucket(h1, h2, r, width)) += item._2
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object CountMin {
  /** (first 8 md5 hex digits, next 8) as non-negative longs — the same
    * pair DuckDB derives with `('0x'||substr(md5(x),1,8))::BIGINT` /
    * `substr(md5(x),9,8)`, and the same md5-prefix convention as
    * [[graft.ext.Dedup.portableHash32]]. */
  def hashPair(s: String): (Long, Long) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16),
      java.lang.Long.parseLong(hex.substring(8, 16), 16))
  }

  def bucket(h1: Long, h2: Long, row: Int, width: Int): Int =
    ((h1 + row * h2) % width).toInt
}
