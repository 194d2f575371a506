package graft.functions

import scala.collection.mutable

/** Aho-Corasick multi-pattern substring automaton: one pass over a text
  * finds ALL of a fixed pattern set's occurrences, versus one `contains`
  * scan PER pattern. Built once on the driver from the (small) pattern
  * set, broadcast to executors, and evaluated per document inside the
  * scan stage — the per-doc cost drops from O(|text| · patterns) to
  * O(|text| + matches), which is what makes exact-substring
  * decontamination affordable at 10⁵+ eval snippets
  * (cf. the per-pair `contains` plan in [[graft.ext.Dedup.substringContamination]]).
  *
  * Standard construction (Aho & Corasick 1975): a pattern trie, BFS
  * failure links, and per-state output lists pre-merged through the
  * failure chain so matching never walks suffix links to report hits.
  */
final class AhoCorasick private (
    children: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    ids: Array[String]) extends Serializable {

  /** The distinct pattern ids occurring in `text`, in pattern order.
    * Duplicate PATTERN ROWS (same or different id, same text) each
    * report — matching the per-row `contains` semantics. */
  def matchedIds(text: String): Array[String] = {
    val hits = new java.util.BitSet(ids.length)
    out(0).foreach(hits.set) // empty patterns match everything
    if (text != null) {
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !children(s).contains(c)) s = fail(s)
        s = children(s).getOrElse(c, 0)
        val o = out(s)
        var k = 0
        while (k < o.length) { hits.set(o(k)); k += 1 }
        i += 1
      }
    }
    val res = mutable.ArrayBuffer.empty[String]
    var b = hits.nextSetBit(0)
    while (b >= 0) { res += ids(b); b = hits.nextSetBit(b + 1) }
    res.toArray
  }
}

object AhoCorasick {

  /** Build from parallel (id, pattern) arrays; ids are reported verbatim. */
  def build(ids: Array[String], patterns: Array[String]): AhoCorasick = {
    require(ids.length == patterns.length, "ids and patterns must align")
    val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { ch =>
        s = children(s).getOrElseUpdate(ch, {
          children += mutable.HashMap.empty[Char, Int]
          ends += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      ends(s) += idx
    }
    val n = children.length
    val fail = new Array[Int](n)
    val out = ends.map(_.clone())
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      // BFS order guarantees fail(s) (strictly shallower) is already merged
      if (fail(s) != s) out(s) ++= out(fail(s))
      children(s).foreach { case (ch, c) =>
        var f = fail(s)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(c) = children(f).getOrElse(ch, 0)
        queue += c
      }
    }
    new AhoCorasick(children.toArray, fail, out.map(_.toArray).toArray, ids)
  }
}
