package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm): Rabin-Karp rolling hashes over character
  * k-grams, then the rightmost-minimum hash of every `window` consecutive
  * hashes is selected. Guarantees: any shared substring of length ≥
  * window + k − 1 yields at least one shared fingerprint, and identical
  * documents yield identical fingerprint sets — the standard primitive
  * for chunk-level near-dup detection at corpus scale (constant-size
  * output per document; compare via inverted index on fingerprint).
  *
  * Returns a sorted distinct array<long>. Eval-based (CodegenFallback):
  * the per-row cost is one pass over the string; selection state is two
  * scalars, no allocation beyond the result.
  */
case class Winnow(child: Expression, k: Int, window: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2 && window >= 1, "winnow requires k >= 2, window >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Base = 257L
  private val Mod = 1000000007L // prime < 2^30: products fit in a long

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling k-gram hashes
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var pow = 1L // Base^(k-1) mod Mod
    var i = 1
    while (i < k) { pow = pow * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nh) {
      h = ((h - s.charAt(i - 1) * pow % Mod + Mod * Base) % Mod * Base +
        s.charAt(i + k - 1)) % Mod
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each window of `window` hashes
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    if (nh <= window) {
      var min = hashes(0); i = 1
      while (i < nh) { if (hashes(i) <= min) min = hashes(i); i += 1 }
      selected += min
    } else {
      var w = 0
      while (w + window <= nh) {
        var min = hashes(w); var j = w + 1
        while (j < w + window) { if (hashes(j) <= min) min = hashes(j); j += 1 }
        selected += min
        w += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  /** Column API: winnowing fingerprints of `text` with char k-grams of
    * size `k` and selection window `window`. */
  def winnow(text: Column, k: Int = 8, window: Int = 6): Column =
    GraftColumnBridge.column(Winnow(GraftColumnBridge.expression(text), k, window))
}
