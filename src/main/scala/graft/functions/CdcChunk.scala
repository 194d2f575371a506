package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (FastCDC/LBFS family): the same
  * Rabin-Karp rolling k-gram hash as [[Winnow]], but instead of sampling
  * minima it CUTS wherever `hash % divisor == 0` — so chunk boundaries
  * are anchored to content, not to offsets, and an insertion early in a
  * document only reflows chunks up to the first surviving boundary
  * (offset-based fixed windows reflow everything after the edit). Chunk
  * hashes then dedup sub-document content across near-identical docs —
  * the storage/transfer dedup primitive, complementing Winnow's
  * similarity fingerprints.
  *
  * Returns the sorted array of 1-based END positions of each triggering
  * k-gram (expected spacing ≈ `divisor` chars). Deliberately stateless —
  * no min/max chunk bounds — so the cut set is a pure per-position
  * predicate and the DuckDB oracle can replay it with arithmetic alone;
  * production CDC adds size bounds, which makes selection sequential
  * (first-fit) and is a straightforward extension of this eval loop.
  * Eval-based (CodegenFallback), one pass per row, two scalars of state.
  */
case class CdcBoundaries(child: Expression, k: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2 && divisor >= 2, "cdc requires k >= 2, divisor >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val Base = 257L
  private val Mod = 1000000007L // prime < 2^30: products fit in a long

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Int])
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * Base % Mod; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }
    if (h % divisor == 0) out += k
    i = 1
    val nh = n - k + 1
    while (i < nh) {
      h = ((h - s.charAt(i - 1) * pow % Mod + Mod * Base) % Mod * Base +
        s.charAt(i + k - 1)) % Mod
      if (h % divisor == 0) out += i + k // 1-based end of this k-gram
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Column API: content-defined cut positions of `text` (sorted 1-based
    * end offsets; expected chunk length ≈ `divisor`). */
  def cdcBoundaries(text: Column, k: Int = 8, divisor: Int = 64): Column =
    GraftColumnBridge.column(
      CdcBoundaries(GraftColumnBridge.expression(text), k, divisor))
}
