package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A plain bits-in-a-long-array Bloom filter over string items, built on
  * the driver from a bounded set and shipped to executors inside a
  * Catalyst expression ([[BloomMightContain]]).
  *
  * Layout is the standard double-hashing scheme (Kirsch–Mitzenmacher, as
  * in Guava/Parquet): one xxhash64 of the UTF-8 bytes split into two
  * 32-bit halves h1/h2; probe i tests bit `(h1 + i·h2) mod numBits`.
  * One hash computation per item regardless of `numHashes`, and the
  * membership test is branch-light long-array bit math — cheap enough to
  * run inside the parquet scan stage as a prefilter.
  */
object BloomUtil {
  private val Seed = 42L

  /** Bits for a target false-positive rate (`m = -n·ln p / ln²2`). */
  def optimalNumBits(n: Long, fpp: Double): Long =
    math.max(64L, math.ceil(
      -n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

  /** Hash count for n items in m bits (`k = m/n·ln 2`). */
  def optimalNumHashes(n: Long, m: Long): Int =
    math.max(1, math.round(m.toDouble / math.max(1L, n) * math.log(2)).toInt)

  def hash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  def put(bits: Array[Long], numHashes: Int, s: UTF8String): Unit = {
    val numBits = bits.length.toLong * 64L
    val h = hash(s)
    val h1 = (h & 0xffffffffL)
    val h2 = (h >>> 32)
    var i = 1
    while (i <= numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L))
      i += 1
    }
  }

  /** Membership probe; false positives at ~fpp, never false negatives.
    * Called from generated code (static forwarder), so keep the
    * signature primitive-friendly. */
  def mightContain(bits: Array[Long], numHashes: Int, s: UTF8String): Boolean = {
    val numBits = bits.length.toLong * 64L
    val h = hash(s)
    val h1 = (h & 0xffffffffL)
    val h2 = (h >>> 32)
    var i = 1
    while (i <= numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Build a filter sized for `items` at the target fpp. */
  def build(items: IterableOnce[String], expectedItems: Long,
      fpp: Double = 0.01): BloomFilterBits = {
    val m = optimalNumBits(expectedItems, fpp)
    val words = ((m + 63) / 64).toInt
    val bits = new Array[Long](words)
    val k = optimalNumHashes(expectedItems, words.toLong * 64L)
    items.iterator.foreach(s => put(bits, k, UTF8String.fromString(s)))
    BloomFilterBits(bits, k)
  }
}

/** A built filter: the bit words plus the probe count that built them. */
final case class BloomFilterBits(bits: Array[Long], numHashes: Int) {
  def mightContain(s: String): Boolean =
    BloomUtil.mightContain(bits, numHashes, UTF8String.fromString(s))

  /** Column predicate form, codegen'd ([[BloomMightContain]]). */
  def mightContainCol(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(c), bits, numHashes))
  }
}

/** `bloom_might_contain(str)` over a driver-built bit array: the bits
  * ride the serialized expression to every task (same shipping model as
  * a broadcast literal) and the generated code is one static call — the
  * probe stays inside whole-stage codegen, so the prefilter runs at scan
  * speed before any join machinery sees the row.
  */
case class BloomMightContain(child: Expression, bits: Array[Long],
    numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a string column, got ${child.dataType}")

  override protected def nullSafeEval(v: Any): Any =
    BloomUtil.mightContain(bits, numHashes, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomUtil.mightContain($bitsRef, $numHashes, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
