package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Codegen'd dot product over two `array<float>` / `array<double>` columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)` —
  * runs INTERPRETED lambdas: per row it allocates a zipped array and boxes
  * every element. On the ANN/near-dup paths that is millions of
  * allocations per second of query time. This expression generates a
  * primitive `double` loop inside whole-stage codegen: no allocation, no
  * boxing, SIMD-friendly.
  *
  * Numeric contract: elements are widened to double and accumulated
  * sequentially left-to-right — EXACTLY the fold order of both the
  * built-in `aggregate` and DuckDB's `list_sum(list_transform(...))`, so
  * results are bit-identical with the oracle (graft.queries.Extensions).
  *
  * Precondition: array elements are non-null (embedding fixtures have no
  * null elements); length = min(len(a), len(b)).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd EXACT dot product over two `array<tinyint|int>` columns,
  * returning `long`. This is the scoring kernel of int8-quantized
  * similarity search: products of values in [-127, 127] summed over any
  * realistic dimensionality stay far below 2^63, so the result is exact
  * integer arithmetic — no float summation order to worry about, and the
  * oracle compares it bit-for-bit. On real hardware this loop is what
  * SIMD int8 dot instructions accelerate; with `array<tinyint>` inputs
  * (see [[graft.ext.Quantize.int8]]) the quantized corpus is genuinely
  * 4x narrower than float32 in Tungsten rows and shuffle buffers.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(ByteType, _) | ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int_dot_product expects array<tinyint|int>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lb = elemType(left) == ByteType
    val rb = elemType(right) == ByteType
    var s = 0L
    var i = 0
    while (i < n) {
      val xv = if (lb) x.getByte(i).toLong else x.getInt(i).toLong
      val yv = if (rb) y.getByte(i).toLong else y.getInt(i).toLong
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == ByteType) "getByte" else "getInt"
    val getR = if (elemType(right) == ByteType) "getByte" else "getInt"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements() < $b.numElements() ? $a.numElements() : $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.$getL($i)) * ((long) $b.$getR($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API for [[DotProduct]] (Spark 4 classic Column↔Expression bridge). */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[IntDotProduct]]. */
  def intDotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      IntDotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
