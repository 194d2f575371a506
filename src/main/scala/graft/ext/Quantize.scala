package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.intDotProduct

/** Int8 scalar quantization of embedding columns — the standard storage/
  * compute compression for similarity search at corpus scale: a float32
  * embedding table quantized to int8 is 4x smaller at rest, in memory and
  * in shuffle, and the scoring kernel becomes an exact integer dot
  * product (SIMD int8 instructions on real hardware,
  * [[graft.functions.IntDotProduct]] here).
  *
  * Scheme: symmetric per-vector absmax. `scale = max_i |v_i|`,
  * `q_i = round(v_i * 127 / scale)` in [-127, 127]. The approximate
  * cosine of two quantized vectors is `intdot(qa, qb) / (|qa| * |qb|)` —
  * the per-vector scales cancel out of the cosine entirely, so absmax
  * quantization loses only rounding precision, not calibration.
  *
  * Determinism contract (what makes this oracle-checkable bit-for-bit):
  * float->double widening, double mul/div and `round` HALF_UP (= ties
  * away from zero) are IEEE-identical between Spark and DuckDB, so the
  * quantized vectors — and therefore the integer dot products — match
  * the oracle exactly, with no float-tolerance caveats.
  */
object Quantize {

  /** Quantize an `array<float|double>` column to `array<int>` in
    * [-127, 127] with symmetric per-vector absmax scaling. All-zero
    * vectors quantize to all-zero (guarding the 0/0 division).
    *
    * The absmax aggregate is bound ONCE via the 1-element-array transform
    * wrapper: referencing the aggregate expression directly inside the
    * per-element lambda would re-evaluate it per element — O(d^2) per
    * vector (see Dedup.shingles for the same pattern).
    */
  def int8(vec: Column): Column = {
    val dv = transform(vec, _.cast("double"))
    val amax = aggregate(dv, lit(0.0), (a, x) => greatest(a, abs(x)))
    val bound = transform(array(amax), a =>
      when(a === 0.0, transform(vec, _ => lit(0)))
        .otherwise(transform(transform(vec, _.cast("double")),
          x => round(x * 127.0 / a).cast("int"))))
    element_at(bound, 1)
  }

  /** Euclidean norm of an `array<int>` column (exact integer sum of
    * squares, then one sqrt). */
  def intNorm(q: Column): Column =
    sqrt(aggregate(q, lit(0L), (a, x) => a + x.cast("long") * x.cast("long"))
      .cast("double"))

  /** Brute-force top-k over int8-quantized vectors: score every
    * (query, corpus) pair by exact integer dot product, rank by the
    * de-scaled approximate cosine. Same plan shape as
    * [[Similarity.bruteForceTopK]] — the corpus scan stays columnar and
    * whole-stage-codegen'd, queries broadcast — but the hot loop is
    * integer arithmetic over 4x less data.
    *
    * Returns (qid, vec_id, int_dot, qcos, rk), rk = 1..k per qid.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), int8(col("embedding")).as("q"))
      .withColumn("nrm", intNorm(col("q")))
    val q = queries.select(col("vec_id").as("qid"), int8(col("embedding")).as("qq"))
      .withColumn("qn", intNorm(col("qq")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("int_dot", intDotProduct(col("q"), col("qq")))
      .withColumn("qcos",
        round(col("int_dot").cast("double") / (col("nrm") * col("qn")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("vec_id"))
    scored.select(col("qid"), col("vec_id"), col("int_dot"), col("qcos"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }
}
