package graft.ext

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions.intDotProduct

/** Int8 scalar quantization of embedding columns — the standard storage/
  * compute compression for similarity search at corpus scale: a float32
  * embedding table quantized to `array<tinyint>` is 4x narrower in
  * Tungsten rows and shuffle buffers (and correspondingly smaller at
  * rest), and the scoring kernel becomes an exact integer dot product
  * (SIMD int8 instructions on real hardware,
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

  /** Quantize an `array<float|double>` column to `array<tinyint>` in
    * [-127, 127] with symmetric per-vector absmax scaling. All-zero
    * vectors quantize to all-zero (guarding the 0/0 division). Values
    * always fit a signed byte, and `array<tinyint>` is what actually
    * realizes the 4x saving in Tungsten rows and shuffle buffers (an
    * `array<int>` would be as wide as the float32 input).
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
      when(a === 0.0, transform(vec, _ => lit(0).cast("byte")))
        .otherwise(transform(transform(vec, _.cast("double")),
          x => round(x * 127.0 / a).cast("byte"))))
    element_at(bound, 1)
  }

  /** Euclidean norm of an `array<tinyint|int>` column (exact integer sum
    * of squares, then one sqrt). */
  def intNorm(q: Column): Column =
    sqrt(aggregate(q, lit(0L), (a, x) => a + x.cast("long") * x.cast("long"))
      .cast("double"))

  /** Product quantization ANN (Jégou et al., TPAMI'11): the 100 TB-scale
    * companion to [[int8]]. Vectors are L2-normalized, split into `m`
    * subvectors, and each subvector is replaced by the id of its nearest
    * codeword from a per-subspace codebook — dim floats become m small
    * ints (here m bytes: codebooks of ≤ 256 codewords), a 32x compression
    * at m=8 over float32/64-dim.
    *
    * Query scoring is the standard asymmetric-distance (ADC) join: per
    * query, a (sub, code) -> partial-dot table of m*codebookSize entries
    * is broadcast and the compressed corpus — (vec_id, sub, code) rows —
    * equi-joins it and sums partials per (query, vector). No float vector
    * is ever touched at scan time; the corpus side is the compressed
    * table. Since inputs are normalized, the summed partial dots
    * approximate cosine directly.
    *
    * Codebooks are trained driver-side with Lloyd iterations on a
    * DETERMINISTIC hash-ordered sample (same pattern as
    * [[Similarity.ivfTopK]]) — at 100 TB you train the quantizer on a
    * bounded sample, then encode the full corpus in one scan.
    *
    * Approximate/seeded path: recall is spec-gated (QuantizeSpec), no SQL
    * oracle. Returns (qid, vec_id, qcos, rk).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 16, codebookSize: Int = 32, seed: Long = 42L,
      sampleSize: Int = 2000, lloydIters: Int = 8): DataFrame = {
    // ---- driver-side codebook training on a deterministic sample
    // (embeddings cast to double Spark-side so array<float> and
    // array<double> corpora both collect as java.lang.Double)
    val sample = corpus
      .orderBy(graft.ext.Dedup.portableHash32(col("vec_id").cast("string")),
        col("vec_id"))
      .limit(sampleSize)
      .select(transform(col("embedding"), _.cast("double")))
      .collect().map { r =>
        val v = r.getSeq[Double](0).toArray
        val n = math.sqrt(v.map(x => x * x).sum) max 1e-12
        v.map(_ / n)
      }
    require(sample.nonEmpty, "pqTopK: empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"pqTopK: dim $dim not divisible by m=$m")
    val subDim = dim / m
    // a sample smaller than the requested codebook trains a smaller
    // codebook (distinct codewords can't exceed distinct training points)
    val cbSize = codebookSize min sample.length
    val rnd = new Random(seed)
    // codebooks(s)(c) = codeword c of subspace s
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      val subs = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      var cents = rnd.shuffle(subs.indices.toList).take(cbSize)
        .map(subs(_)).toArray
      for (_ <- 0 until lloydIters) {
        val assign = subs.map { v =>
          cents.indices.minBy(c => l2sq(v, cents(c)))
        }
        cents = cents.indices.map { c =>
          val members = subs.indices.filter(assign(_) == c)
          if (members.isEmpty) cents(c)
          else {
            val acc = new Array[Double](subDim)
            members.foreach(i => (0 until subDim).foreach(d => acc(d) += subs(i)(d)))
            acc.map(_ / members.length)
          }
        }.toArray
      }
      cents
    }
    pqAdc(corpus, queries, k, m, codebooks)
  }

  /** PQ with a CLOSED-FORM codebook — codeword `j` of EVERY subspace is
    * subvector `j` of the L2-normalized corpus vector `vec_id == j`
    * (`j < cbSize`) — i.e. Lloyd with zero iterations and designated
    * seeds. No training arithmetic means the whole pipeline — subvector
    * explode, broadcast codebook join, min-struct encode, per-query ADC
    * table, compressed-corpus equi-join, decimal partial sums — is
    * expressible in ANSI SQL, so the driver hash-grades the ADC kernel
    * directly (`ann_pq_adc`) instead of only rows-counting the trained
    * path. [[pqTopK]]'s Lloyd training remains the quality path; both
    * share [[pqAdc]] verbatim.
    */
  def pqTopKFixed(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, cbSize: Int = 16): DataFrame = {
    val sample = corpus
      .filter(col("vec_id") < cbSize)
      .orderBy(col("vec_id"))
      .select(normalized(col("embedding")))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length == cbSize,
      s"pqTopKFixed: expected $cbSize designated vectors, got ${sample.length}")
    val dim = sample(0).length
    require(dim % m == 0, s"pqTopKFixed: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { s =>
      sample.map(_.slice(s * subDim, (s + 1) * subDim))
    }
    pqAdc(corpus, queries, k, m, codebooks)
  }

  /** Encode + score stage shared by [[pqTopK]] and [[pqTopKFixed]]:
    * full-corpus PQ encode against `codebooks`, then the asymmetric-
    * distance (ADC) broadcast equi-join. `codebooks(s)(j)` = codeword `j`
    * of subspace `s`; all codebooks must share one sub-dimension.
    */
  /** Convert an exact nano-unit LONG sum back to value scale as an EXACT
    * decimal. The sum is cast to DecimalType(38,9) first: under Spark's
    * decimal-division precision-loss rule, (38,9)/(10,0) types the quotient
    * decimal(38,9) — wide enough to hold sum_u * 1e-9 exactly (|sum_u| is
    * at most m * 2e9 ~ 2e10 units). Casting (38,0)/(19,0) instead would
    * type it decimal(38,6) and silently round the 9-dp value to 6 dp —
    * a double-rounding bug at 4-dp boundaries. QuantizeSuite asserts the
    * quotient's dataType so a precision-loss regression fails loudly. */
  def adcFinalize(sumU: Column): Column =
    sumU.cast(DecimalType(38, 9)) / lit(1000000000L).cast(DecimalType(10, 0))

  private def pqAdc(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import graft.functions.VectorFunctions.dotProduct
    val cbSize = codebooks(0).length
    val subDim = codebooks(0)(0).length

    // ---- codebook as a broadcastable table: (sub, code, cw, cw2).
    // A per-codeword expression tree (m * codebookSize branches inline)
    // blows past the codegen method-size limit and falls back to
    // interpreted eval; a broadcast equi-join on `sub` keeps everything
    // in whole-stage codegen and scales to any codebook size.
    val spark = corpus.sparkSession
    import spark.implicits._
    val cbRows = for {
      s <- 0 until m; j <- 0 until cbSize
    } yield (s, j, codebooks(s)(j), dotArr(codebooks(s)(j), codebooks(s)(j)))
    val codebook = cbRows.toDF("sub", "code", "cw", "cw2")

    // ---- full-corpus encode: explode each vector into its m subvectors
    // (one scan-local pass), broadcast-join the codebook on `sub`, keep
    // the argmin codeword per (vec_id, sub) via m min-struct aggregates
    // in ONE groupBy(vec_id) (||c||^2 - 2 a·c ranks identically to L2
    // for fixed a). r15 (guide §2): one corpus-linear exchange instead
    // of the previous two (the (vec_id, sub) argmin agg + the quadratic
    // scoring agg below); output is the per-vector CODE ARRAY, so the
    // whole ADC score is computable scan-locally downstream.
    def subvecs(v: Column): Column =
      array((0 until m).map(s => slice(v, lit(s * subDim + 1), lit(subDim))): _*)
    val corpusSubs = corpus
      .select(col("vec_id"), posexplode(subvecs(normalized(col("embedding"))))
        .as(Seq("sub", "sv")))
    val corpusPQ = corpusSubs
      .join(broadcast(codebook), "sub")
      .groupBy(col("vec_id"))
      .agg(min(when(col("sub") === 0, struct(
          (col("cw2") - lit(2.0) * dotProduct(col("sv"), col("cw"))).as("d"),
          col("code").as("c")))).as("b0"),
        (1 until m).map(s => min(when(col("sub") === s, struct(
          (col("cw2") - lit(2.0) * dotProduct(col("sv"), col("cw"))).as("d"),
          col("code").as("c")))).as(s"b$s")): _*)
      .select(col("vec_id"),
        array((0 until m).map(s => col(s"b$s.c")): _*).as("codes"))

    // ---- per-query ADC lookup arrays: pd(sub)(code) = pdot_u, the
    // 9-dp nano-unit LONG partial dot of query subvector `sub` against
    // codeword `code` (exact: decimal(12,9) values are 1e-9 multiples,
    // so the unscaled long is lossless; 9-dp partials make the per-pair
    // sum independent of partition/summation order). The query side is
    // tiny by contract — two small exchanges to assemble the arrays,
    // then ONE broadcast.
    val qTables = queries
      .select(col("vec_id").as("qid"),
        posexplode(subvecs(normalized(col("embedding")))).as(Seq("sub", "sv")))
      .join(broadcast(codebook), "sub")
      .select(col("qid"), col("sub"), col("code"),
        (round(dotProduct(col("sv"), col("cw")), 9)
          .cast(DecimalType(12, 9)) * lit(1000000000L)).cast("long")
          .as("pdot_u"))
    val qArrays = qTables
      .groupBy(col("qid"), col("sub"))
      .agg(transform(array_sort(collect_list(struct(col("code"), col("pdot_u")))),
        x => x.getField("pdot_u")).as("pds"))
      .groupBy(col("qid"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("pds")))),
        x => x.getField("pds")).as("pd"))

    // ---- ADC, scan-local (r15, guide §2.1): each corpus row's code
    // array meets every broadcast query row IN the task and the m-term
    // lookup sum runs as an expression — the old shape's (sub, code)
    // equi-join + groupBy(qid, vec_id) shuffled |corpus| x |queries|
    // partial-sum rows (the suite's only quadratic EXCHANGE; the pair
    // scoring itself is the query's contract). Long nano-unit sum is
    // exact (m partials of |pdot| <= ~2e9 units can never wrap) and
    // summed in ascending-sub order — identical terms, identical total.
    // adcFinalize divides back to value scale as decimal(38,9) (exact;
    // QuantizeSpec asserts the type) before the one double cast. The
    // sum is a FLAT expression tree of 2m element_at lookups (all
    // whole-stage codegen), not a higher-order aggregate/zip_with
    // (interpreted per pair — guide §4).
    val adcSum = (0 until m).map { s =>
      element_at(element_at(col("pd"), s + 1),
        element_at(col("codes"), s + 1) + lit(1))
    }.reduce(_ + _)
    val scored = corpusPQ.crossJoin(broadcast(qArrays))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(adcFinalize(adcSum).cast("double"), 4).as("qcos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("vec_id"))
    scored.select(col("qid"), col("vec_id"), col("qcos"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** L2-normalize an embedding column (double), with a zero-norm guard;
    * the norm is bound once via the 1-element-array wrapper. */
  def normalized(vec: Column): Column = {
    val dv = transform(vec, _.cast("double"))
    val nrm = sqrt(aggregate(dv, lit(0.0), (a, x) => a + x * x))
    val bound = transform(array(greatest(nrm, lit(1e-12))), n =>
      transform(transform(vec, _.cast("double")), x => x / n))
    element_at(bound, 1)
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

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
