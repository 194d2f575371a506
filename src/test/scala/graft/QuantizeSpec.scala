package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.{Quantize, Similarity}

class QuantizeSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("int8 quantization stays in [-127,127] and hits ±127 at the absmax") {
    val q = emb.select(col("vec_id"), col("embedding"),
      Quantize.int8(col("embedding")).as("q"))
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      val qi = r.getAs[scala.collection.Seq[Byte]]("q")
      assert(qi.length == v.length)
      assert(qi.forall(x => x >= -127 && x <= 127))
      // the absmax element quantizes to exactly ±127
      val iMax = v.indices.maxBy(i => math.abs(v(i).toDouble))
      assert(math.abs(qi(iMax)) == 127,
        s"vec ${r.getAs[Long]("vec_id")}: |q(absmax elem)| = ${qi(iMax)}")
    }
  }

  test("all-zero vectors quantize to all-zero (0/0 guard)") {
    val z = spark.range(1).select(
      Quantize.int8(array(lit(0.0f), lit(0.0f), lit(0.0f))).as("q"))
    assert(z.head.getAs[scala.collection.Seq[Byte]]("q") == Seq[Byte](0, 0, 0))
  }

  test("int dot product matches a driver-side exact computation") {
    val two = emb.orderBy(col("vec_id")).limit(2)
      .select(Quantize.int8(col("embedding")).as("q")).collect()
    val (a, b) = (two(0).getAs[scala.collection.Seq[Byte]]("q"), two(1).getAs[scala.collection.Seq[Byte]]("q"))
    val expected = a.zip(b).map { case (x, y) => x.toLong * y }.sum
    val got = spark.range(1).select(
      graft.functions.VectorFunctions.intDotProduct(
        array(a.toSeq.map(lit(_)): _*), array(b.toSeq.map(lit(_)): _*)).as("d"))
      .head.getAs[Long]("d")
    assert(got == expected)
  }

  test("quantized top-5 recalls >= 80% of exact float top-5") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Quantize.quantizedTopK(emb, queries, k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall vs float top-5 = $recall")
  }

  test("PQ ADC top-5 recalls a useful fraction of exact top-5 and is deterministic") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Quantize.pqTopK(emb, queries, k = 5)
    val got = pq.select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.25, s"PQ recall vs float top-5 = $recall")
    // seeded codebooks + hash-ordered sample: rerun must be identical
    val again = Quantize.pqTopK(emb, queries, k = 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == again, "PQ result changed between runs")
    // every query returns exactly k ranked rows with qcos in [-1-eps, 1+eps]
    val rows = pq.collect()
    assert(rows.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
    assert(rows.forall(r => math.abs(r.getAs[Double]("qcos")) <= 1.05))
  }

  test("pqTopKFixed: closed-form codebook encodes designated vectors to their own code") {
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val fixed = Quantize.pqTopKFixed(emb, queries, k = 5)
    val rows = fixed.collect()
    // exactly k ranked rows per query, sane cosine range
    assert(rows.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 5))
    assert(rows.forall(r => math.abs(r.getAs[Double]("qcos")) <= 1.05))
    // vec 0 is both a query and a codeword source: every codeword j is
    // subvector j of vector j, and d(sv, cw) = |cw|^2 - 2 sv·cw is
    // strictly minimal at cw == sv (Cauchy), so the ADC score of a
    // designated vector against ITSELF as query would be its exact
    // normalized self-dot ≈ 1; its top hit must therefore score near the
    // exact-cosine top hit of the float path
    val exactTop = Similarity.bruteForceTopK(emb, queries, k = 1)
      .filter(col("qid") === 0).head.getAs[Double]("cos")
    val pqTop = fixed.filter(col("qid") === 0 && col("rk") === 1)
      .head.getAs[Double]("qcos")
    assert(pqTop <= 1.0001 && pqTop >= exactTop - 0.5,
      s"fixed-codebook ADC top score $pqTop implausible vs exact $exactTop")
    // the ADC join is broadcast equi-join machinery — never a cartesian
    val plan = fixed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in ADC plan:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"expected broadcast codebook/ADC join:\n$plan")
  }

  test("adcFinalize quotient stays DecimalType(38,9) — no precision-loss rounding") {
    import org.apache.spark.sql.types.DecimalType
    val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(123449999L), Row(-987654321L)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("su",
            org.apache.spark.sql.types.LongType))))
      .select(Quantize.adcFinalize(col("su")).as("q"))
    assert(df.schema("q").dataType === DecimalType(38, 9),
      s"ADC finalize quotient regressed to ${df.schema("q").dataType}: " +
        "a narrower scale silently rounds the exact 9-dp sum before round(...,4)")
    // 123449999 nano-units is exactly 0.123449999: a 6-dp intermediate would
    // round it to 0.123450 and then round(...,4) to 0.1235 instead of 0.1234.
    val got = df.select(round(col("q").cast("double"), 4))
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(0.1234, -0.9877), s"double-rounding regression: $got")
  }

  test("quantizedTopK broadcasts the query side (no shuffle for the join)") {
    val plan = Quantize.quantizedTopK(emb, emb.filter(col("vec_id") % 100 === 0), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }
}
