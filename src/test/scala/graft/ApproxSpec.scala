package graft

import org.apache.spark.sql.functions._

/** Gates for the approximate queries that have no SQL oracle. */
class ApproxSpec extends SparkSpec {

  test("approx_distinct reports exact counts and in-tolerance estimates") {
    // the query itself now carries the estimate-vs-exact comparison (the
    // oracle expects every within-tol flag TRUE); the spec re-checks the
    // exact side independently and that the flags came out true
    val row = SparkEntry.queries("approx_distinct")(spark, sf).collect()(0)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(row.getAs[Long]("exact_parts") ==
      li.select("l_partkey").distinct().count())
    assert(row.getAs[Long]("exact_orders") ==
      li.select("l_orderkey").distinct().count())
    Seq("parts_within_tol", "orders_within_tol").foreach(c =>
      assert(row.getAs[Boolean](c), s"$c is false"))
  }

  test("percentile_approx sketch is within 2% of the exact quantiles") {
    // the exact reference is a single-reducer O(n) collect, so it lives
    // here (small fixture) and not in the approx_distinct query
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val sketch = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)))
      .collect()(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5, 0.99), 0.0)
    assert(math.abs(sketch.getDouble(0) - exact(0)) / exact(0) < 0.02)
    assert(math.abs(sketch.getDouble(1) - exact(1)) / exact(1) < 0.02)
  }

  test("corpus_sketch_union: all in-tolerance; union row covers every source") {
    val rows = SparkEntry.queries("corpus_sketch_union")(spark, sf).collect()
    assert(rows.forall(_.getAs[Boolean]("within_tol")),
      "an HLL estimate left the 6% tolerance band")
    val all = rows.filter(_.getAs[String]("source") == "(all)")
    assert(all.length == 1)
    val perMax = rows.filter(_.getAs[String]("source") != "(all)")
      .map(_.getAs[Long]("exact_distinct")).max
    // union distinct >= any single source's distinct (set monotonicity)
    assert(all.head.getAs[Long]("exact_distinct") >= perMax)
  }

  test("hll sketch union estimate is merge-order robust (sub-percent drift)") {
    // NOT bit-stable: the HIP estimator inside the union gadget is
    // stream-order sensitive (measured 502 vs 500 on this fixture), so
    // the estimate may wobble with partitioning. The contract the
    // within_tol flags rely on is that the wobble stays far inside the
    // 6% band — assert <= 1% here.
    val d0 = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text"))
    def unionEst(parts: Int): Long = d0.repartition(parts)
      .groupBy(col("source")).agg(hll_sketch_agg(col("text")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .first().getLong(0)
    val (a, b) = (unionEst(1), unionEst(17))
    assert(math.abs(a - b).toDouble / math.max(a, b) <= 0.01,
      s"union estimate drifted >1% with merge order: $a vs $b")
  }

  test("ann_lsh_topk emits ranked neighbors per query with valid structure") {
    val df = SparkEntry.queries("ann_lsh_topk")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Int]("rk") >= 1 && r.getAs[Int]("rk") <= 5))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0001))
    // per query: ranks are 1..n without gaps, cosines non-increasing
    df.collect().groupBy(_.getAs[Long]("qid")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to g.length).toSeq)
      val cosines = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cosines == cosines.sorted.reverse, "cosines not non-increasing by rank")
    }
  }
}
