package graft

import org.apache.spark.sql.functions._

/** Gates for the approximate queries that have no SQL oracle. */
class ApproxSpec extends SparkSpec {

  test("approx_distinct is within 5% of exact distinct counts") {
    val row = SparkEntry.queries("approx_distinct")(spark, sf).collect()(0)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exactParts = li.select("l_partkey").distinct().count()
    val exactOrders = li.select("l_orderkey").distinct().count()
    def within(est: Long, exact: Long): Boolean =
      math.abs(est - exact).toDouble / exact < 0.05
    assert(within(row.getAs[Long]("approx_parts"), exactParts))
    assert(within(row.getAs[Long]("approx_orders"), exactOrders))
    // percentile sketch within 2% of the exact quantiles
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5, 0.99), 0.0)
    assert(math.abs(row.getAs[Double]("median_price") - exact(0)) / exact(0) < 0.02)
    assert(math.abs(row.getAs[Double]("p99_price") - exact(1)) / exact(1) < 0.02)
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
