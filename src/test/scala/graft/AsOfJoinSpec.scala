package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** As-of join edge semantics (the oracle covers the bulk; these pin the
  * boundary cases) + SQL registration of the custom dot product.
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: inclusive bound, no-match nulls, latest-wins") {
    val ss = spark
    import ss.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "L1"), // exact-tie with right → match
      (1L, ts("2024-01-01 12:00:00"), "L2"), // two candidates → latest wins
      (2L, ts("2024-01-01 09:00:00"), "L3")  // right exists only later → null
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (2L, ts("2024-01-01 23:00:00"), 9.0)
    ).toDF("k", "t", "rv")
    val got = AsOfJoin.asOf(left, right, "k", "t", "t",
        Seq("t" -> "rt", "rv" -> "rv"))
      .orderBy(col("k"), col("t")).collect()
    assert(got(0).getAs[Double]("rv") == 1.0, "equal-time right row must match (inclusive)")
    assert(got(1).getAs[Double]("rv") == 2.0, "latest preceding right row must win")
    assert(got(2).isNullAt(got(2).fieldIndex("rv")), "no preceding right row → null")
    assert(got(2).isNullAt(got(2).fieldIndex("rt")))
  }

  test("custom AsOfJoinExec matches the composed path on edge cases and fixtures") {
    GraftFunctions.register(spark)
    val ss = spark
    import ss.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "L1"),
      (1L, ts("2024-01-01 12:00:00"), "L2"),
      (2L, ts("2024-01-01 09:00:00"), "L3")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (2L, ts("2024-01-01 23:00:00"), 9.0)
    ).toDF("k", "t", "rv")
    val got = AsOfJoin.asOfExec(left, right, "k", "t", "t",
        Seq("t" -> "rt", "rv" -> "rv"))
      .orderBy(col("k"), col("t")).collect()
    assert(got(0).getAs[Double]("rv") == 1.0, "equal-time right row must match (inclusive)")
    assert(got(1).getAs[Double]("rv") == 2.0, "latest preceding right row must win")
    assert(got(2).isNullAt(got(2).fieldIndex("rv")), "no preceding right row → null")

    // the physical plan is the custom operator, not a window/union
    val planned = AsOfJoin.asOfExec(left, right, "k", "t", "t", Seq("rv" -> "rv"))
    val p = planned.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin") && !p.contains("Window"),
      s"custom exec missing from plan:\n$p")

    // full-fixture equivalence against the oracle-checked composed path
    val ev = graft.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    val composed = AsOfJoin.asOf(purchases, views, "user_id", "ts", "ts",
      Seq("ts" -> "view_ts", "value" -> "view_value"))
    val exec = AsOfJoin.asOfExec(purchases, views, "user_id", "ts", "ts",
      Seq("ts" -> "view_ts", "value" -> "view_value"))
    assert(exec.count() == composed.count())
    assert(exec.exceptAll(composed).isEmpty && composed.exceptAll(exec).isEmpty,
      "custom exec and composed window as-of disagree")
  }

  test("range join in two-table mode keeps pairs regardless of id order") {
    val ss = spark
    import ss.implicits._
    // left ids are HIGHER than right ids — a self-join-style i<j filter
    // would drop every match
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00")))
      .toDF("k", "id", "t")
    val right = Seq((1L, 5L, ts("2024-01-01 10:02:00")))
      .toDF("k", "id", "t")
    val two = graft.ops.RangeJoin.timeWindowPairs(
      left, right, "k", "t", "id", 300, selfJoin = false)
    assert(two.count() == 1, "two-table mode dropped a valid pair")
    val self = graft.ops.RangeJoin.timeWindowPairs(
      left, right, "k", "t", "id", 300)
    assert(self.count() == 0, "self-join mode must apply the i<j dedup")
  }

  test("dot_product is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()(0)
    assert(r.getDouble(0) == 11.0)
    // and over real embedding data
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT a.vec_id, dot_product(a.embedding, a.embedding) AS sq
        |FROM emb a WHERE a.vec_id < 5""".stripMargin).collect()
    assert(n.length == 5 && n.forall(_.getDouble(1) > 0))
  }

  test("winnow is callable from SQL, with and without explicit (k, window)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT winnow('the quick brown fox jumps over the lazy dog') AS fp," +
        " winnow('the quick brown fox jumps over the lazy dog', 8, 6) AS fp2")
      .collect()(0)
    val fp = r.getSeq[Long](0)
    assert(fp.nonEmpty, "winnow returned no fingerprints")
    assert(fp == r.getSeq[Long](1), "default (k=8,window=6) must match explicit")
    // matches the Column API exactly
    val viaCol = spark.range(1).select(
      graft.functions.Winnow.winnow(
        org.apache.spark.sql.functions.lit(
          "the quick brown fox jumps over the lazy dog")).as("fp"))
      .collect()(0).getSeq[Long](0)
    assert(fp == viaCol)
  }

  test("cdc_boundaries is callable from SQL and matches the Column API") {
    GraftFunctions.register(spark)
    val text = "key agg row scan slow fast table value part hash merge batch " * 8
    val r = spark.sql(
      s"SELECT cdc_boundaries('$text') AS b, cdc_boundaries('$text', 8, 64) AS b2")
      .collect()(0)
    assert(r.getSeq[Int](0) == r.getSeq[Int](1),
      "default (k=8, divisor=64) must match explicit")
    val viaCol = spark.range(1).select(
      graft.functions.CdcBoundaries.cdcBoundaries(
        org.apache.spark.sql.functions.lit(text)).as("b"))
      .collect()(0).getSeq[Int](0)
    assert(r.getSeq[Int](0) == viaCol)
  }
}
