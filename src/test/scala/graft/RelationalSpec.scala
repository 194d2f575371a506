package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant checks for the relational suite at sf0.001.
  * The hard correctness gate is the driver's DuckDB hash compare
  * (tools/compare_oracle.py locally); these tests pin structural
  * invariants that survive refactors.
  */
class RelationalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("every query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet),
      s"oracle keys without queries: ${SparkEntry.oracleSql.keySet -- qs.keySet}")
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg groups and sums are exact") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == liCount)
  }

  test("q6_window_topn emits at most 3 rows per customer, rn in 1..3") {
    val df = SparkEntry.queries("q6_window_topn")(spark, sf)
    val bad = df.groupBy(col("o_custkey")).count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() == 0)
  }

  test("q9_set_ops tags are disjoint") {
    val df = SparkEntry.queries("q9_set_ops")(spark, sf)
    val dup = df.groupBy(col("o_custkey")).agg(countDistinct(col("tag")).as("nt"))
      .filter(col("nt") > 1).count()
    assert(dup == 0, "a custkey appeared as both 'both' and 'f_only'")
  }

  test("q16_outer_join preserves all customers") {
    val df = SparkEntry.queries("q16_outer_join")(spark, sf)
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(df.count() == nCust)
  }

  test("events_forward_fill carries the last non-null and leaves leading nulls") {
    val df = SparkEntry.queries("events_forward_fill")(spark, sf)
    // non-null observations pass through unchanged
    assert(df.filter(col("v").isNotNull && col("v") =!= col("v_filled"))
      .count() == 0)
    // the planted nulls exist and (almost) all get repaired; a null fill
    // is only legal before a user's first observation
    val nulls = df.filter(col("v").isNull)
    assert(nulls.count() > 0, "no nulls planted — fill never exercised")
    assert(nulls.filter(col("v_filled").isNotNull).count() > 0,
      "carry-forward never fired")
    val wMin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "error", lit(null).cast("double"))
          .otherwise(col("value")).as("v"))
      .withColumn("seen", count(col("v")).over(wMin))
    val leading = ev.filter(col("v").isNull && col("seen") === 0)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val unfilled = df.filter(col("v_filled").isNull)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(unfilled == leading,
      s"unfilled rows ${unfilled.size} != leading-null rows ${leading.size}")
  }

  test("events_ewma matches the hand-computed dyadic kernel on a tiny stream") {
    // values 1.00, 2.00, 3.00 -> ewma: 1, (1+2*2)/3, (1+2*2+3*4)/7
    import java.sql.Timestamp
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:01"), 9L, "view", 1.00, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:02"), 9L, "view", 2.00, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 00:00:03"), 9L, "view", 3.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("ewma").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("events_ewma")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == 1.0)
    assert(got(2L) == 8192000.0 / 4915200.0, s"got ${got(2L)}") // 5/3
    assert(got(3L) == 13926400.0 / 5734400.0, s"got ${got(3L)}") // 17/7
  }

  test("q76_integrity counts planted violations exactly") {
    import java.sql.Timestamp
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("integ").toString
    // customer 1..3, with custkey 2 DUPLICATED once
    Seq(1L, 2L, 2L, 3L).map(k => (k, s"c$k", 0, 1.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // orders 10..13; order 13 references missing customer 9; one null date
    Seq((10L, 1L, Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
        (11L, 2L, Some(Timestamp.valueOf("2024-01-02 00:00:00"))),
        (12L, 3L, None),
        (13L, 9L, Some(Timestamp.valueOf("2024-01-03 00:00:00"))))
      .map { case (ok, ck, d) => (ok, ck, "O", 1.0, d.orNull, "P") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // lineitems: one orphan (order 99), one duplicated (10, 1) pk
    Seq((10L, 1), (10L, 1), (11L, 1), (99L, 1))
      .map { case (ok, ln) => (ok, 1L, 1L, ln, 1.0, 1.0, 0.0, 0.0,
        "N", "O", Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q76_integrity")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("orphan_orders" -> 1L, "orphan_lineitems" -> 1L,
      "dup_custkey" -> 1L, "dup_lineitem_pk" -> 1L, "null_orderdate" -> 1L))
  }

  test("events_autocorr returns a valid correlation and exact pair accounting") {
    val row = SparkEntry.queries("events_autocorr")(spark, sf).collect()(0)
    val (n, np, r) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(np == math.max(0L, n - 7),
      s"dense daily fixture should pair all but 7 days: $np vs ${n - 7}")
    assert(r >= -1.0000001 && r <= 1.0000001, s"r7 $r outside [-1, 1]")
  }
}
