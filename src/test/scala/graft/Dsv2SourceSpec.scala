package graft

import org.apache.spark.sql.functions._
import graft.sources.Generator

/** DataSource V2 generator table (SURVEY.md §2.1 S1/S8 production
  * mapping): row parity with the expression-based Generator, slice
  * parallelism, and filter/column/limit pushdown reaching the source.
  */
class Dsv2SourceSpec extends SparkSpec {
  private val frozen = "2024-03-05 14:30:00"

  private def dsv2(count: Long, slices: Int = 8) =
    spark.read.format("sample-items")
      .option("count", count)
      .option("slices", slices)
      .option("frozenNow", frozen)
      .option("deterministicIds", true)
      .load()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("DSv2 source matches the Generator expression source row-for-row") {
    val got = dsv2(300).orderBy("i").collect().toSeq
    val want = Generator.sampleItems(spark, 300, Some(frozen),
      deterministicIds = true).orderBy("i").collect().toSeq
    assert(got.size == 300)
    assert(got == want)
  }

  test("planInputPartitions splits the range into `slices` partitions") {
    assert(dsv2(1000, slices = 7).rdd.getNumPartitions == 7)
    // degenerate: fewer rows than slices → one partition per row, not empty splits
    assert(dsv2(3, slices = 8).rdd.getNumPartitions == 3)
  }

  test("LogicalPartition equality pushes down as a residue test") {
    val df = dsv2(300).filter(col("LogicalPartition") === "Partition_B")
    assert(df.count() == 100) // i % 3 == 1 in 1..300
    assert(planOf(df).contains("residues={1}"), planOf(df))
  }

  test("IN-list and range predicates narrow the generated span at the source") {
    val df = dsv2(300).filter(
      col("LogicalPartition").isin("Partition_A", "Partition_C") &&
      col("i") > 250 && col("i") <= 290)
    // i in 251..290 with i%3 != 1 → 40 - 13 = 27 rows
    assert(df.count() == 27)
    val p = planOf(df)
    assert(p.contains("range=[251,290]"), p)
    assert(p.contains("residues={0,2}"), p)
  }

  test("unknown partition value yields an empty scan, not a full generate") {
    val df = dsv2(300).filter(col("LogicalPartition") === "Partition_Z")
    assert(df.count() == 0)
    assert(planOf(df).contains("residues={}"), planOf(df))
  }

  test("column pruning reaches the source") {
    val df = dsv2(100).select("Desc")
    assert(planOf(df).contains("columns=[Desc]"), planOf(df))
    assert(df.distinct().count() == 100)
  }

  test("limit is partially pushed (slice cap) and globally exact") {
    val df = dsv2(1000).limit(5)
    assert(df.count() == 5)
    assert(planOf(df).contains("limit=5"), planOf(df))
  }

  test("production mode (no frozenNow, random ids) yields unique UUIDs") {
    val df = spark.read.format("sample-items").option("count", 50).load()
    val ids = df.select("id").collect().map(_.getString(0))
    assert(ids.distinct.length == 50)
    assert(ids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}")))
  }

  test("production ids are stable across recomputation of the same scan, fresh across scans") {
    // same DataFrame → same scan (same per-scan seed): a recomputed
    // partition must reproduce identical ids (task-retry stability)
    val df = spark.read.format("sample-items").option("count", 40).load()
      .orderBy("i").select("id")
    val first = df.collect().map(_.getString(0)).toSeq
    val second = df.collect().map(_.getString(0)).toSeq
    assert(first == second, "ids changed across re-execution of one scan")
    // a NEW scan mints a new seed: production ids differ across queries
    val other = spark.read.format("sample-items").option("count", 40).load()
      .orderBy("i").select("id").collect().map(_.getString(0)).toSeq
    assert(first != other, "ids unexpectedly constant across scans")
  }

  test("COUNT/MIN/MAX push down completely: closed-form answer, no row generation") {
    val df = dsv2(3000000)
      .filter(col("LogicalPartition") === "Partition_B" && col("i") > 100)
      .agg(count(lit(1)).as("n"), min(col("i")).as("lo"), max(col("i")).as("hi"))
    val p = planOf(df)
    assert(p.contains("GraftSampleItemsAgg"),
      s"aggregation did not reach the source:\n$p")
    val row = df.collect()(0)
    // i in 101..3000000 with i % 3 == 1: first 103, last 2999998
    assert(row.getLong(0) == (2999998L - 103L) / 3 + 1, row.toString)
    assert(row.getLong(1) == 103L && row.getLong(2) == 2999998L, row.toString)
    // completeness cross-check at a size where full generation is cheap
    val small = dsv2(299)
      .filter(col("LogicalPartition").isin("Partition_A", "Partition_C"))
    val fast = small.agg(count(lit(1)), min(col("i")), max(col("i"))).collect()(0)
    val slow = small.collect().map(_.getAs[Long]("i"))
    assert(fast.getLong(0) == slow.length.toLong)
    assert(fast.getLong(1) == slow.min && fast.getLong(2) == slow.max)
  }

  test("aggregate pushdown declines gracefully when it cannot answer exactly") {
    // grouped aggregation: not pushed — the source must still be correct
    val g = dsv2(300).groupBy("LogicalPartition").agg(count(lit(1)).as("n"))
    assert(!planOf(g).contains("GraftSampleItemsAgg"))
    assert(g.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("Partition_A" -> 100L, "Partition_B" -> 100L, "Partition_C" -> 100L))
    // LIMIT composed under the aggregate: closed form would overcount
    val l = dsv2(300).limit(7).agg(count(lit(1)).as("n"))
    assert(!planOf(l).contains("GraftSampleItemsAgg"))
    assert(l.collect()(0).getLong(0) == 7L)
  }
}
