package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Levenshtein

/** The BoundLevenshtein optimizer rule: `levenshtein(a,b) <= k` must be
  * rewritten to the early-exit bounded form, with identical results
  * (including null three-valued logic).
  */
class BoundLevenshteinSpec extends SparkSpec {
  GraftFunctions.register(spark)

  // Range-backed (NOT a LocalRelation): filters over a LocalRelation are
  // evaluated away by ConvertToLocalRelation at optimize time, leaving
  // nothing to inspect in the optimized plan.
  private def df = {
    def v(xs: String*) = element_at(
      array(xs.map(x => lit(x).cast("string")): _*), (col("id") + 1).cast("int"))
    spark.range(6).select(
      v("kitten", "kitten", "abc", "abc", null, "").as("a"),
      v("sitting", "kitten", "xyz", null, "xyz", "abcd").as("b"))
  }

  private def boundedCount(q: org.apache.spark.sql.DataFrame): Int =
    q.queryExecution.optimizedPlan.collect { case p => p.expressions.flatMap(
      _.collect { case l: Levenshtein if l.threshold.isDefined => l })
    }.flatten.size

  test("lev <= k rewrites to bounded form and keeps results") {
    val q = df.filter(levenshtein(col("a"), col("b")) <= 3)
    assert(boundedCount(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(q.count() == 3) // kitten/sitting (3), kitten/kitten (0), abc/xyz (3)
  }

  test("all supported orientations rewrite") {
    for (pred <- Seq(
        levenshtein(col("a"), col("b")) < 4,
        lit(3) >= levenshtein(col("a"), col("b")),
        lit(4) > levenshtein(col("a"), col("b")),
        levenshtein(col("a"), col("b")) === 3,
        // long literal: analyzer wraps lev in Cast(..., LongType) — the
        // rule must see through it or exactly these queries keep O(n²)
        levenshtein(col("a"), col("b")) <= lit(3L),
        lit(3L) >= levenshtein(col("a"), col("b")))) {
      val q = df.filter(pred)
      assert(boundedCount(q) == 1, s"$pred not rewritten")
    }
    assert(df.filter(levenshtein(col("a"), col("b")) === 3).count() == 2)
    assert(df.filter(lit(4) > levenshtein(col("a"), col("b"))).count() == 3)
  }

  test("bounded and unbounded agree on every row shape, nulls included") {
    val s = spark
    import s.implicits._
    // evaluate both forms as columns (no filter) and compare row-by-row
    val rows = df.select(
      levenshtein(col("a"), col("b"), 3) >= 0,
      levenshtein(col("a"), col("b")) <= 3
    ).collect()
    rows.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getBoolean(0) == r.getBoolean(1))) }
  }

  test("rule leaves non-threshold and already-bounded forms alone") {
    // plain projection of an unbounded distance must NOT acquire a threshold
    val q = df.select(levenshtein(col("a"), col("b")).as("d"))
    assert(boundedCount(q) == 0)
    // rewriting an already-bounded predicate again would double-wrap
    val q2 = df.filter(levenshtein(col("a"), col("b"), 3) >= 0)
    assert(boundedCount(q2) == 1)
  }
}
