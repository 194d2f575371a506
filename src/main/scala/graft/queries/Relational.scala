package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Relational operator surface: scans, filters, projections, hash/sort
  * aggregation, inner/semi/anti joins, broadcast joins, windows, sorts,
  * limits, set ops, rollup/cube, having — all Catalyst built-ins per
  * SURVEY.md §2.3–§2.7 (the reference has none of these; they're the
  * engine's relational capability layer, oracle-checked against DuckDB).
  *
  * Scale notes (100 TB): every aggregate uses exact DECIMAL math (see
  * [[graft.Tables]]) so map-side partial aggregation stays correct and
  * results are partition-order-independent. Dimension tables (region,
  * nation, supplier at these ratios) are broadcast explicitly; fact-fact
  * joins are left to Catalyst/AQE (sort-merge with shuffle on join keys).
  */
object Relational {
  private val D = "double"

  /** Exact revenue term: extendedprice * (1 - discount), 4-dp decimal. */
  private def revTerm = (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
    .cast(DecimalType(18, 4))
  private val revSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TPC-H Q1 shape: scan → filter → hash agg (map-side partial) → sort
    "q1_agg" -> ((s, dir) => {
      // TWO-PHASE INTEGER-CENTS AGGREGATION, decimal finalization. The
      // r8 sweep measured a long-cents sum ~5x cheaper per row than
      // DECIMAL(18,2) accumulation but kept decimal for overflow
      // headroom; this form takes the cheap accumulate AND the
      // headroom. Phase 1 groups by (flag, status, partition id) and
      // sums exact integer units in LONGs via try_sum — values are
      // 2-decimal money, so cents (1e-2), discounted price in 1e-4
      // units, and charge in 1e-6 units are all exact integers. The
      // partition id is taken AFTER tf's round-robin fanout, whose
      // width is cores-derived, NOT data-derived — so per-partition
      // rows GROW with input size and a Long partial is only safe
      // while rows/partition stays under ~9e7 (charge is the tightest
      // term at ~1e11/row). try_sum turns a wrap into NULL instead of
      // a silent wrong sum, and the assert_true gate below raises
      // before phase 2 can publish — a too-big partition fails loudly
      // and the caller re-runs with the all-decimal form or a wider
      // fanout. Phase 2 re-sums the per-partition partials as
      // DECIMAL(38,0) — exact at any scale — and divides back to
      // money scale BEFORE the double cast, so published values are
      // bit-identical to the all-decimal form (same exact rational,
      // same one rounding to double).
      // t, NOT tf (r14): integer-cents made the per-row work ~20 int
      // ops, so the round-robin pre-balance was a full-table round
      // trip to parallelize arithmetic cheaper than the shuffle write
      // itself — in-session interleaved A/B (FanoutAB protocol,
      // min-of-3): fanout 0.485s vs plain 0.258s at sf0.1. The Long
      // partial is GATED, not bounded (r15, ADVICE): for MULTI-row-group
      // parquet, maxPartitionBytes caps rows/partition (~1e6 at this row
      // width → the tightest term, charge at ~1e11/row, peaks ~1e17 per
      // partial, 90x inside Long range); but parquet splits assign whole
      // row groups, so a large SINGLE-row-group file lands in one
      // partition and the bound does not hold — there the try_sum +
      // assert_true gate ABORTS loudly rather than publishing a wrapped
      // sum, and the caller re-runs with the all-decimal form or a
      // wider fanout. Never silently wrong; aborts on degenerate files.
      val cents = (c: Column) => round(c * 100).cast("long") // exact for 2-dec doubles
      val dp4 = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
      val ch6 = dp4 * (lit(100L) + cents(col("l_tax")))
      val d38 = (c: Column) => sum(c.cast(DecimalType(38, 0)))
      val fin = (c: Column, unit: Int) =>
        (d38(c) / lit(unit).cast(DecimalType(9, 0))).cast(D)
      val part = t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("_p"))
        .agg(try_sum(cents(col("l_quantity"))).as("_q"),
          try_sum(cents(col("l_extendedprice"))).as("_ep"),
          try_sum(dp4).as("_dp"), try_sum(ch6).as("_ch"),
          try_sum(cents(col("l_discount"))).as("_d"),
          count(lit(1)).as("_n"))
      // loud overflow gate: inputs are non-null, so a NULL partial can
      // only mean a try_sum Long wrap — refuse to publish. The guard
      // lives in a Filter condition so column pruning cannot drop it.
      part.filter(assert_true(
          col("_q").isNotNull && col("_ep").isNotNull && col("_dp").isNotNull &&
            col("_ch").isNotNull && col("_d").isNotNull,
          lit("q1_agg: integer-cents Long partial overflowed " +
            "(rows per partition exceeded the safe bound)")).isNull)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          fin(col("_q"), 100).as("sum_qty"),
          fin(col("_ep"), 100).as("sum_base_price"),
          fin(col("_dp"), 10000).as("sum_disc_price"),
          fin(col("_ch"), 1000000).as("sum_charge"),
          (fin(col("_q"), 100) / sum(col("_n"))).as("avg_qty"),
          (fin(col("_ep"), 100) / sum(col("_n"))).as("avg_price"),
          (fin(col("_d"), 100) / sum(col("_n"))).as("avg_disc"),
          sum(col("_n")).as("count_order"))
        .transform(graft.Tables.ordered(col("l_returnflag"), col("l_linestatus")))
    }),

    // ---- TPC-H Q6 shape: tight filter (all predicates push to parquet) → scalar agg
    "q2_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum((dec(col("l_extendedprice")) * dec(col("l_discount"))).cast(DecimalType(18, 4)))
            .cast(D).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- TPC-H Q3 shape: 3-way join → agg → top-k (deterministic tiebreak)
    "q3_join_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(revTerm).cast(D).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- TPC-H Q4 shape: EXISTS → left-semi join, group, sort
    "q4_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .transform(graft.Tables.ordered(col("o_orderpriority")))
    }),

    // ---- TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffle on keys
    "q5_multi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      l.join(o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(revTerm).cast(D).as("revenue"))
        .transform(graft.Tables.ordered(col("revenue").desc, col("n_name")))
    }),

    // ---- window: row_number per customer, top-3 orders by price
    "q6_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .transform(graft.Tables.ordered(col("o_custkey"), col("rn")))
    }),

    // ---- windows: rank + lag + running exact sum over per-customer order history
    "q7_window_running" -> ((s, dir) => {
      val wo = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(wo).as("rnk"),
          lag(col("o_orderkey"), 1).over(wo).as("prev_orderkey"),
          sum(dec(col("o_totalprice"))).over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(D).as("running_spend"))
        .transform(graft.Tables.ordered(col("o_custkey"), col("rnk")))
    }),

    // ---- global sort + limit (TakeOrderedAndProject — no full sort at scale)
    "q8_sort_limit" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // ---- set ops: intersect + except + union, tagged
    // ---- MULTISET set ops: EXCEPT ALL / INTERSECT ALL keep per-row
    // multiplicities (a customer with 3 'F' and 1 'O' order survives
    // except-all twice) — semantics DISTINCT set ops cannot express
    "q50_set_ops_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      a.exceptAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_excess"))
        .unionByName(
          a.intersectAll(b).groupBy(col("o_custkey"))
            .agg((count(lit(1)) * -1).as("n_excess")))
        .transform(graft.Tables.ordered(col("o_custkey"), col("n_excess")))
    }),

    // ---- unpivot (inverse of q23's pivot): wide per-status totals back
    // to (priority, status, total) rows via stack — the melt operation
    "q51_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(D).as("total_f"),
          sum(when(col("o_orderstatus") === "O", dec(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(D).as("total_o"))
      wide.unpivot(
          Array(col("o_orderpriority")),
          Array(col("total_f"), col("total_o")),
          "status", "total")
        .withColumn("status", upper(substring(col("status"), -1, 1)))
        .transform(graft.Tables.ordered(col("o_orderpriority"), col("status")))
    }),

    "q9_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
      a.intersect(b).select(lit("both").as("tag"), col("o_custkey"))
        .unionByName(a.except(b).select(lit("f_only").as("tag"), col("o_custkey")))
        .orderBy(col("tag"), col("o_custkey"))
    }),

    // ---- distinct aggregation (expand + two-phase agg under the hood)
    "q10_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    }),

    // ---- rollup with grouping sets (null grouping rows coalesced for parity)
    "q11_rollup" -> ((s, dir) => {
      // PRE-AGGREGATE, then rollup the 6-row aggregate: rollup plans
      // as Expand x(levels) BEFORE the partial aggregate, so the naive
      // form triples the 600k-row stream (and at 100 TB triples the
      // shuffle). Decimal sums and counts are associative, so rolling
      // up the per-(flag, status) exact sums is value-identical — the
      // Expand now multiplies 6 rows, and the corpus pays ONE ordinary
      // map-side-combinable aggregation
      // integer-cents base (see q1_agg): try_sum long partials per
      // scan partition with the same loud assert_true overflow gate
      // (a wrap must raise, not publish), decimal finalization after
      // the rollup. t, not tf — same r14 fanout A/B as q1_agg: the
      // per-row work is a couple of integer ops, so the round-robin
      // pre-balance cost more than the aggregation it spread.
      val base = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("_p"))
        .agg(try_sum(round(col("l_quantity") * 100).cast("long")).as("_sq"),
          count(lit(1)).as("_n"))
        .filter(assert_true(col("_sq").isNotNull,
          lit("q11_rollup: integer-cents Long partial overflowed " +
            "(rows per partition exceeded the safe bound)")).isNull)
      base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg((sum(col("_sq").cast(DecimalType(38, 0))) /
            lit(100).cast(DecimalType(9, 0))).cast(D).as("sum_qty"),
          sum(col("_n")).as("n"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("sum_qty"), col("n"))
        .transform(graft.Tables.ordered(col("returnflag"), col("linestatus")))
    }),

    // ---- cube
    "q12_cube" -> ((s, dir) => {
      // pre-aggregated like q11_rollup: Expand x4 applies to the
      // 15-row (status, priority) aggregate, not the orders stream
      val base = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("_n"), sum(dec(col("o_totalprice"))).as("_t"))
      base.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("_n")).as("n"), sum(col("_t")).cast("double").as("total"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .transform(graft.Tables.ordered(col("status"), col("priority")))
    }),

    // ---- group + having
    "q13_having" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"), davg(col("p_retailprice")).as("avg_price"))
        .filter(col("n_parts") > 5)
        .transform(graft.Tables.ordered(col("p_brand")))
    }),

    // ---- anti join: customers with no 'P'-status orders
    "q14_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .transform(graft.Tables.ordered(col("c_custkey")))
    }),

    // ---- scalar expression sampler: case/when, string fns, date parts, arithmetic
    "q15_scalar_fns" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 3, 20)).as("prio_word"),
          concat(lit("ord#"), col("o_orderkey").cast("string")).as("tag"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          when(col("o_totalprice") > 150000, "big")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("small").as("size_class"),
          (dec(col("o_totalprice")) % 97).cast(D).as("price_mod"),
          abs(col("o_custkey") - lit(1000)).as("key_dist"),
          length(col("o_orderpriority")).as("prio_len"))
        .transform(graft.Tables.ordered(col("o_orderkey")))
    }),

    // ---- left outer join + null handling
    "q16_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("spend"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("spend"))
        .transform(graft.Tables.ordered(col("c_custkey")))
    }),

    // ---- event-time tumbling window aggregation (batch twin of the
    // streaming `groupBy(window($"ts", "1 hour"))` plan)
    "q18_events_hourly" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"),
          countDistinct(col("user_id")).as("n_users"))
        .transform(graft.Tables.ordered(col("hour"), col("event_type")))
    }),

    // ---- HOPPING (sliding) window aggregation: 2-hour windows sliding
    // every hour — each event lands in exactly 2 overlapping windows via
    // Spark's window() generator (epoch-aligned starts). The batch twin
    // of `groupBy(window($"ts", "2 hours", "1 hour"))` in streaming;
    // the oracle replays the window membership by exploding j in {0,1}.
    "q77_hopping" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        // explicit on BOTH sides: Spark's window() silently drops null
        // timestamps; the oracle must not count them under a NULL window
        .filter(col("ts").isNotNull)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n"), col("total"))
        .transform(graft.Tables.ordered(col("w_start"), col("event_type")))
    }),

    // ---- rate-anomaly detection: hours whose event count exceeds that
    // type's mean + 2σ. Hourly counts and the moment sums are exact
    // integers; mean/σ/z are single IEEE expressions of those sums,
    // written token-for-token in the oracle, so the flags and z-scores
    // hash-match. Per-type stats are a tiny broadcast side.
    "events_anomaly" -> ((s, dir) => {
      val hourly = graft.Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy(col("event_type"))
        .agg(sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"),
          count(lit(1)).as("k"))
      hourly.join(broadcast(stats), Seq("event_type"))
        .withColumn("mean", col("s1").cast("double") / col("k"))
        .withColumn("sigma",
          sqrt(col("s2").cast("double") / col("k") - col("mean") * col("mean")))
        .filter(col("sigma") > 0 &&
          col("n") > col("mean") + lit(2.0) * col("sigma"))
        .select(col("event_type"), col("hour"), col("n"),
          round((col("n") - col("mean")) / col("sigma"), 4).as("z"))
        .transform(graft.Tables.ordered(col("event_type"), col("hour")))
    }),

    // ---- per-user exponential smoothing, engine-portable: the
    // textbook EWMA recursion s_t = a*x_t + (1-a)*s_{t-1} is an
    // unbounded order-dependent float chain no two engines replay
    // bit-identically. This is the truncated dyadic kernel instead:
    // a 16-step window of EXACT integer cent values weighted by
    // 2^15..2^0 (newest first) — pure integer arithmetic until one
    // final presentation divide, window partitioned per user (never
    // global), weights renormalized during ramp-up
    "events_ewma" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-15, 0)
      graft.Tables.events(s, dir)
        // null values are EXCLUDED from the smoothing stream on both
        // sides (Spark's collect_list drops nulls while DuckDB's list()
        // keeps them — filtering is the only shared semantics); null ts
        // likewise, because the window ORDER BY would place them
        // nulls-first in Spark but nulls-last in DuckDB
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          (col("value").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("c"))
        .withColumn("xs", collect_list(col("c")).over(w))
        .select(col("event_id"), col("user_id"),
          (expr("""aggregate(
              transform(xs, (x, i) ->
                x * shiftleft(cast(1 as bigint), 16 - size(xs) + i)),
              cast(0 as bigint), (a, b) -> a + b)""").cast("double") /
            (expr("""shiftleft(cast(1 as bigint), 16)
                - shiftleft(cast(1 as bigint), 16 - size(xs))""")
              .cast("double") * 100.0)).as("ewma"))
        .transform(graft.Tables.ordered(col("user_id"), col("event_id")))
    }),

    // ---- forward-fill (last-observation-carried-forward): sensor-style
    // null repair per user via IGNORE NULLS last_value over the natural
    // user_id partitioning — nulls planted deterministically on 'error'
    // rows so the carry-forward provably fires. Values pass through
    // untouched, so the doubles hash bit-for-bit.
    "events_forward_fill" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("v"), col("v_filled"))
        .transform(graft.Tables.ordered(col("user_id"), col("event_id")))
    }),

    // ---- lag-7 autocorrelation of the daily event count (weekly
    // seasonality readout). Daily counts, their moment sums, and the
    // aligned-pair cross sums are all exact longs. ONE pipeline: the
    // lag-7 partner rides a [-7,-7] range-frame window over the DAILY
    // GRID (calendar-bounded, single partition — the grid-window
    // contract of lowerMedianOfGrid), pairing x(d) with x(d-7) exactly
    // when that date exists, so every moment sum folds into one final
    // aggregate — no self-join, no 1-row crossJoin broadcast builds
    // (census: 3 jobs / 7 stages -> 1 job). r is one fixed IEEE chain
    // over the exact sums, mirrored token-for-token in the oracle.
    "events_autocorr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = graft.Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
        .withColumn("_dn", unix_date(col("d")))
      // the count published exactly 7 days earlier (null on a gap): a
      // [-7,-7] range frame holds 0 or 1 rows, so max() IS the value
      val w = Window.orderBy(col("_dn")).rangeBetween(-7, -7)
      val xb = col("s1").cast("double") / col("n")
      daily.withColumn("_a", max(col("x")).over(w))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          count(col("_a")).as("np"), sum(col("_a") * col("x")).as("c"),
          sum(col("_a")).as("sh"),
          sum(when(col("_a").isNotNull, col("x"))).as("st"))
        .select(col("n").as("n_days"), col("np").as("n_pairs"),
          round(((col("c").cast("double") - xb * (col("sh") + col("st")) +
            col("np") * (xb * xb)) /
            (col("s2").cast("double") - xb * col("s1"))), 6).as("r7"))
    }),

    // ---- EXACT median time-to-convert (first view → first later
    // purchase, whole seconds): the funnel's latency readout with the
    // same sort-free grid-CDF order statistic as quality_mad_outliers —
    // the per-user delta table collapses to its distinct-seconds grid,
    // nothing corpus-sized sorts.
    "events_convert_median" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      // each user's first view rides a user-partitioned window instead
      // of a separate view-table join: the per-user aggregate and the
      // purchase filter then share ONE user_id shuffle (census: 2 jobs
      // / 6 stages -> 1 job — the join's broadcast-build job is gone,
      // and at scale there is no per-user build side to broadcast or
      // shuffle a second time)
      val wu = Window.partitionBy(col("user_id"))
      val p = ev
        .withColumn("v_ts",
          min(when(col("event_type") === "view", col("ts"))).over(wu))
        .filter(col("event_type") === "purchase" && col("ts") > col("v_ts"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("p_ts"), min(col("v_ts")).as("v_ts"))
      val deltas = p.select(
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
          .cast("long")).as("_um"))
        .selectExpr("_um div 1000000 AS _s")
      // ONE funnel pipeline: the delta table collapses to its
      // distinct-seconds grid once, and the user count is the grid's
      // total weight — it rides the median selection's existing 1-row
      // aggregate instead of re-running the view⋈purchase join for a
      // count
      graft.ext.TextOps.lowerMedianOfGrid(
          deltas.groupBy(col("_s")).agg(count(lit(1)).as("_c")))
        .select(col("_n").as("n_users"), col("_med").as("median_s"))
    }),

    // ---- time-series similarity search (EDBT'19 theme, PAPERS.md):
    // users whose hour-of-day activity SHAPE matches. Clipped-PAA
    // 6-bit word = the LSH-style block (equi-join key), exact L1 runs
    // only within blocks, and the threshold is relative to the pair's
    // combined mass (exact integers, scale-free). Posting-list pair
    // emission — never an all-pairs series join.
    "events_series_neighbors" -> ((s, dir) => {
      graft.ext.TimeSeries.saxNeighbors(
          graft.Tables.events(s, dir), relTenths = 2)
        .transform(graft.Tables.ordered(col("k1"), col("k2")))
    }),

    // ---- semi-structured JSON extraction from a string column
    "q19_events_json" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .transform(graft.Tables.ordered(col("k_bucket")))
    }),

    // ---- sessionization: 30-minute inactivity gap via lag window
    "q20_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapped = graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          lag(col("ts"), 1).over(byUser).as("prev_ts"))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
      gapped
        .withColumn("session_seq", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .transform(graft.Tables.ordered(col("user_id"), col("session_seq")))
    }),

    // ---- built-in session_window grouping (the declarative form of q20's
    // gaps-and-islands; identical sessions, streaming-ready — the same
    // expression works under a watermark in Structured Streaming).
    // Verified boundary semantics: an event exactly `gap` after the
    // previous MERGES (break requires diff > gap), mirrored in the oracle.
    "q58_session_window" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("w_start"),
          col("w.end").as("w_end"), col("n_events"))
        .transform(graft.Tables.ordered(col("user_id"), col("w_start")))
    }),

    // ---- LIKE / string-predicate pushdown (StringContains/StartsWith to scan)
    "q21_like" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_name").contains("widget") || col("p_name").startsWith("blue"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
        .transform(graft.Tables.ordered(col("p_partkey")))
    }),

    // ---- IN-subquery (planned as left-semi) over a derived key set
    "q22_in_subquery" -> ((s, dir) => {
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 7500)
        .select(col("c_custkey"))
      t(s, dir, "orders")
        .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .transform(graft.Tables.ordered(col("o_orderstatus")))
    }),

    // ---- SQL LATERAL correlated subquery: per nation, its top-2
    // suppliers by balance — the lateral form of a grouped top-k.
    // Catalyst decorrelates this into a join + window, so it scales like
    // q6_window_topn rather than re-executing the subquery per outer row.
    "q62_lateral_topn" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("v_nation")
      t(s, dir, "supplier").createOrReplaceTempView("v_supplier")
      s.sql(
        """SELECT n.n_name, top.s_name, top.s_acctbal
          |FROM v_nation n,
          |LATERAL (
          |  SELECT s_name, s_acctbal FROM v_supplier s
          |  WHERE s.s_nationkey = n.n_nationkey
          |  ORDER BY s_acctbal DESC, s_suppkey LIMIT 2
          |) top
          |ORDER BY n.n_name, top.s_acctbal DESC, top.s_name""".stripMargin)
    }),

    // ---- error-safe scalar functions: try_divide / try_cast / try_add
    // yield NULL instead of failing the job under ANSI semantics — at
    // 100 TB one malformed row must not kill a 6-hour pipeline.
    // per_bucket: exact decimal quotient rounded at scale 4 (acctbal has
    // scale 2 and the divisor is 1..6, so no quotient sits on a 4-dp
    // rounding boundary — Spark's HALF_UP cast and DuckDB's ROUND agree
    // exactly), then surfaced as DOUBLE on both sides. Every 4-dp value
    // here is exactly representable-after-round in binary64 identically
    // in both engines, while DECIMAL rendering (trailing zeros, scale)
    // varies across engines and breaks hash canonicalization.
    "q63_try_fns" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          try_divide(dec(col("c_acctbal")),
            (col("c_custkey") % 7).cast("int"))
            .cast(DecimalType(18, 4)).cast("double").as("per_bucket"),
          try_to_number(
            when(col("c_custkey") % 5 === 0, lit("not-a-number"))
              .otherwise(col("c_custkey").cast("string")),
            lit("999999")).cast("long").as("parsed"),
          try_element_at(split(col("c_name"), "#"), lit(2)).as("name_suffix"))
        .transform(graft.Tables.ordered(col("c_custkey")))
    }),

    // ---- pivot-shape conditional aggregation (one pass, no shuffle per column)
    "q23_pivot_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(D).as("total_f"),
          sum(when(col("o_orderstatus") === "O", dec(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(D).as("total_o"),
          sum(when(col("o_orderstatus") === "P", dec(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(D).as("total_p"),
          count(lit(1)).as("n"))
        .transform(graft.Tables.ordered(col("o_orderpriority")))
    }),

    // ---- semi-structured VARIANT: parse the JSON props column ONCE into
    // Spark 4's binary variant encoding, then typed-path extraction —
    // at 100 TB this beats per-expression get_json_object re-parses (one
    // parse per row, shredded typed access afterwards)
    "q64_variant_json" -> ((s, dir) => {
      // Tables.events (not raw t()) so ts arrives normalized TimestampType
      // — pruned today, but extensions that window by time must not see
      // the fixture's raw long-nanos column. Fanout BEFORE the parse:
      // the fixture scan is one task, and parse_json is the dominant
      // per-row CPU here — unsplit, the whole parse serialized onto one
      // core (the pinned-scan starvation shape; measured 0.40s -> 0.32s
      // same-protocol subset bench at sf0.1)
      graft.Tables.fanout(graft.Tables.events(s, dir)
          .select(col("event_type"), col("props")))
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          variant_get(col("v"), "$.k", "int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .transform(graft.Tables.ordered(col("event_type")))
    }),

    // ---- array aggregation + array functions
    "q24_array_agg" -> ((s, dir) => {
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(sort_array(collect_list(col("s_suppkey"))).as("supp_keys"))
        .select(col("s_nationkey"),
          // array serialized for the oracle hash (array-typed output
          // columns aren't hashable by the compare layer)
          concat_ws(",", col("supp_keys")).as("supp_keys_csv"),
          size(col("supp_keys")).as("n_supp"),
          element_at(col("supp_keys"), 1).as("first_key"),
          array_contains(col("supp_keys"), 1L).as("has_supp1"))
        .transform(graft.Tables.ordered(col("s_nationkey")))
    }),

    // ---- string function battery
    "q25_string_fns" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") % 20 === 0)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          instr(col("p_name"), "widget").as("widget_pos"),
          lpad(col("p_partkey").cast("string"), 10, "0").as("padded"),
          reverse(col("p_name")).as("rev"),
          substring(col("p_name"), 1, 4).as("prefix4"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          length(col("p_name")).as("name_len"))
        .transform(graft.Tables.ordered(col("p_partkey")))
    }),

    // ---- date/time function battery + interval arithmetic
    "q26_date_fns" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
          expr("o_orderdate + INTERVAL 30 DAYS").as("plus30"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate")))
            .as("days_to_2002"))
        .transform(graft.Tables.ordered(col("o_orderkey")))
    }),

    // ---- as-of join: each purchase picks up the user's most recent
    // prior-or-same view (Spark has no built-in; see graft.ops.AsOfJoin)
    "q27_asof_join" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.asOf(purchases, views, "user_id", "ts", "ts",
          Seq("ts" -> "view_ts", "value" -> "view_value"))
        .withColumnRenamed("ts", "purchase_ts")
        .withColumnRenamed("value", "purchase_value")
        .transform(graft.Tables.ordered(col("event_id")))
    }),

    // ---- the SAME as-of semantics through the whole-operator path:
    // custom AsOfJoinPlan/Strategy/Exec (sort-merge, O(1) merge state),
    // hash-checked against the identical DuckDB ASOF oracle as q27
    "q67_asof_exec" -> ((s, dir) => {
      graft.GraftFunctions.register(s) // idempotent: injects the strategy
      val ev = graft.Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.asOfExec(purchases, views, "user_id", "ts", "ts",
          Seq("ts" -> "view_ts", "value" -> "view_value"))
        .withColumnRenamed("ts", "purchase_ts")
        .withColumnRenamed("value", "purchase_value")
        .transform(graft.Tables.ordered(col("event_id")))
    }),

    // ---- banded time-range join: same-user event pairs within 5 minutes
    // (equi-join on time buckets + exact filter; never a nested loop)
    "q28_range_join" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      graft.ops.RangeJoin.timeWindowPairs(ev, ev, "user_id", "ts", "event_id", 300)
        .select(col("k").as("user_id"), col("i").as("event_i"),
          col("j").as("event_j"), col("lt").as("ts_i"), col("rt").as("ts_j"))
        .transform(graft.Tables.ordered(col("user_id"), col("event_i"), col("event_j")))
    }),

    // ---- TPC-H Q17 shape: correlated aggregate threshold (per-part avg)
    "q29_corr_agg" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val lp = t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val th = lp.groupBy(col("l_partkey").as("pk"))
        .agg((sum(dec(col("l_quantity"))).cast(D) / count(lit(1)) * 0.2)
          .as("qty_thresh"))
      lp.join(th, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("qty_thresh"))
        .agg((sum(dec(col("l_extendedprice"))).cast(D) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // ---- analytic window battery: ntile / percent_rank / cume_dist /
    // first_value / nth_value over per-segment customer balances
    "q30_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          first(col("c_custkey")).over(wf).as("richest_cust"),
          nth_value(col("c_custkey"), 2).over(wf).as("second_cust"))
        .transform(graft.Tables.ordered(col("c_mktsegment"), col("c_custkey")))
    }),

    // ---- explicit GROUPING SETS (beyond rollup/cube)
    "q31_grouping_sets" -> ((s, dir) => {
      // pre-aggregated like q11_rollup: the Expand over the grouping
      // sets multiplies the 15-row aggregate, not the orders stream
      val base = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("_n"), sum(dec(col("o_totalprice"))).as("_t"))
      base.groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("_n")).as("n"), sum(col("_t")).cast("double").as("total"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .transform(graft.Tables.ordered(col("status"), col("priority")))
    }),

    // ---- SQL FILTER-clause aggregates: per-group conditional
    // aggregation without a self-join or CASE pyramid — one pass, every
    // filtered leg map-side combinable
    "q72_filter_agg" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("v_orders_fa")
      s.sql(
        """SELECT o_orderpriority,
          |  COUNT(*) AS n,
          |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |    FILTER (WHERE o_orderstatus = 'O') AS DECIMAL(18,2)) AS total_o,
          |  MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'P') AS max_p
          |FROM v_orders_fa
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // ---- GROUPING_ID over a cube: the bitmask that tells subtotal rows
    // apart from genuine NULL group keys — required for correct rollup
    // consumption downstream
    "q73_grouping_id" -> ((s, dir) => {
      // pre-aggregated like q12_cube; grouping_id()/grouping() read
      // the cube's own grouping structure, which is identical whether
      // the cube's input is the stream or its (status, priority)
      // aggregate
      val base = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("_n"))
      base.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("_n")).as("n"),
          grouping_id().cast("long").as("gid"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("gid"), col("g_status"))
        .transform(graft.Tables.ordered(col("gid"), col("status"), col("priority")))
    }),

    // ---- posexplode: position-preserving array flattening (token
    // positions are load-bearing for span-level ops)
    "q74_posexplode" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          posexplode(split(concat_ws(" ", col("p_name"), col("p_type")), " ")))
        .select(col("p_partkey"), col("pos").cast("long").as("pos"),
          col("col").as("word"))
        .filter(length(col("word")) >= 5)
        .transform(graft.Tables.ordered(col("p_partkey"), col("pos")))
    }),

    // ---- skyline: parts NOT dominated under (min price, max size).
    // Distributed sort-based frontier — grid collapse + sharded
    // prefix-max (ext.Curation.paretoFrontier2d), never the quadratic
    // NOT EXISTS self-join the oracle spells
    "q75_skyline" -> ((s, dir) => {
      val p = t(s, dir, "part").withColumn("_pc",
        (col("p_retailprice").cast(DecimalType(18, 2)) * 100).cast("long"))
      graft.ext.Curation.paretoFrontier2d(p, col("_pc"), col("p_size"))
        .select(col("p_partkey"), col("p_name"), col("p_size"),
          col("p_retailprice"))
        .transform(graft.Tables.ordered(col("p_partkey")))
    }),

    // ---- k-anonymity report over the (nation, segment) quasi-identifier:
    // the data-release gate — distribution of equivalence-class sizes
    // plus each size's row mass; releasable iff min(group_size) >= k.
    // Two grouped counts, both map-side combinable; row data never moves.
    "privacy_k_anon" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("gsz"))
        .groupBy(col("gsz").as("group_size"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("gsz")).as("n_rows"))
        .transform(graft.Tables.ordered(col("group_size")))
    }),

    // ---- data-contract audit: referential integrity, key uniqueness,
    // and null-rate checks as ONE union of counts — the CI gate a
    // pipeline runs on every landed snapshot. Anti-joins broadcast the
    // dimension key sets; surplus-row accounting (sum(n)-count(groups))
    // counts duplicates without materializing the duplicate rows.
    "q76_integrity" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ords = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      def check(name: String, n: DataFrame): DataFrame =
        n.select(lit(name).as("check_name"), col("n_bad"))
      val orphanOrders = ords.join(cust,
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
      val orphanLines = li.join(ords,
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
      val dupCust = cust.groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_bad"))
      val dupLineKey = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_bad"))
      val nullDates = ords.filter(col("o_orderdate").isNull)
        .agg(count(lit(1)).as("n_bad"))
      check("orphan_orders", orphanOrders)
        .unionAll(check("orphan_lineitems", orphanLines))
        .unionAll(check("dup_custkey", dupCust))
        .unionAll(check("dup_lineitem_pk", dupLineKey))
        .unionAll(check("null_orderdate", nullDates))
        .transform(graft.Tables.ordered(col("check_name")))
    }),

    // ---- TPC-H Q7 shape: bidirectional nation-pair volume with
    // a disjunctive pair predicate over broadcast dims
    "q32_volume_shipping" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("ck"),
        col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_9" && col("cust_nation") === "NATION_10") ||
          (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_9"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(revTerm).cast(D).as("revenue"), count(lit(1)).as("n"))
        .transform(graft.Tables.ordered(col("supp_nation"), col("cust_nation"), col("l_year")))
    }),

    // ---- TPC-H Q19 shape: deeply disjunctive predicate (OR of ANDs)
    "q33_disjunctive" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(revTerm).cast(D).as("revenue"), count(lit(1)).as("n"))
    }),

    // ---- TPC-H Q22 shape: scalar avg subquery + anti join + substring key
    "q34_global_sales" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("cntry", substring(col("c_name"), 10, 2))
      // scalar subquery as a broadcast cross join — stays lazy/distributed,
      // no driver-side collect
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("ab"))
      val noOrders = c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
      noOrders.groupBy(col("cntry"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
        .transform(graft.Tables.ordered(col("cntry")))
    }),

    // ---- histogram by fixed-width buckets (portable floor arithmetic;
    // DuckDB 1.0 has no width_bucket)
    "q36_histogram" -> ((s, dir) => {
      // two-phase integer-cents (see q1_agg): `bucket` is LOW
      // cardinality, so a single-group Long partial would see rows
      // proportional to input size — phase 1 splits by scan partition
      // id (per-partition rows are bounded by the split size rule),
      // sums exact cents in LONGs with the loud try_sum wrap gate, and
      // phase 2 re-sums the partials as DECIMAL(38,0), dividing back
      // to money scale before the one double cast (bit-identical to
      // the all-decimal form, ~5x cheaper per row — the DECIMAL(18,2)
      // sum buffer is 28 digits, off the compact-long fast path)
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_extendedprice") / 10000).cast("int").as("bucket"),
          spark_partition_id().as("_p"))
        .agg(count(lit(1)).as("_n"),
          try_sum(round(col("l_extendedprice") * 100).cast("long")).as("_tc"))
        .filter(assert_true(col("_tc").isNotNull,
          lit("q36_histogram: integer-cents Long partial overflowed " +
            "(rows per partition exceeded the safe bound)")).isNull)
        .groupBy(col("bucket"))
        .agg(sum(col("_n")).as("n"),
          (sum(col("_tc").cast(DecimalType(38, 0))) /
            lit(100).cast(DecimalType(9, 0))).cast(D).as("total"))
        .transform(graft.Tables.ordered(col("bucket")))
    }),

    // ---- TPC-H Q2 shape: correlated-min subquery (cheapest supplier per part)
    "q43_min_cost_supp" -> ((s, dir) => {
      // raw IEEE double division (identical bits in both engines); decimal
      // division would round at engine-specific scales and diverge
      // correlated min via a window over the aggregated (part, supp) rows:
      // one lineitem scan + two shuffles. The naive self-join against a
      // per-part min recomputes the whole aggregation subtree on both
      // branches (Spark plans the CTE twice) and adds a third shuffle.
      // the PROMO part filter goes BEFORE the aggregation: the per-part
      // minimum is unchanged by dropping other parts, and the broadcast
      // semi-reduction means the two shuffles only ever carry the ~1/5 of
      // lineitem that can reach the output
      val promoParts = broadcast(
        t(s, dir, "part").filter(col("p_type") === "PROMO"))
      val ps = t(s, dir, "lineitem")
        .join(promoParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      ps.withColumn("min_cost",
          min(col("unit_cost")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("unit_cost") === col("min_cost"))
        .select(col("l_partkey").as("p_partkey"), col("l_suppkey"),
          col("unit_cost"))
        .transform(graft.Tables.ordered(col("p_partkey"), col("l_suppkey")))
    }),

    // ---- TPC-H Q11 shape: HAVING against a global scalar aggregate
    "q44_important_stock" -> ((s, dir) => {
      // persist: the per-part aggregate feeds BOTH the output branch and
      // the scalar threshold — unpersisted, Spark plans the full lineitem
      // scan + shuffle on each side of the crossJoin (at 100 TB this is a
      // materialized intermediate table)
      // integer-cents accumulate (see q1_agg): the per-part value sums
      // exact cents in a LONG — 5x cheaper per row than DECIMAL(18,2)
      // accumulation (whose 28-digit sum buffer leaves the compact-long
      // fast path). l_partkey is a HIGH-cardinality key, so per-group
      // row counts are bounded by the part's own line count, not the
      // partition size — no spark_partition_id sub-level needed; a
      // pathological 9.2e16-dollar part wraps try_sum to NULL and the
      // assert gate below raises instead of publishing. The decimal
      // finalize divides the exact cents back to money scale before the
      // one double cast, so part_value is bit-identical to the
      // all-decimal form (same exact rational, same single rounding).
      val value = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(try_sum(round(col("l_extendedprice") * 100).cast("long")).as("_pc"))
        .filter(assert_true(col("_pc").isNotNull,
          lit("q44_important_stock: integer-cents Long partial overflowed")).isNull)
        .select(col("l_partkey"),
          (col("_pc").cast(DecimalType(38, 0)) /
            lit(100).cast(DecimalType(9, 0))).cast(D).as("part_value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val threshold = value.agg((sum(dec(col("part_value"))).cast(D) * 0.0002)
        .as("thresh"))
      value.crossJoin(broadcast(threshold))
        .filter(col("part_value") > col("thresh"))
        .select(col("l_partkey"), col("part_value"))
        .transform(graft.Tables.ordered(col("part_value").desc, col("l_partkey")))
    }),

    // ---- NOT IN with non-null key set (anti join; the classic null trap
    // is avoided by construction and documented in the oracle)
    "q45_not_in" -> ((s, dir) => {
      val bigOrderParts = t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49).select(col("l_partkey")).distinct()
      t(s, dir, "part")
        .join(bigOrderParts, col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
        .transform(graft.Tables.ordered(col("p_brand")))
    }),

    // ---- TPC-H Q21 shape (no receiptdate in the fixture, so the "late"
    // predicate becomes returnflag='R'): suppliers that were the ONLY
    // flagged supplier on a multi-supplier finished order. EXISTS → left
    // semi with an extra non-equi predicate, NOT EXISTS → left anti; all
    // three legs shuffle once on l_orderkey and the dimension broadcasts.
    "q46_exists_chain" -> ((s, dir) => {
      // t, not tf: all three legs go straight into key-partitioned
      // joins, so the round-robin pre-balance would only add a full
      // extra shuffle per leg before the l_orderkey exchange spreads
      // the rows anyway (fanout is for CPU-heavy per-row work)
      val li = t(s, dir, "lineitem")
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      val only = l1
        .join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
          "left_anti")
      only.join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    }),

    // ---- TPC-H Q22 shape (no phone column, so the country-code bucket is
    // c_mktsegment): well-funded inactive customers — scalar-average
    // subquery (broadcast), NOT EXISTS anti join against 'P' orders.
    "q47_inactive_rich" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY", "HOUSEHOLD"))
      // exact decimal sum / count, then one double division — engine-
      // agnostic, unlike avg(decimal) whose result type differs per engine
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("avg_bal"))
      val pending = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(pending, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .transform(graft.Tables.ordered(col("c_mktsegment")))
    }),

    // ---- TPC-H Q20 shape: nested semi chain — suppliers whose shipped
    // volume of ECONOMY parts clears a fixed threshold. part-filter
    // broadcast-semi-reduces lineitem BEFORE the aggregation; the
    // qualifying-supplier set then left-semi's the dimension.
    "q48_excess_stock" -> ((s, dir) => {
      val econParts = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val bigSupp = t(s, dir, "lineitem")
        .join(broadcast(econParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("econ_qty"))
        .filter(col("econ_qty") > 500)
      t(s, dir, "supplier")
        .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .transform(graft.Tables.ordered(col("s_suppkey")))
    }),

    // ---- RANGE window frame (value-based, not row-based): rolling
    // 30-day revenue per customer over an integer day axis — the frame
    // covers a DATE RANGE, so gaps and same-day multi-orders are handled
    // correctly where a rows-frame would not be.
    "q49_rolling_30d" -> ((s, dir) => {
      val day = datediff(col("o_orderdate"), lit("1992-01-01"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(day)
        .rangeBetween(-30, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec(col("o_totalprice"))).over(w).cast("double")
            .as("rev_30d"))
        .transform(graft.Tables.ordered(col("o_custkey"), col("o_orderdate"), col("o_orderkey")))
    }),

    // ---- statistical moments from EXACT decimal sums: var/stddev/corr
    // derived as double arithmetic over decimal partial aggregates, so
    // the result is partition-order-independent (Spark's stddev/corr
    // stream doubles and drift with partitioning). One map-side-combinable
    // pass collects all six sums.
    "q52_stats_moments" -> ((s, dir) => {
      // two-phase integer-units (see q1_agg): the six moment sums
      // accumulated DECIMAL(28,4)/(38,4) buffers per row — off the
      // compact-long fast path, and the squared terms were per-row
      // decimal MULTIPLIES too. Phase 1 sums exact integer units in
      // LONGs by (flag, scan partition id) with the loud try_sum wrap
      // gate; phase 2 re-sums as DECIMAL(38,0) and divides back to
      // value scale before the one double cast — the same exact
      // rationals, so every published double is bit-identical.
      // Unit audit per (flag, partition) partial at R rows/partition
      // (R is bounded by the data-sized split rule, ~1e5; audited to
      // R = 1e6): qc<=5.1e3 cents, pc<=1.1e7 cents, so qc^2<=2.6e7,
      // qc*pc<=5.6e10 — all partials <= 5.6e16 at R=1e6. The ONE term
      // that could brush the Long range is the price square
      // (pc^2<=1.2e14 -> 1.2e20 at R=1e6), so it decomposes through
      // dollars/cents: pc = 100*pd + pr gives
      // pc^2 = 1e4*pd^2 + 200*pd*pr + pr^2 with pd^2<=1.2e10,
      // pd*pr<=1.1e7, pr^2<=9801 — every factor-sum bounded <=1.2e16,
      // recombined exactly in phase-2 decimal.
      // t, not tf — r14 fanout A/B (FanoutAB protocol, min-of-3):
      // fanout 0.805s vs plain 0.380s at sf0.1; integer units made the
      // per-row work cheaper than the round-robin shuffle write.
      val part = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100).cast("long").as("_qc"),
          round(col("l_extendedprice") * 100).cast("long").as("_pc"))
        .withColumn("_pd", expr("_pc div 100"))
        .withColumn("_pr", col("_pc") - col("_pd") * 100)
        .groupBy(col("l_returnflag"), spark_partition_id().as("_p"))
        .agg(count(lit(1)).as("_n"),
          try_sum(col("_qc")).as("_sq"),
          try_sum(col("_qc") * col("_qc")).as("_sqq"),
          try_sum(col("_pc")).as("_sp"),
          try_sum(col("_pd") * col("_pd")).as("_spd2"),
          try_sum(col("_pd") * col("_pr")).as("_spdr"),
          try_sum(col("_pr") * col("_pr")).as("_spr2"),
          try_sum(col("_qc") * col("_pc")).as("_sqp"))
        .filter(assert_true(
          col("_sq").isNotNull && col("_sqq").isNotNull &&
            col("_sp").isNotNull && col("_spd2").isNotNull &&
            col("_spdr").isNotNull && col("_spr2").isNotNull &&
            col("_sqp").isNotNull,
          lit("q52_stats_moments: integer-unit Long partial overflowed " +
            "(rows per partition exceeded the safe bound)")).isNull)
      val d38 = (c: Column) => sum(c.cast(DecimalType(38, 0)))
      val unit = (c: Column, u: Int) =>
        (c / lit(u).cast(DecimalType(9, 0))).cast(D)
      val base = part.groupBy(col("l_returnflag"))
        .agg(sum(col("_n")).as("n"),
          unit(d38(col("_sq")), 100).as("sx"),
          unit(d38(col("_sqq")), 10000).as("sxx"),
          unit(d38(col("_sp")), 100).as("sy"),
          unit(d38(col("_spd2")) * 10000 + d38(col("_spdr")) * 200 +
            d38(col("_spr2")), 10000).as("syy"),
          unit(d38(col("_sqp")), 10000).as("sxy"))
      val n = col("n").cast(D)
      base.select(col("l_returnflag"), col("n"),
          round((col("sxx").cast(D) - col("sx").cast(D) * col("sx").cast(D) / n) / n, 6).as("var_qty"),
          round(sqrt((col("sxx").cast(D) - col("sx").cast(D) * col("sx").cast(D) / n) / n), 6).as("std_qty"),
          round((n * col("sxy").cast(D) - col("sx").cast(D) * col("sy").cast(D)) /
            sqrt((n * col("sxx").cast(D) - col("sx").cast(D) * col("sx").cast(D)) *
              (n * col("syy").cast(D) - col("sy").cast(D) * col("sy").cast(D))), 6)
            .as("corr_qty_price"))
        .transform(graft.Tables.ordered(col("l_returnflag")))
    }),

    // ---- TPC-H Q8 shape: market share of one supplier-nation inside a
    // region, per year — two nation roles (customer-side for the region
    // gate, supplier-side for the share), conditional/total exact-decimal
    // sums in ONE aggregation pass. Dimensions broadcast; the fact chain
    // shuffles on its join keys only.
    "q59_market_share" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      val p = t(s, dir, "part")
      val zero = lit(0).cast(DecimalType(18, 4))
      l.join(broadcast(p.filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.as("n1")), col("c_nationkey") === col("n1.n_nationkey"))
        .join(broadcast(r.filter(col("r_name") === "ASIA")),
          col("n1.n_regionkey") === col("r_regionkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.as("n2")), col("s_nationkey") === col("n2.n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(when(col("n2.n_name") === "NATION_7", revTerm).otherwise(zero))
            .cast(D) / sum(revTerm).cast(D), 6).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .transform(graft.Tables.ordered(col("o_year")))
    }),

    // ---- TPC-H Q9 shape: per-nation per-year product profit over a
    // 5-table chain (supplycost proxied by retailprice — the fixture has
    // no partsupp). Exact decimal profit keeps partial aggregation exact.
    "q60_product_profit" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val su = t(s, dir, "supplier"); val n = t(s, dir, "nation")
      val p = t(s, dir, "part")
      val profit = revTerm -
        (dec(col("l_quantity")) * dec(col("p_retailprice"))).cast(DecimalType(18, 4))
      l.join(broadcast(p.filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(profit).cast(D).as("sum_profit"), count(lit(1)).as("n_lines"))
        .transform(graft.Tables.ordered(col("nation"), col("o_year").desc))
    }),

    // ---- TPC-H Q10 shape: top-20 customers by returned-item revenue in
    // one quarter; total order (revenue desc, custkey) makes the LIMIT
    // cut deterministic — plans as TakeOrderedAndProject, not a full sort
    "q61_returned_items" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      l.filter(col("l_returnflag") === "R")
        .join(o.filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(revTerm).cast(D).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- TPC-H Q14 shape: promo revenue share — conditional and total
    // sums collected in ONE aggregation pass (no self-join on the fact);
    // the part dim broadcasts after its scan prunes to two columns
    "q65_promo_share" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      val zero = lit(0).cast(DecimalType(18, 4))
      l.filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-09-01").cast("timestamp"))
        .join(broadcast(p.select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100) * sum(when(col("p_type") === "PROMO", revTerm)
              .otherwise(zero)).cast(D) / sum(revTerm).cast(D), 6)
            .as("promo_share"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- TPC-H Q18 shape: customers with any large order (aggregate
    // HAVING feeding a semi join) + their total spend. The qualifying
    // order-key set is aggregated once and semi-joins orders — the
    // lineitem fact shuffles once for the HAVING and once for the spend
    "q66_big_orders" -> ((s, dir) => {
      // t, not tf: the lineitem leg goes straight into a keyed groupBy,
      // so the round-robin pre-balance is a pure extra shuffle
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      // integer-cents accumulate (see q1_agg): the per-order quantity
      // total sums exact cents in a LONG — bounded by lines-per-order,
      // not data size — and the 250-unit gate compares integers
      val bigKeys = l.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_quantity") * 100).cast("long")).as("_sq"))
        .filter(col("_sq") > 25000L)
        .select(col("l_orderkey"))
      o.join(bigKeys, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_big_orders"),
          dsum(col("o_totalprice")).as("total_spend"))
        .orderBy(col("total_spend").desc, col("c_custkey"))
        .limit(25)
    }),

    // ---- ordered conversion funnel with a 3-day attribution window at
    // each stage: first view -> first click within the window -> first
    // purchase within the window, stage reach + conversion ratios.
    // Three grouped mins, each join keyed on user_id so the shuffles
    // align; ratios are single IEEE divisions of exact counts.
    "q69_funnel" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("v_ts") &&
          col("ts") <= col("v_ts") + expr("INTERVAL 3 DAY"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("c_ts") &&
          col("ts") <= col("c_ts") + expr("INTERVAL 3 DAY"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      // ONE aggregation chain, not three crossJoined branch counts:
      // c and p are per-user frames (one row per user, each a subset
      // of v's users), so left-joining them onto v and counting the
      // non-null stage timestamps yields the identical three counts
      // while the funnel's v -> c -> p dependency executes once —
      // the branchy form re-ran v twice and c once (census: 5 jobs
      // for a 1-row answer; this shape plans 2)
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_view"),
          count(col("c_ts")).as("n_click"),
          count(col("p_ts")).as("n_purchase"))
        .select(col("n_view"), col("n_click"), col("n_purchase"),
          (col("n_click").cast("double") / col("n_view")).as("r_click"),
          (col("n_purchase").cast("double") / col("n_click")).as("r_purchase"))
    }),

    // ---- weekly cohort retention matrix: users bucketed by signup week,
    // counted in each later activity week. Week-truncation keeps the
    // offset arithmetic exact (differences are whole multiples of 7
    // days). ONE user-keyed aggregation carries both the cohort week
    // (min signup ts) and the distinct activity-week set — the
    // cohort-join-activity formulation this replaces paid a second
    // shuffle (the activity distinct), a join (and its broadcast-build
    // job), and a countDistinct; here each (user, wk) emerges unique by
    // construction, so the final count is a plain count. The per-user
    // set state is bounded by the calendar (#weeks in the corpus
    // timespan), not by the user's event volume, and collect_set merges
    // map-side — skew-immune at 100 TB. Measured same-protocol subset
    // bench at sf0.1: 0.42s -> 0.28s, 2 jobs -> 1, 6 stages -> 4.
    "q70_retention" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .groupBy(col("user_id"))
        .agg(
          date_trunc("week", min(when(col("event_type") === "signup",
            col("ts")))).cast("date").as("cohort_wk"),
          collect_set(date_trunc("week", col("ts")).cast("date")).as("wks"))
        .filter(col("cohort_wk").isNotNull)
        .select(col("cohort_wk"), explode(col("wks")).as("wk"))
        .filter(col("wk") >= col("cohort_wk"))
        .withColumn("week_offset",
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
        .groupBy(col("cohort_wk"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .transform(graft.Tables.ordered(col("cohort_wk"), col("week_offset")))
    }),

    // ---- rank-function suite: ntile quartiles + percent_rank/cume_dist
    // per market segment, summarized per quartile. The (price, orderkey)
    // sort key removes ties, so every rank function is fully
    // deterministic; percent_rank and cume_dist are single IEEE ratios
    // of exact longs (identical in any engine). Coverage query for the
    // rank family — at 100 TB a 5-segment window is a 5-task sort, so
    // real quantile assignment at scale goes through ops.Layout range
    // sharding or approx quantiles instead.
    "q71_rank_suite" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("lo_price"),
          max(col("o_totalprice")).as("hi_price"),
          min(col("pr")).as("min_pr"),
          max(col("cd")).as("max_cd"))
        .transform(graft.Tables.ordered(col("c_mktsegment"), col("quartile")))
    }),

    // ---- data profiling (ANALYZE surface): per-column row/null/distinct
    // counts and min/max in ONE scan of the table; doubles go through
    // DECIMAL so the stringified extremes render identically on any
    // engine. The oracle recomputes each column independently.
    "q68_profile" -> ((s, dir) => {
      graft.ops.Profile.profile(
          t(s, dir, "orders").withColumn("o_totalprice",
            dec(col("o_totalprice"))),
          Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"))
        .transform(graft.Tables.ordered(col("col_name")))
    }),

    // ---- calendar gap-fill: a generated date axis LEFT JOIN a sparse
    // daily aggregate, missing days zero-filled. The axis is a tiny
    // `sequence()` explode (366 rows) — at 100 TB the fact side shuffles
    // once into the daily aggregate and the join is broadcast.
    "q53_gapfill" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .filter(col("o_custkey") % 100 === 7 &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      val axis = s.range(1).select(explode(sequence(
        to_date(lit("1996-01-01")), to_date(lit("1996-12-31")),
        expr("interval 1 day"))).as("day"))
      axis.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .transform(graft.Tables.ordered(col("day")))
    }),

    // ---- ordered string aggregation: collect_list is unordered by
    // contract, so sort INSIDE the array before joining — deterministic
    // at any parallelism (DuckDB: string_agg ... ORDER BY)
    "q54_listagg" -> ((s, dir) => {
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), "|").as("names"),
          count(lit(1)).as("n_supp"))
        .transform(graft.Tables.ordered(col("s_nationkey")))
    }),

    // ---- distribution window functions: ntile / percent_rank / cume_dist
    // (total order inside each partition via the custkey tiebreak)
    "q55_dist_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer").select(
          col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .transform(graft.Tables.ordered(col("c_mktsegment"), col("c_custkey")))
    }),

    // ---- explicit frame bounds: first/last/nth over the FULL partition
    // (last_value without UNBOUNDED FOLLOWING is the classic silent bug)
    "q56_frame_bounds" -> ((s, dir) => {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal"), col("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "supplier").select(
          col("s_suppkey"), col("s_nationkey"),
          first(col("s_name")).over(w).as("poorest"),
          last(col("s_name")).over(w).as("richest"),
          nth_value(col("s_name"), 2).over(w).as("second_poorest"))
        .transform(graft.Tables.ordered(col("s_suppkey")))
    }),

    // ---- bitwise aggregates (order-independent, map-side combinable)
    "q57_bit_aggs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(bit_and(col("l_orderkey")).as("k_and"),
          bit_or(col("l_orderkey")).as("k_or"),
          bit_xor(col("l_orderkey")).as("k_xor"),
          count(lit(1)).as("n"))
        .transform(graft.Tables.ordered(col("l_returnflag")))
    }),

    // ---- time-series analytics: month-over-month revenue change
    // (windowed lag over a pre-aggregated series — two-level plan)
    "q42_mom_change" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      // single-partition window: one row per month (dozens), bounded
      val w = Window.orderBy(col("month"))
      monthly
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("mom_pct",
          round((col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100, 6))
        .transform(graft.Tables.ordered(col("month")))
    }),

    // ---- argmax/argmin aggregation (max_by with a collision-free ordinal
    // so ties can't make the result nondeterministic across engines).
    // Spacing 1e10 > any orderkey up to SF~1600; cents < 9.2e8 keeps the
    // product inside a long. (1e8 spacing would collide at SF>=17.)
    "q35_argmax" -> ((s, dir) => {
      val ord = (dec(col("o_totalprice")) * 100).cast("long") * 10000000000L +
        col("o_orderkey")
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), ord).as("priciest_order"),
          min_by(col("o_orderkey"), ord).as("cheapest_order"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .transform(graft.Tables.ordered(col("o_orderpriority")))
    }),

    // ---- conditional distinct counts WITHOUT tripling the fact table.
    // Three countDistincts in one agg make Catalyst's
    // RewriteDistinctAggregates Expand every lineitem row ×3 before the
    // shuffle — at 100 TB that shuffles 3× the fact table. Instead each
    // distinct domain dedupes first (map-side partial distinct means the
    // shuffle carries only distinct keys), the survivors are counted,
    // and the two 3-row results broadcast-join back together. Same
    // answer, same oracle; the Expand never happens.
    "q37_cond_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // null keys must drop BEFORE the distinct — countDistinct never
      // counts a NULL argument, so the rewrite only matches it exactly
      // with the same exclusion (TPC-H keys are non-null, but the
      // equivalence must not depend on that)
      val parts = li.filter(col("l_partkey").isNotNull)
        .select(col("l_returnflag"), col("l_partkey"),
          (col("l_quantity") > 25).as("bulk"))
        .distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(when(col("bulk"), 1)).as("parts_bulk"),
          count(when(!col("bulk"), 1)).as("parts_small"))
      val supp = li.filter(col("l_suppkey").isNotNull)
        .select(col("l_returnflag"), col("l_suppkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_supp"))
      parts.join(supp, Seq("l_returnflag")).transform(graft.Tables.ordered(col("l_returnflag")))
    }),

    // ---- TPC-H Q13 shape: order-count distribution via left join + double agg
    "q38_order_distribution" -> ((s, dir) => {
      val counts = t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      counts.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .transform(graft.Tables.ordered(col("custdist").desc, col("c_count").desc))
    }),

    // ---- TPC-H Q15 shape: top-revenue supplier via max-equality subquery
    "q39_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revTerm).cast(D).as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("mr"))
      t(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("mr"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .transform(graft.Tables.ordered(col("s_suppkey")))
    }),

    // ---- exact interpolated quantiles per group
    "q40_quantiles" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          round(median(col("c_acctbal")), 6).as("med_bal"),
          round(expr("percentile(c_acctbal, 0.25)"), 6).as("q1_bal"),
          round(expr("percentile(c_acctbal, 0.75)"), 6).as("q3_bal"),
          count(lit(1)).as("n"))
        .transform(graft.Tables.ordered(col("c_mktsegment")))
    }),

    // ---- correlated scalar-subquery shape: customers above their nation's avg balance
    "q17_above_avg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val navg = c.groupBy(col("c_nationkey").as("nk"))
        .agg((sum(dec(col("c_acctbal"))).cast(D) / count(lit(1))).as("nation_avg"))
      c.join(broadcast(navg), col("c_nationkey") === col("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .transform(graft.Tables.ordered(col("c_custkey")))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |CAST(SUM($revSql) AS DOUBLE) AS sum_disc_price,
         |CAST(SUM(CAST($revSql * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
         |CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_disc,
         |COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter" ->
      """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q3_join_topk" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |CAST(SUM($revSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-06-30'
         |AND l_shipdate > TIMESTAMP '1998-06-30'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q5_multi_join" ->
      s"""SELECT n_name, CAST(SUM($revSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
         |AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_window_topn" ->
      """SELECT * FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q7_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |rank() OVER w AS rnk,
        |lag(o_orderkey, 1) OVER w AS prev_orderkey,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rnk""".stripMargin,

    "q8_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q50_set_ops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_excess
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY o_custkey
        |UNION ALL
        |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) * -1 AS n_excess
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY o_custkey
        |ORDER BY o_custkey, n_excess""".stripMargin,

    "q52_stats_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS syy,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS var_qty,
        |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6) AS std_qty,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |      (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q59_market_share" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         |round(CAST(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN $revSql
         |                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         |  / CAST(SUM($revSql) AS DOUBLE), 6) AS mkt_share,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
         |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q60_product_profit" ->
      s"""SELECT n_name AS nation,
         |CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         |CAST(SUM($revSql - CAST(CAST(l_quantity AS DECIMAL(18,2))
         |  * CAST(p_retailprice AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit,
         |COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_type = 'ECONOMY'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q61_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |CAST(SUM($revSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-04-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q65_promo_share" ->
      s"""SELECT round(100 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
         |                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         |  / CAST(SUM($revSql) AS DOUBLE), 6) AS promo_share,
         |COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-09-01'""".stripMargin,

    "q66_big_orders" ->
      """SELECT c_custkey, c_name, COUNT(*) AS n_big_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |GROUP BY 1, 2
        |ORDER BY total_spend DESC, c_custkey LIMIT 25""".stripMargin,

    "q71_rank_suite" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_totalprice,
        |    ntile(4) OVER w AS quartile,
        |    percent_rank() OVER w AS pr,
        |    cume_dist() OVER w AS cd
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey))
        |SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  MIN(o_totalprice) AS lo_price, MAX(o_totalprice) AS hi_price,
        |  MIN(pr) AS min_pr, MAX(cd) AS max_cd
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q70_retention" ->
      """WITH su AS (
        |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_wk
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |        FROM events),
        |j AS (SELECT s.cohort_wk, a.wk, s.user_id
        |      FROM su s JOIN act a USING (user_id) WHERE a.wk >= s.cohort_wk)
        |SELECT cohort_wk, CAST(date_diff('day', cohort_wk, wk) / 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q69_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |        AND e.ts <= v.v_ts + INTERVAL 3 DAY GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |        AND e.ts <= c.c_ts + INTERVAL 3 DAY GROUP BY 1),
        |n AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase)
        |SELECT n_view, n_click, n_purchase,
        |  n_click::DOUBLE / n_view AS r_click,
        |  n_purchase::DOUBLE / n_click AS r_purchase
        |FROM n""".stripMargin,

    "q68_profile" ->
      """SELECT * FROM (
        |SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        |  CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
        |  CAST(MAX(o_custkey) AS VARCHAR) AS max_s FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        |  MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        |  MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
        |  CAST(COUNT(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT),
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) FROM orders
        |) ORDER BY col_name""".stripMargin,

    "q64_variant_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
        |CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q62_lateral_topn" ->
      """SELECT n.n_name, top.s_name, top.s_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier s
        |  WHERE s.s_nationkey = n.n_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey LIMIT 2
        |) top
        |ORDER BY n.n_name, top.s_acctbal DESC, top.s_name""".stripMargin,

    // ROUND(double, 4) here matches Spark's DECIMAL(18,4) HALF_UP cast
    // because no quotient acctbal/k (k in 1..6) sits on a 4-dp boundary
    // (terminating expansions stop at scale 4; the rest repeat in 3s/6s).
    // Surfaced as DOUBLE on both sides — decimal scale/trailing-zero
    // rendering differs between engines and breaks hash canonicalization.
    "q63_try_fns" ->
      """SELECT c_custkey,
        |ROUND(c_acctbal / NULLIF(c_custkey % 7, 0), 4)::DECIMAL(18,4)::DOUBLE AS per_bucket,
        |TRY_CAST(CASE WHEN c_custkey % 5 = 0 THEN 'not-a-number'
        |              ELSE c_custkey::VARCHAR END AS BIGINT) AS parsed,
        |str_split(c_name, '#')[2] AS name_suffix
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q53_gapfill" ->
      """WITH axis AS (
        |  SELECT CAST(gs AS DATE) AS day
        |  FROM generate_series(DATE '1996-01-01', DATE '1996-12-31', INTERVAL 1 DAY) t(gs)),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders
        |  WHERE o_custkey % 100 = 7
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1)
        |SELECT a.day, COALESCE(d.n_orders, 0) AS n_orders,
        |  COALESCE(d.revenue, 0.0) AS revenue
        |FROM axis a LEFT JOIN daily d ON a.day = d.day ORDER BY a.day""".stripMargin,

    "q54_listagg" ->
      """SELECT s_nationkey, string_agg(s_name, '|' ORDER BY s_name) AS names,
        |COUNT(*) AS n_supp
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q55_dist_windows" ->
      """SELECT c_custkey, c_mktsegment,
        |CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |round(percent_rank() OVER w, 6) AS pct_rank,
        |round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q56_frame_bounds" ->
      """SELECT s_suppkey, s_nationkey,
        |first_value(s_name) OVER w AS poorest,
        |last_value(s_name) OVER w AS richest,
        |nth_value(s_name, 2) OVER w AS second_poorest
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY s_suppkey""".stripMargin,

    "q57_bit_aggs" ->
      """SELECT l_returnflag,
        |CAST(bit_and(l_orderkey) AS BIGINT) AS k_and,
        |CAST(bit_or(l_orderkey) AS BIGINT) AS k_or,
        |CAST(bit_xor(l_orderkey) AS BIGINT) AS k_xor,
        |COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q51_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_o
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'F' AS status, total_f AS total FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'O' AS status, total_o AS total FROM wide
        |ORDER BY o_orderpriority, status""".stripMargin,

    "q9_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT 'f_only' AS tag, o_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |ORDER BY tag, o_custkey""".stripMargin,

    "q10_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
        |COUNT(*) AS n_rows FROM lineitem""".stripMargin,

    "q11_rollup" ->
      """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
        |COALESCE(l_linestatus, '(all)') AS linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q12_cube" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |COALESCE(o_orderpriority, '(all)') AS priority,
        |COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q13_having" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price
        |FROM part GROUP BY p_brand HAVING COUNT(*) > 5 ORDER BY p_brand""".stripMargin,

    "q14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q15_scalar_fns" ->
      """SELECT o_orderkey,
        |UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio_word,
        |'ord#' || CAST(o_orderkey AS VARCHAR) AS tag,
        |CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
        |CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mon,
        |CASE WHEN o_totalprice > 150000 THEN 'big'
        |     WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS size_class,
        |CAST(CAST(o_totalprice AS DECIMAL(18,2)) % 97 AS DOUBLE) AS price_mod,
        |ABS(o_custkey - 1000) AS key_dist,
        |CAST(LENGTH(o_orderpriority) AS INTEGER) AS prio_len
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,

    "q16_outer_join" ->
      """SELECT c_custkey,
        |COALESCE(n_orders, 0) AS n_orders, COALESCE(spend, 0.0) AS spend
        |FROM customer LEFT JOIN (
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q43_min_cost_supp" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT p_partkey, l_suppkey, unit_cost
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'PROMO'
        |AND unit_cost = (SELECT min(unit_cost) FROM ps p2 WHERE p2.l_partkey = ps.l_partkey)
        |ORDER BY p_partkey, l_suppkey""".stripMargin,

    "q44_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, part_value FROM v
        |WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,2))) AS DOUBLE) * 0.0002 FROM v)
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q45_not_in" ->
      """SELECT p_brand, COUNT(*) AS n_parts FROM part
        |WHERE p_partkey NOT IN (
        |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q48_excess_stock" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
        |  GROUP BY l_suppkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 500)
        |ORDER BY s_suppkey""".stripMargin,

    "q49_rolling_30d" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1992-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_30d
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q46_exists_chain" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |AND EXISTS (SELECT 1 FROM lineitem l2
        |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |  AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q47_inactive_rich" ->
      """WITH seg AS (
        |  SELECT * FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD')),
        |ab AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM seg WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM seg CROSS JOIN ab
        |WHERE c_acctbal > avg_bal
        |AND NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q42_mom_change" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue, n_orders,
        |  lag(revenue, 1) OVER (ORDER BY month) AS prev_revenue,
        |  round((revenue - lag(revenue, 1) OVER (ORDER BY month))
        |        / lag(revenue, 1) OVER (ORDER BY month) * 100, 6) AS mom_pct
        |FROM monthly ORDER BY month""".stripMargin,

    "q36_histogram" ->
      """SELECT CAST(FLOOR(l_extendedprice / 10000) AS INTEGER) AS bucket,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q35_argmax" ->
      """SELECT o_orderpriority,
        |max_by(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey) AS priciest_order,
        |min_by(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey) AS cheapest_order,
        |max(o_totalprice) AS max_price,
        |min(o_totalprice) AS min_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q37_cond_distinct" ->
      """SELECT l_returnflag,
        |COUNT(DISTINCT CASE WHEN l_quantity > 25 THEN l_partkey END) AS parts_bulk,
        |COUNT(DISTINCT CASE WHEN l_quantity <= 25 THEN l_partkey END) AS parts_small,
        |COUNT(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q38_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q39_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(SUM($revSql) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q40_quantiles" ->
      """SELECT c_mktsegment,
        |round(median(CAST(c_acctbal AS DOUBLE)), 6) AS med_bal,
        |round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.25), 6) AS q1_bal,
        |round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.75), 6) AS q3_bal,
        |COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q32_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         |CAST(SUM($revSql) AS DOUBLE) AS revenue, COUNT(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
         |   OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')
         |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q33_disjunctive" ->
      s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q34_global_sales" ->
      """WITH c AS (SELECT *, substring(c_name, 10, 2) AS cntry FROM customer),
        |ab AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS ab
        |       FROM c WHERE c_acctbal > 0)
        |SELECT cntry, COUNT(*) AS n_cust,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM c, ab
        |WHERE c_acctbal > ab
        |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY cntry ORDER BY cntry""".stripMargin,

    "q30_window_analytics" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |round(percent_rank() OVER w, 6) AS pct_rank,
        |round(cume_dist() OVER w, 6) AS cume,
        |first_value(c_custkey) OVER wf AS richest_cust,
        |nth_value(c_custkey, 2) OVER wf AS second_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
        |wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q31_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |COALESCE(o_orderpriority, '(all)') AS priority,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "q28_range_join" ->
      """SELECT a.user_id, a.event_id AS event_i, b.event_id AS event_j,
        |a.ts AS ts_i, b.ts AS ts_j
        |FROM events a JOIN events b
        |ON a.user_id = b.user_id AND a.event_id < b.event_id
        |AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300 * 1000000
        |ORDER BY a.user_id, event_i, event_j""".stripMargin,

    "q29_corr_agg" ->
      """WITH lp AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#23'),
        |th AS (
        |  SELECT l_partkey AS pk,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)*0.2 AS qty_thresh
        |  FROM lp GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/7.0 AS avg_yearly,
        |COUNT(*) AS n
        |FROM lp JOIN th ON lp.l_partkey = th.pk
        |WHERE l_quantity < qty_thresh""".stripMargin,

    "q27_asof_join" ->
      """SELECT l.event_id, l.user_id, l.ts AS purchase_ts, l.value AS purchase_value,
        |r.ts AS view_ts, r.value AS view_value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') r
        |ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // identical oracle to q27: the custom exec must produce byte-identical
    // results to the composed window path AND to DuckDB's native ASOF
    "q67_asof_exec" ->
      """SELECT l.event_id, l.user_id, l.ts AS purchase_ts, l.value AS purchase_value,
        |r.ts AS view_ts, r.value AS view_value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') r
        |ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "q21_like" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_name LIKE '%widget%' OR p_name LIKE 'blue%'
        |ORDER BY p_partkey""".stripMargin,

    "q22_in_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 7500)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q23_pivot_agg" ->
      """SELECT o_orderpriority,
        |CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_f,
        |CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_o,
        |CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS total_p,
        |COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q24_array_agg" ->
      """SELECT s_nationkey,
        |array_to_string(list(s_suppkey ORDER BY s_suppkey), ',') AS supp_keys_csv,
        |CAST(len(list(s_suppkey ORDER BY s_suppkey)) AS INTEGER) AS n_supp,
        |list(s_suppkey ORDER BY s_suppkey)[1] AS first_key,
        |list_contains(list(s_suppkey ORDER BY s_suppkey), 1) AS has_supp1
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q25_string_fns" ->
      """SELECT p_partkey,
        |UPPER(p_name) AS uname,
        |replace(p_name, ' ', '_') AS snake,
        |CAST(strpos(p_name, 'widget') AS INTEGER) AS widget_pos,
        |lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded,
        |reverse(p_name) AS rev,
        |substring(p_name, 1, 4) AS prefix4,
        |string_split(p_name, ' ')[1] AS first_word,
        |CAST(length(p_name) AS INTEGER) AS name_len
        |FROM part WHERE p_partkey % 20 = 0 ORDER BY p_partkey""".stripMargin,

    "q26_date_fns" ->
      """SELECT o_orderkey,
        |CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
        |CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
        |CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mon,
        |CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dom,
        |strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |o_orderdate + INTERVAL 30 DAY AS plus30,
        |CAST(last_day(o_orderdate) AS DATE) AS month_end,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002
        |FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin,

    // Mirrors events_series_neighbors: 24-slot profiles with missing
    // hours zero-filled, the 6-segment clipped word, same-word pairs,
    // exact L1, and the identical integer relative threshold
    "events_series_neighbors" ->
      """WITH hrs AS (SELECT unnest(range(0, 24)) AS h),
        |u AS (SELECT DISTINCT user_id FROM events),
        |c AS (SELECT user_id, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
        |        CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |v AS (SELECT u.user_id, hrs.h, COALESCE(c.n, 0) AS n
        |      FROM u CROSS JOIN hrs
        |      LEFT JOIN c ON c.user_id = u.user_id AND c.h = hrs.h),
        |sg AS (SELECT user_id, h // 4 AS s, SUM(n) AS sn FROM v GROUP BY 1, 2),
        |tt AS (SELECT user_id, CAST(SUM(sn) AS BIGINT) AS t FROM sg GROUP BY 1),
        |w AS (SELECT sg.user_id,
        |        CAST(SUM(CASE WHEN sn * 6 > t THEN 1 << CAST(s AS INTEGER)
        |                      ELSE 0 END) AS INTEGER) AS word
        |      FROM sg JOIN tt ON sg.user_id = tt.user_id GROUP BY sg.user_id),
        |ser AS (SELECT user_id, list(n ORDER BY h) AS series FROM v GROUP BY user_id)
        |SELECT a.word, a.user_id AS k1, b.user_id AS k2,
        |  CAST(list_sum(list_transform(list_zip(sa.series, sb.series),
        |    p -> abs(p[1] - p[2]))) AS BIGINT) AS dist,
        |  CAST(ta.t + tb.t AS BIGINT) AS n_events
        |FROM w a JOIN w b ON a.word = b.word AND a.user_id < b.user_id
        |JOIN ser sa ON sa.user_id = a.user_id
        |JOIN ser sb ON sb.user_id = b.user_id
        |JOIN tt ta ON ta.user_id = a.user_id
        |JOIN tt tb ON tb.user_id = b.user_id
        |WHERE list_sum(list_transform(list_zip(sa.series, sb.series),
        |        p -> abs(p[1] - p[2]))) * 10 <= (ta.t + tb.t) * 2
        |ORDER BY k1, k2""".stripMargin,

    "q18_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // Mirrors q77_hopping: each event belongs to the 2 epoch-aligned
    // 2h windows starting at trunc(hour) and trunc(hour) - 1h
    "q77_hopping" ->
      """SELECT date_trunc('hour', ts) - to_hours(j) AS w_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events, unnest([0, 1]) AS t(j)
        |WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "events_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS s1,
        |    CAST(SUM(n * n) AS BIGINT) AS s2, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM hourly GROUP BY 1),
        |scored AS (
        |  SELECT h.event_type, h.hour, h.n,
        |    CAST(s1 AS DOUBLE) / k AS mean,
        |    sqrt(CAST(s2 AS DOUBLE) / k - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k)) AS sigma
        |  FROM hourly h JOIN st USING (event_type))
        |SELECT event_type, hour, n, round((n - mean) / sigma, 4) AS z
        |FROM scored
        |WHERE sigma > 0 AND n > mean + 2.0 * sigma
        |ORDER BY event_type, hour""".stripMargin,

    // Mirrors events_ewma: same 16-step dyadic kernel replayed with
    // DuckDB list lambdas — integers until the final presentation divide
    "events_ewma" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |w AS (
        |  SELECT event_id, user_id,
        |    list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS xs
        |  FROM v)
        |SELECT event_id, user_id,
        |  CAST(list_sum(list_transform(range(1, len(xs) + 1), i ->
        |      xs[i] * (CAST(1 AS BIGINT) << (16 - len(xs) + i - 1))))
        |    AS DOUBLE)
        |  / (CAST((CAST(1 AS BIGINT) << 16)
        |        - (CAST(1 AS BIGINT) << (16 - len(xs))) AS DOUBLE) * 100.0)
        |  AS ewma
        |FROM w ORDER BY user_id, event_id""".stripMargin,

    // Mirrors events_forward_fill: same planted nulls, same IGNORE NULLS
    // running last_value; values pass through untouched so doubles
    // hash bit-for-bit
    "events_forward_fill" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT user_id, event_id, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM ev ORDER BY user_id, event_id""".stripMargin,

    // Mirrors events_autocorr: exact long sums, date+7 equi-join pairing,
    // the same fixed IEEE chain for r
    "events_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s1,
        |    CAST(SUM(x * x) AS BIGINT) AS s2 FROM daily),
        |ps AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(a.x * b.x) AS BIGINT) AS c,
        |    CAST(SUM(a.x) AS BIGINT) AS sh, CAST(SUM(b.x) AS BIGINT) AS st
        |  FROM daily a JOIN daily b ON a.d + 7 = b.d)
        |SELECT n AS n_days, np AS n_pairs,
        |  round((CAST(c AS DOUBLE) - (CAST(s1 AS DOUBLE) / n) * (sh + st)
        |      + np * ((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
        |    / (CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n) * s1), 6) AS r7
        |FROM st CROSS JOIN ps""".stripMargin,

    "q72_filter_agg" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'O') AS DECIMAL(18,2)) AS total_o,
        |  MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'P') AS max_p
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // GROUPING() bitmask convention matches Spark's grouping_id():
    // leftmost argument is the most significant bit
    "q73_grouping_id" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |  COALESCE(o_orderpriority, '(all)') AS priority,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,

    "q74_posexplode" ->
      """SELECT p_partkey, CAST(i - 1 AS BIGINT) AS pos,
        |  parts[CAST(i AS INTEGER)] AS word
        |FROM (
        |  SELECT p_partkey, string_split(p_name || ' ' || p_type, ' ') AS parts,
        |    unnest(range(1, len(string_split(p_name || ' ' || p_type, ' ')) + 1)) AS i
        |  FROM part)
        |WHERE length(parts[CAST(i AS INTEGER)]) >= 5
        |ORDER BY p_partkey, pos""".stripMargin,

    // Mirrors privacy_k_anon: equivalence-class sizes of the QI pair
    "privacy_k_anon" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS gsz
        |  FROM customer GROUP BY 1, 2)
        |SELECT gsz AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(gsz) AS BIGINT) AS n_rows
        |FROM g GROUP BY gsz ORDER BY group_size""".stripMargin,

    // Mirrors q76_integrity: the same five contract checks as plain SQL
    "q76_integrity" ->
      """SELECT 'orphan_orders' AS check_name, CAST(COUNT(*) AS BIGINT) AS n_bad
        |FROM orders o WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'orphan_lineitems', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'dup_custkey', CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM (
        |  SELECT COUNT(*) AS n FROM customer GROUP BY c_custkey)
        |UNION ALL
        |SELECT 'dup_lineitem_pk', CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM (
        |  SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |UNION ALL
        |SELECT 'null_orderdate', CAST(COUNT(*) AS BIGINT)
        |FROM orders WHERE o_orderdate IS NULL
        |ORDER BY check_name""".stripMargin,

    // Mirrors q75_skyline: textbook NOT EXISTS strict-dominance — the
    // declarative definition the distributed frontier must reproduce
    "q75_skyline" ->
      """WITH p AS (
        |  SELECT *, CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        |  FROM part)
        |SELECT a.p_partkey, a.p_name, a.p_size, a.p_retailprice
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.pc <= a.pc AND b.p_size >= a.p_size
        |    AND (b.pc < a.pc OR b.p_size > a.p_size))
        |ORDER BY a.p_partkey""".stripMargin,

    // Mirrors events_convert_median; quantile_disc(0.5) is the same
    // lower-median order statistic as the grid-CDF selection
    "events_convert_median" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS p_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
        |  GROUP BY e.user_id),
        |d AS (
        |  SELECT (epoch_us(p_ts) - epoch_us(v_ts)) // 1000000 AS sec
        |  FROM p JOIN v USING (user_id))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(quantile_disc(sec, 0.5) AS BIGINT) AS median_s
        |FROM d""".stripMargin,

    "q19_events_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        |COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,

    "q20_sessionize" ->
      """WITH gapped AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS new_session
        |  FROM gapped),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "q58_session_window" ->
      """WITH gapped AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
        |         THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS brk
        |  FROM gapped),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS w_start,
        |  max(ts) + INTERVAL 30 MINUTE AS w_end, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin,

    "q17_above_avg" ->
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
        |JOIN (SELECT c_nationkey AS nk,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS nation_avg
        |FROM customer GROUP BY c_nationkey) a ON c.c_nationkey = a.nk
        |WHERE c_acctbal > nation_avg ORDER BY c_custkey""".stripMargin
  )
}
