package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge DataFrames.
  *
  * PageRank here is the fixed-iteration, FIXED-POINT variant: ranks are
  * carried as integer micro-units (1e-9 of total rank mass) and every
  * per-edge contribution is an integer floor division — no floating
  * point anywhere in the trajectory, so the result is independent of
  * partition/summation order and bit-identical across engines. (An
  * earlier draft rounded IEEE doubles to 9 dp per round; one node per
  * ~10^5 landed exactly on a half boundary where Spark's
  * BigDecimal-via-toString HALF_UP and DuckDB's round() disagree — the
  * same boundary class the bigram-NLL operator hit. Integer fixed-point
  * removes the boundary instead of narrowing it.) The only float op is
  * the final presentation divide.
  *
  * Scale shape (the part that must survive 100 TB): state per round is
  * one (node, rank) frame; each iteration is ONE equi-join of the
  * checkpointed adjacency (edges + out-degree) against the current
  * ranks and ONE map-side-combinable sum keyed by dst. The adjacency is
  * pinned once; the rank rounds chain lazily (each consumed exactly
  * once, so the bounded-iters plan computes every round once in one
  * job). Operators whose rounds re-reference their own output (kCore,
  * connected components) checkpoint per round instead — no driver
  * state beyond the scalar node count either way.
  */
object Graph {

  private val Scale = 1000000000L // 1e9 micro-units of rank mass

  /** Symmetric closure of an undirected (a, b[, ...]) edge list. When
    * `dedupSymmetric` the union is re-deduplicated — the safe default
    * for arbitrary input. Callers that can PROVE the two directions
    * cannot collide (bipartite id domains, or canonical a < b
    * orientation with no duplicate rows) pass dedupSymmetric = false
    * and skip a full-edge-list shuffle — at 100 TB that is one shuffle
    * of the biggest table in the job bought back by a one-line proof.
    * (With the contract violated, duplicate directed edges double-count
    * degree/flow — the specs pin both paths equal on honest input.) */
  private def symmetric(pairs: DataFrame, extra: Seq[String],
      dedupSymmetric: Boolean): DataFrame = {
    // weighted callers merge duplicates themselves — a silent
    // no-dedup-with-extras path would reintroduce the double-count bug
    // the flag exists to prevent
    require(extra.isEmpty || !dedupSymmetric,
      "symmetric: dedup of weighted edges is the caller's merge step")
    // self-loops dropped: (a, a) would appear TWICE in the closure and
    // double its own degree/flow — on every path, so the w=1 ==
    // unweighted-PageRank equivalence holds on any input
    val simple = pairs.filter(col("a") =!= col("b"))
    // one-pass closure via a map-side explode, NOT union(fwd, rev): a
    // union's two legs each embed the full upstream plan, so an edge
    // list that is itself a join (the co-purchase and trade graphs)
    // would be computed twice — ReuseExchange only dedups the final
    // exchange, not the upstream join work. The explode doubles rows
    // map-locally in the same scan task for free.
    val both = simple.select(explode(array(
      struct((col("a").as("src") +: col("b").as("dst") +:
        extra.map(c => col(c).as(c))): _*),
      struct((col("b").as("src") +: col("a").as("dst") +:
        extra.map(c => col(c).as(c))): _*))).as("e"))
    val cols = Seq("src", "dst") ++ extra
    val u = both.select(cols.map(c => col(s"e.$c").as(c)): _*)
    if (dedupSymmetric && extra.isEmpty) u.distinct() else u
  }

  /** PageRank over an UNDIRECTED graph given as distinct (a, b) pairs
    * (each undirected edge listed once; the symmetric closure is built
    * here). `dampingPct` is the damping factor in integer percent (85 =
    * the standard 0.85) — integer so the damping multiply stays exact.
    * Returns (node, rank) with rank surfaced as DOUBLE by one final
    * presentation divide. Isolated nodes cannot occur: the node set is
    * defined by the edges, so every node has degree >= 1 and both an
    * out- and in-edge — every rank row is produced by the aggregation,
    * no left-join backfill needed. Floor division leaks ≤ deg micro
    * units of mass per node per round; at 1e9 units that is < 1e-6
    * relative and, unlike IEEE rounding, identically reproducible. */
  def pageRank(pairs: DataFrame, iters: Int = 3,
      dampingPct: Int = 85, dedupSymmetric: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct > 0 && dampingPct < 100,
      s"dampingPct must be in (0, 100), got $dampingPct")
    val ed = symmetric(pairs, Nil, dedupSymmetric)
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // lazy persists, ONE materialize job: nodes.count() below computes
    // adj and the node set together — the eager-localCheckpoint form ran
    // two extra materialize jobs before the count (plans here are flat
    // one-shot DAGs, so lineage truncation buys nothing)
    val adj = ed.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    // node set derived ONCE from the pinned adjacency: n is a count of
    // the cached blocks and ranks_0 reuses them — not a separate
    // countDistinct job plus a distinct shuffle
    val nodes = adj.select(col("src").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    // teleport mass per node, all integer: ((100-d)% of Scale) / n
    val teleportU = ((100L - dampingPct) * Scale / 100L) / n
    var ranks = nodes.withColumn("rank_u", lit(Scale / n))
    // rounds stay LAZY: unlike the kCore rounds (whose frame references
    // the previous round THREE times and must checkpoint), each ranks_r
    // here is consumed exactly once by ranks_{r+1}, so the chained plan
    // computes every round once in ONE job — per-round eager
    // checkpoints just add a materialize job per round (measured r8:
    // pagerank 1.58s -> 0.9s dropping them). `adj`, referenced every
    // round, is the one frame that stays pinned. Same arithmetic ->
    // same integer trajectory -> same oracle hash; iters is small and
    // bounded (3-20), so plan depth stays trivial.
    for (_ <- 1 to iters) {
      // stays SortMergeJoin: the r15 A/B of a shuffle_hash hint on the
      // ranks leg (rationale: the adj leg arrives sorted from its own
      // construction, so SMJ's only per-round sort is |V| rank rows;
      // a hash build would drop it) measured a WASH — pagerank
      // 2.595s -> 2.578s, weighted 2.534s -> 2.584s, same-session
      // subset protocol (bench_ab/r15_graph_{before,after}.json) —
      // the per-partition hash build of ranks costs what the sort
      // cost. No win at any scale where both are O(|V|/P); keep the
      // default.
      val contrib = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("rank_u div deg").as("c"))
      ranks = contrib.groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(teleportU) + expr(s"($dampingPct * s) div 100")).as("rank_u"))
    }
    ranks.select(col("node"),
      (col("rank_u").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** WEIGHTED fixed-point PageRank: like [[pageRank]] but each
    * undirected edge carries an integer weight `w` (parallel edges
    * merge by summing), and a node's rank flows to its neighbors
    * proportionally to edge weight — contribution = (rank_u * w) div
    * sw_u with sw_u the node's total incident weight. Still pure
    * integer arithmetic end-to-end (weights are exact longs), so the
    * trajectory is partition-order invariant and engine-replayable;
    * with all weights 1 the kernel reduces to (rank_u * 1) div deg —
    * bit-identical to [[pageRank]] (spec-asserted). Same pinned
    * adjacency + lazy rounds. Input columns: (a, b, w). */
  def pageRankWeighted(pairs: DataFrame, iters: Int = 3,
      dampingPct: Int = 85, dedupSymmetric: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPct > 0 && dampingPct < 100,
      s"dampingPct must be in (0, 100), got $dampingPct")
    // dedupSymmetric here merges PARALLEL edges by summing weights; a
    // caller attesting one row per (a, b) with collision-free closure
    // skips that full-edge shuffle, same contract as the unweighted path
    // non-positive weights dropped: a node whose incident weights sum
    // to zero would make every contribution a silent null (div by 0)
    // and leak rank mass instead of failing loudly
    val ed0 = symmetric(pairs.filter(col("w") > 0), Seq("w"),
      dedupSymmetric = false)
    val ed = if (dedupSymmetric)
      ed0.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    else ed0
    val sw = ed.groupBy(col("src")).agg(sum(col("w")).as("sw"))
    // same lazy-persist + one-count materialization as [[pageRank]]
    val adj = ed.join(sw, "src").persist(StorageLevel.MEMORY_AND_DISK)
    // same node-set derivation and LAZY rounds as [[pageRank]] (each
    // ranks_r consumed exactly once; only the thrice-read adj is pinned)
    val nodes = adj.select(col("src").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val teleportU = ((100L - dampingPct) * Scale / 100L) / n
    var ranks = nodes.withColumn("rank_u", lit(Scale / n))
    for (_ <- 1 to iters) {
      // stays SortMergeJoin — same measured-wash A/B as [[pageRank]]'s loop
      val contrib = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("(rank_u * w) div sw").as("c"))
      ranks = contrib.groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(teleportU) + expr(s"($dampingPct * s) div 100")).as("rank_u"))
    }
    ranks.select(col("node"),
      (col("rank_u").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Exact per-node triangle counts (and local clustering coefficient)
    * over an UNDIRECTED simple graph given as (a, b) pairs (any
    * orientation, duplicates tolerated).
    *
    * Scale shape: the naive wedge join explodes on hubs — a node of
    * degree d generates d^2 wedges, and a power-law graph at 100 TB has
    * d in the millions. The standard fix (degree orientation): orient
    * every edge from its lower-(degree, id) endpoint to its higher one;
    * every triangle then has exactly ONE node with two out-edges, and
    * out-degree is bounded by O(sqrt(m)) — the wedge join is
    * sum(outdeg^2) = O(m^1.5) total work independent of hub skew, the
    * optimal bound for exact triangle listing. Three equi-joins, no
    * cartesian, no window; per-node attribution is one explode + one
    * map-combinable count.
    *
    * The orientation comparator is (deg, id) lexicographic via struct
    * comparison, a total order, so each triangle is produced exactly
    * once: from its unique minimum vertex, with the closing edge
    * looked up in the same canonical orientation.
    *
    * `materialize = true` (the default, for library callers): the
    * per-node result — bounded by the node count, tiny next to the
    * edge set — is eagerly materialized via localCheckpoint and the
    * two internal caches (`und`, `oriented`) are unpersisted before
    * returning, so no Dataset cache survives the call. The
    * localCheckpoint's own RDD blocks DO outlive it (they back the
    * returned frame) and are reclaimed by the ContextCleaner when the
    * result is GC'd; callers that need them gone sooner sweep
    * `spark.sparkContext.getPersistentRDDs` the way Bench/Verify do.
    * `materialize = false` is the graft-internal harness mode: it
    * returns the full lazy plan (required by the plan-shape specs,
    * which must see the joins, and by Bench, which must time plan +
    * execution together); in that mode the TWO CACHED FRAMES ARE THE
    * CALLER'S TO CLEAN — Bench/Verify sweep them via
    * `spark.catalog.clearCache()` after every query.
    */
  def triangles(pairs: DataFrame, materialize: Boolean = true,
      inputCanonical: Boolean = false): DataFrame = {
    // canonical undirected edge set: u < v by id, self-loops dropped.
    // und and oriented are each referenced by several joins below;
    // without persist Catalyst re-executes the whole upstream (edge
    // derivation + distinct + degree joins) once per reference. Plain
    // persist (not checkpoint) is right here: the plan is a DAG with
    // shared nodes, not an iterative chain, so lineage depth is fixed.
    // `inputCanonical = true` is a caller ATTESTATION (same contract as
    // pageRank's dedupSymmetric=false): the pairs are already distinct
    // with a < b, so the least/greatest + distinct full-edge shuffle is
    // provably a no-op and skipped. GraphSpec asserts both paths emit
    // identical rows on canonical input.
    val und = (if (inputCanonical)
        pairs.select(col("a").as("u"), col("b").as("v"))
      else pairs.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient each edge from lower (deg, id) to higher (deg, id)
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("src"), col("v").as("dst"),
          col("dv").as("ddst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst"),
          col("du").as("ddst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.ddst").as("ddst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges from each pivot's out-neighborhood, canonically ordered by
    // (deg, id) so the closing edge matches in its stored orientation
    val w2 = oriented.as("o1").join(oriented.as("o2"),
        col("o1.src") === col("o2.src") &&
          (struct(col("o1.ddst"), col("o1.dst")) <
            struct(col("o2.ddst"), col("o2.dst"))))
      .select(col("o1.src").as("tu"), col("o1.dst").as("tv"),
        col("o2.dst").as("tw"))
    val tris = w2.join(oriented,
        col("tv") === col("src") && col("tw") === col("dst"))
      .select(col("tu"), col("tv"), col("tw"))
    val perNode = tris
      .select(explode(array(col("tu"), col("tv"), col("tw"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("lcc",
        when(col("degree") < 2, lit(0.0))
          .otherwise((lit(2.0) * col("n_tri").cast("double")) /
            (col("degree").cast("double") *
              (col("degree").cast("double") - 1.0))))
    if (materialize) {
      val result = out.localCheckpoint(true)
      und.unpersist(false)
      oriented.unpersist(false)
      result
    } else out
  }

  /** k-core peeling over an UNDIRECTED graph given as (a, b) pairs:
    * `rounds` iterations of "drop every node with degree < k, restrict
    * edges to survivors". Fixed-round semantics like [[pageRank]] — the
    * result is the state after exactly `rounds` peels (one extra round
    * past convergence is a no-op, so any rounds >= the cascade depth
    * yields THE k-core; the oracle replays the same rounds verbatim).
    * Returns the surviving (node, core_deg) — each node's degree within
    * the final subgraph.
    *
    * Fixed-point early exit: a peel that removes NO edges is the
    * identity, and so is every later peel — so once the directed edge
    * count is unchanged across a round, the remaining rounds are
    * skipped. Result-identical to running all `rounds` (which is why
    * the unrolled DuckDB oracle still matches); what it saves is the
    * dominant cost at small scale, per-round JOB LATENCY (degree agg +
    * two semi-joins + checkpoint ≈ fixed driver cost regardless of
    * data size). The count itself is a cheap scan of the round's
    * already-materialized checkpoint blocks.
    *
    * Scale shape: each round is ONE map-combinable degree count + two
    * semi-joins restricting the edge set — no windows, no driver state
    * beyond the loop counter; eager per-round localCheckpoint keeps
    * lineage O(1) exactly like the PageRank/CC rounds. Edge set only
    * ever shrinks, so round cost is monotone non-increasing.
    *
    * `checkpointRounds = false` is a TEST hook: it keeps the full
    * 5-round logical plan inspectable (checkpointing truncates the plan
    * to cached blocks, which would make any plan-shape assertion
    * vacuous). It also disables the early exit — the fixed-point probe
    * is a count() ACTION, which would execute the very plan the hook
    * exists to keep lazy.
    */
  def kCore(pairs: DataFrame, k: Int, rounds: Int = 5,
      checkpointRounds: Boolean = true,
      inputCanonical: Boolean = false): DataFrame =
    kCoreWithRounds(pairs, k, rounds, checkpointRounds, inputCanonical)._1

  /** [[kCore]] plus the number of peel rounds actually executed —
    * the early-exit contract's test surface. `inputCanonical` is the
    * same caller attestation as [[triangles]]: pairs already distinct
    * with a < b, so the symmetric closure cannot collide and the
    * initial distinct shuffle is skipped (spec-asserted equal). */
  private[graft] def kCoreWithRounds(pairs: DataFrame, k: Int,
      rounds: Int = 5, checkpointRounds: Boolean = true,
      inputCanonical: Boolean = false): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // localCheckpoint (eager) each round, not persist/unpersist: the
    // round frame references `ed` THREE times (degree agg + both
    // semi-join left legs), so a lazy-lineage chain nests the previous
    // round's plan 3^k deep by round k and round cost doubles instead of
    // shrinking (measured: 0.9s -> 8.3s by round 5 on the persist
    // variant). Checkpointing truncates the plan to cached blocks each
    // round — same rationale as the CC pointer-doubling rounds.
    def cp(df: DataFrame): DataFrame =
      if (checkpointRounds) df.localCheckpoint(true) else df
    // the fixed-point probe's edge count rides the checkpoint job as an
    // Observation (CollectMetrics executes inside the materializing
    // action), replacing the separate count() job each round ran over
    // the cached blocks — one job per round instead of two
    def cpCounted(df: DataFrame): (DataFrame, Long) =
      if (checkpointRounds) {
        val obs = org.apache.spark.sql.Observation()
        val out = df.observe(obs, count(lit(1)).as("edges"))
          .localCheckpoint(true)
        (out, obs.get("edges").asInstanceOf[Long])
      } else (df, -1L)
    // one-pass symmetric closure (see [[symmetric]] — the union form
    // would compute the upstream edge build twice)
    val closure = symmetric(pairs, Nil, dedupSymmetric = !inputCanonical)
    var (ed, prevEdges) =
      if (checkpointRounds) cpCounted(closure) else (closure, -1L)
    var round = 0
    var fixedPoint = false
    while (round < rounds && !fixedPoint) {
      val keep = ed.groupBy(col("src")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= k).select(col("src").as("n"))
      // stays SortMergeJoin: the r15 A/B of shuffle_hash hints on the
      // keep side (rationale: drop the two per-round full-edge sorts)
      // measured SLOWER — graph_kcore 1.92s -> 2.85/2.67s on the
      // same-session subset protocol (bench_ab/r15_graph_{before,after}.json,
      // r15_kcore_after2.json) — the per-partition hash-set build of
      // keep, paid twice per round, costs more than the sorts it
      // removes at every scale where keep is a meaningful fraction of
      // the edge count. Measured negative; keep the SMJ.
      val next = ed
        .join(keep, ed("src") === keep("n"), "left_semi")
        .join(keep, ed("dst") === keep("n"), "left_semi")
      round += 1
      if (checkpointRounds) {
        val (nextEd, c) = cpCounted(next)
        ed = nextEd
        // unchanged count == no edge dropped == every node kept: the
        // next round's keep-set is identical, hence a fixed point
        if (c == prevEdges) fixedPoint = true
        prevEdges = c
      } else ed = next
    }
    (ed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_deg")), round)
  }

  /** Degree assortativity (Pearson correlation of endpoint degrees over
    * the directed-both-ways edge list) — the one-number readout of
    * hub-to-hub vs hub-to-leaf wiring that decides whether degree-skew
    * mitigations (orientation, salting) will matter downstream.
    *
    * All five moment sums accumulate as DECIMAL(38,0) — exact,
    * partition-order invariant, map-side combinable in one aggregation
    * over the edge list, and overflow-proof where a Long accumulator
    * would wrap silently under non-ANSI arithmetic (a hub of degree
    * ~1e6 over 1e9 directed edges already pushes sum(dx*dx) past 2^63;
    * 38 decimal digits cover any graph below ~1e19 edge-degree-square
    * mass). `r` is computed from the exact decimals; the sum columns
    * are cast to BIGINT only at the output surface, where an
    * out-of-range value turns NULL (visible) rather than wrapping into
    * a plausible-looking wrong number. Returns one row: n (directed
    * edges), the five sums, r.
    */
  def assortativity(pairs: DataFrame,
      dedupSymmetric: Boolean = true): DataFrame = {
    // dedupSymmetric = false is the same attestation as pageRank's:
    // input already one row per undirected edge with a collision-free
    // closure (bipartite domains or canonical orientation), so the
    // full-edge-list distinct shuffle is skipped (spec-asserted equal)
    val ed = symmetric(pairs, Nil, dedupSymmetric)
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // ONE degree join, not two, and the final moment aggregation runs
    // over |V| node rows instead of |E| edge rows. On the symmetric
    // closure every per-edge moment decomposes through the degree
    // sequence: sum over directed edges of dx (= deg(src)) is
    // sum_v deg(v)^2, sum of dx^2 is sum_v deg(v)^3, and by symmetry
    // sy == sx and syy == sxx. Only sxy = sum_e deg(src)*deg(dst)
    // needs joint endpoint info, and it factors as
    // sum_v deg(v) * S(v) with S(v) = sum of v's neighbors' degrees —
    // so tagging each edge with its SOURCE degree and re-keying by dst
    // yields a per-node frame (deg(v) = group count, S(v) = sum of the
    // tagged source degrees) that carries everything. Net plan vs the
    // naive two-join form: the ed-by-src exchange is shared between
    // the degree count and the join (ReuseExchange), the dst-side
    // second join and the full-edge-list final scan disappear.
    val perNode = ed.join(deg, Seq("src"))
      .groupBy(col("dst"))
      // widen BEFORE summing: per-node neighbor-degree mass for a hub
      // (~1e6 neighbors of degree ~1e6) already passes 2^63
      .agg(count(lit(1)).as("d"),
        sum(col("deg").cast(DecimalType(19, 0))).as("snbr"))
    val dD = col("d").cast(DecimalType(19, 0))
    val d2 = (dD * dD).cast(DecimalType(38, 0))
    perNode.agg(
        // n (directed edges) = sum of degrees; coalesce keeps the
        // empty-graph row at 0 like the count(1) form it replaces
        coalesce(sum(dD), lit(0).cast(DecimalType(19, 0)))
          .cast("long").as("n"),
        sum(d2).as("sxd"),
        sum((d2 * dD).cast(DecimalType(38, 0))).as("sxxd"),
        sum((dD * col("snbr")).cast(DecimalType(38, 0))).as("sxyd"))
      .withColumn("r",
        (col("n").cast("double") * col("sxyd").cast("double") -
          col("sxd").cast("double") * col("sxd").cast("double")) /
        (sqrt(col("n").cast("double") * col("sxxd").cast("double") -
            col("sxd").cast("double") * col("sxd").cast("double")) *
          sqrt(col("n").cast("double") * col("sxxd").cast("double") -
            col("sxd").cast("double") * col("sxd").cast("double"))))
      .select(col("n"),
        col("sxd").cast("long").as("sx"), col("sxd").cast("long").as("sy"),
        col("sxyd").cast("long").as("sxy"),
        col("sxxd").cast("long").as("sxx"),
        col("sxxd").cast("long").as("syy"), col("r"))
  }

  /** [[assortativity]] specialized to a BIPARTITE edge list — `pairs`
    * must be one row per distinct (a, b) edge with the a-domain and
    * b-domain disjoint (the caller's attestation, same contract shape
    * as `dedupSymmetric = false`). Row-identical to the general path
    * (GraphSpec asserts it) but never materializes the symmetric
    * closure: on a bipartite graph every directed-closure moment
    * splits into an a-side and a b-side degree-sequence term —
    * n = 2|E|, sx = Σda² + Σdb², sxx = Σda³ + Σdb³ — and the one
    * joint moment factors through the neighbor-degree sum,
    * sxy = 2·Σ_b db(b)·S(b) with S(b) = Σ of b's partners' a-degrees.
    * The a-side moments never need their own branch: over the JOINED
    * pair frame each node a contributes its degree da(a) times, so
    * Σ_pairs da = Σ_a da² and Σ_pairs da² = Σ_a da³ — the per-b
    * aggregation carries those two sums alongside db and S(b), and ONE
    * rollup over the b-frame yields every moment. That makes the whole
    * statistic a single aggregation chain — a-keyed exchange (degree
    * count + the single degree join share it), b-keyed exchange, 1-row
    * rollup — with no second branch over the pair frame, no 1-row
    * crossJoin, and only two consumers of the (pinned) dedup versus
    * the general path's closure-doubled src- and dst-keyed exchanges
    * over 2|E| rows (the branchy form measured 11 jobs / 24 stages at
    * sf0.1; this one runs 3). Best fed by a dedup already partitioned
    * on `a` (the trade-graph caller repartitions by a before distinct
    * so the dedup, the degree count, and the join all ride ONE
    * exchange). */
  def assortativityBipartite(pairs: DataFrame): DataFrame = {
    val da = pairs.groupBy(col("a")).agg(count(lit(1)).as("da"))
    val daD = col("da").cast(DecimalType(19, 0))
    val dbD = col("db").cast(DecimalType(19, 0))
    val db2 = (dbD * dbD).cast(DecimalType(38, 0))
    val perB = pairs.join(da, Seq("a"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("db"), sum(daD).as("sb"),
        sum((daD * daD).cast(DecimalType(38, 0))).as("s2b"))
    perB.agg(
        coalesce(sum(dbD), lit(0).cast(DecimalType(19, 0))).as("ne"),
        sum(col("sb")).as("sa2"),
        sum(col("s2b")).as("sa3"),
        sum(db2).as("sb2"), sum((db2 * dbD).cast(DecimalType(38, 0))).as("sb3"),
        sum((dbD * col("sb")).cast(DecimalType(38, 0))).as("sxyh"))
      .select((col("ne") * 2).cast("long").as("n"),
        (col("sa2") + col("sb2")).as("sxd"),
        (col("sa3") + col("sb3")).as("sxxd"),
        (col("sxyh") * 2).as("sxyd"))
      .withColumn("r",
        (col("n").cast("double") * col("sxyd").cast("double") -
          col("sxd").cast("double") * col("sxd").cast("double")) /
        (sqrt(col("n").cast("double") * col("sxxd").cast("double") -
            col("sxd").cast("double") * col("sxd").cast("double")) *
          sqrt(col("n").cast("double") * col("sxxd").cast("double") -
            col("sxd").cast("double") * col("sxd").cast("double"))))
      .select(col("n"),
        col("sxd").cast("long").as("sx"), col("sxd").cast("long").as("sy"),
        col("sxyd").cast("long").as("sxy"),
        col("sxxd").cast("long").as("sxx"),
        col("sxxd").cast("long").as("syy"), col("r"))
  }
}
