package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Fixed-point PageRank: hand-computed tiny graph, partition-order
  * invariance (the whole point of the integer trajectory), mass
  * conservation up to documented floor leak, and plan shape. */
class GraphSpec extends SparkSpec {

  private def pairsDf(es: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    es.toDF("a", "b")
  }

  test("path graph a-b-c matches the hand-computed integer trajectory") {
    // undirected path 1-2-3: deg(1)=deg(3)=1, deg(2)=2, n=3
    val got = Graph.pageRank(pairsDf(Seq((1L, 2L), (2L, 3L))), iters = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // r0 = 1e9/3 = 333333333 each; teleport = 150000000/3 = 50000000
    // node1: from 2: 333333333 div 2 = 166666666 -> 50000000 + 85*166666666 div 100 = 50000000 + 141666666 = 191666666
    // node2: from 1 and 3: 333333333 + 333333333 = 666666666 -> 50000000 + 85*666666666 div 100 = 50000000 + 566666666 = 616666666
    assert(got(1L) == 0.191666666 && got(3L) == 0.191666666)
    assert(got(2L) == 0.616666666)
  }

  test("result is invariant to input partitioning (integer fixed point)") {
    val es = (0L until 400L).map(i => (i % 37, 37 + i % 53))
    val a = Graph.pageRank(pairsDf(es).repartition(1), iters = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Graph.pageRank(pairsDf(es).repartition(13), iters = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("rank mass is conserved up to the documented floor leak") {
    val es = (0L until 300L).map(i => (i % 29, 29 + i % 31))
    val ranks = Graph.pageRank(pairsDf(es), iters = 3)
    val total = ranks.agg(sum(col("rank"))).first().getDouble(0)
    // each node leaks < (deg + 100) / 1e9 per round to floor division;
    // with 60 nodes x 3 rounds the leak stays well under 1%
    assert(total > 0.99 && total <= 1.0, s"mass $total")
  }

  test("triangles: hand-computed counts on K4 minus one edge") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    // deg: 1->3, 2->3, 3->2, 4->2. n_tri: 1->2, 2->2, 3->1, 4->1.
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val got = Graph.triangles(pairsDf(es)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(got(2L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(got(3L) == ((2L, 1L, 1.0)))
    assert(got(4L) == ((2L, 1L, 1.0)))
  }

  test("triangles: default (materialize) leaves no cached frames behind") {
    // library-caller contract: the two internal persists (und, oriented)
    // must be unpersisted before the call returns — a long-lived session
    // calling triangles in a loop must not accumulate cached plans
    spark.catalog.clearCache()
    val got = Graph.triangles(pairsDf(Seq((1L, 2L), (2L, 3L), (1L, 3L))))
    assert(got.count() == 3L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "triangles leaked cached frames into the session")
  }

  test("triangles: star graph has none; duplicates/orientation ignored") {
    // star 0-{1..20}, edges listed in both orders with duplicates
    val es = (1L to 20L).flatMap(i => Seq((0L, i), (i, 0L), (0L, i)))
    val got = Graph.triangles(pairsDf(es))
    assert(got.agg(sum(col("n_tri"))).first().getLong(0) == 0L)
    assert(got.filter(col("node") === 0L).first().getLong(1) == 20L)
  }

  test("triangles: matches brute force on a random graph, any partitioning") {
    val es = (0L until 300L).map(i => ((i * 7) % 23, (i * 13) % 29 + 1))
      .filter { case (a, b) => a != b }
    def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toSet
      val nodes = e.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
      val tris = for {
        i <- nodes; j <- nodes if i < j && e((i, j))
        k <- nodes if j < k && e((j, k)) && e((i, k))
      } yield Seq(i, j, k)
      tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
        .withDefaultValue(0L)
    }
    val exp = brute(es)
    for (p <- Seq(1, 13)) {
      val got = Graph.triangles(pairsDf(es).repartition(p)).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got.keySet.forall(n => got(n) == exp(n)), s"p=$p")
      assert(got.values.sum == exp.values.sum, s"p=$p")
    }
  }

  test("triangles: degree-oriented plan has no cartesian and no window") {
    // materialize=false: the eager default checkpoints, truncating the
    // plan to a scan of cached blocks and making these asserts vacuous
    val plan = Graph.triangles(pairsDf(Seq((1L, 2L), (2L, 3L), (1L, 3L))),
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("kCore peels a tail off a clique and cascades through chains") {
    // K4 on {1,2,3,4} plus a pendant chain 4-5-6: the 2-core is exactly
    // the K4 (5 and 6 peel in cascade: 6 first, then 5)
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = Graph.kCore(pairsDf(es), k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: extra rounds past convergence are a no-op; empty core is empty") {
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val a = Graph.kCore(pairsDf(es), k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.kCore(pairsDf(es), k = 2, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "converged core must be a fixed point")
    // a path graph has no 3-core at all
    val path = (0L until 10L).map(i => (i, i + 1))
    assert(Graph.kCore(pairsDf(path), k = 3, rounds = 4).count() == 0L)
  }

  test("inputCanonical attestation equals the safe path on canonical input") {
    // a canonical (distinct, a < b) edge list — the bulkCoPurchaseEdges
    // contract — must produce IDENTICAL rows with and without the
    // attestation, for both consumers that accept it
    val es = (0L until 200L).map(i => ((i * 7) % 23, (i * 13) % 29 + 30))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val df = pairsDf(es)
    val triSafe = Graph.triangles(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val triFast = Graph.triangles(df, inputCanonical = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(triFast == triSafe, "triangles diverged under attestation")
    val coreSafe = Graph.kCore(df, k = 3, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val coreFast = Graph.kCore(df, k = 3, rounds = 4, inputCanonical = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(coreFast == coreSafe, "kCore diverged under attestation")
  }

  test("kCore early-exits at the fixed point and still matches the full run") {
    // a K4 IS its own 2-core: round 1 removes nothing, so the fixed
    // point is detected immediately and rounds 2..5 are skipped
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val (core, ran) = Graph.kCoreWithRounds(pairsDf(clique), k = 2, rounds = 5)
    assert(ran == 1, s"already-converged graph should peel once, ran $ran")
    assert(core.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set(1L, 2L, 3L, 4L).map(_ -> 3L))
    // pendant chain needs the cascade (6 peels, then 5, then fixed):
    // exit is AFTER convergence, never before — result identical to the
    // uncapped run and the rounds executed are bounded by the cascade
    // (executing the checkpointRounds=false lazy plan as a baseline is
    // deliberately avoided: its 3^rounds-nested plan exists for SHAPE
    // assertions, not execution — hand-compute the 2-core instead)
    val es = clique ++ Seq((4L, 5L), (5L, 6L))
    val (core2, ran2) = Graph.kCoreWithRounds(pairsDf(es), k = 2, rounds = 5)
    assert(ran2 == 3, s"cascade depth 2 + 1 fixed-point probe, ran $ran2")
    assert(core2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set(1L, 2L, 3L, 4L).map(_ -> 3L),
      "early-exited cascade must still land on THE 2-core")
  }

  test("pageRank ignores self-loops on both weighted and unweighted paths") {
    val sp = spark
    import sp.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val withLoop = base ++ Seq((2L, 2L))
    val a = Graph.pageRank(pairsDf(base), iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Graph.pageRank(pairsDf(withLoop), iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b, "a self-loop changed the unweighted trajectory")
    val wa = Graph.pageRankWeighted(
        base.map { case (x, y) => (x, y, 1L) }.toDF("a", "b", "w"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val wb = Graph.pageRankWeighted(
        (withLoop.map { case (x, y) => (x, y, 1L) } ++ Seq((3L, 1L, 0L)))
          .toDF("a", "b", "w"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(wa == wb, "a self-loop or zero-weight edge changed the weighted trajectory")
    assert(a == wa, "w=1 equivalence must hold with loops filtered")
  }

  test("dedupSymmetric=false equals the safe path on collision-free input") {
    val sp = spark
    import sp.implicits._
    // bipartite-style edges: left ids even, right ids odd, distinct rows
    val es = (0L until 300L).map(i => ((i % 40) * 2, (i % 53) * 2 + 1)).distinct
    val a = Graph.pageRank(pairsDf(es), iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Graph.pageRank(pairsDf(es), iters = 3, dedupSymmetric = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b, "attested fast path diverged from the safe path")
    val we = es.map { case (x, y) => (x, y, (x + y) % 5 + 1) }
      .toDF("a", "b", "w")
    val c = Graph.pageRankWeighted(we, iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val d = Graph.pageRankWeighted(we, iters = 3, dedupSymmetric = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(c == d, "attested weighted fast path diverged from the safe path")
  }

  test("weighted PageRank: w=1 reduces to the unweighted trajectory exactly") {
    val sp = spark
    import sp.implicits._
    val es = (0L until 400L).map(i => (i % 37, 37 + i % 53)).distinct
    val flat = es.map { case (a, b) => (a, b, 1L) }
      .toDF("a", "b", "w")
    val weighted = Graph.pageRankWeighted(flat, iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val plain = Graph.pageRank(es.toDF("a", "b"), iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(weighted == plain, "uniform weights must not change the kernel")
  }

  test("weighted PageRank favors the heavy edge on a hand-checked graph") {
    // star 0-{1,2} with w(0,1)=9, w(0,2)=1: node 1 receives 9x node 2's
    // flow from the center; leaves send everything to the center either
    // way, so rank(1) > rank(2) and the exact values follow the kernel
    val sp = spark
    import sp.implicits._
    val g = Seq((0L, 1L, 9L), (0L, 2L, 1L)).toDF("a", "b", "w")
    val got = Graph.pageRankWeighted(g, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // r0 = 333333333 each; teleport = 50000000
    // node1: (333333333 * 9) div 10 = 299999999 -> 50000000 + 85*299999999 div 100 = 50000000 + 254999999 = 304999999
    // node2: (333333333 * 1) div 10 = 33333333 -> 50000000 + 28333333 = 78333333
    // node0: leaves send all: 333333333 + 333333333 = 666666666 -> 616666666
    assert(got(1L) == 0.304999999, s"got ${got(1L)}")
    assert(got(2L) == 0.078333333, s"got ${got(2L)}")
    assert(got(0L) == 0.616666666, s"got ${got(0L)}")
  }

  test("assortativity matches closed-form values and is partition-invariant") {
    // star K1,5 is perfectly disassortative: every edge joins deg-5 to
    // deg-1 -> r = -1 exactly
    val star = (1L to 5L).map(i => (0L, i))
    val rStar = Graph.assortativity(pairsDf(star)).first().getAs[Double]("r")
    assert(rStar == -1.0, s"star r = $rStar")
    // path 1-2-3-4: moments by hand -> r = (6*16-100)/(sqrt8*sqrt8) = -0.5
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val row = Graph.assortativity(pairsDf(path)).first()
    assert(row.getAs[Long]("n") == 6L && row.getAs[Long]("sxy") == 16L)
    // sqrt(8)*sqrt(8) != 8.0 in binary64 — replay the exact float path
    assert(row.getAs[Double]("r") == -4.0 / (math.sqrt(8) * math.sqrt(8)),
      s"path r = ${row.getAs[Double]("r")}")
    // integer moment sums: identical at any parallelism
    val a = Graph.assortativity(pairsDf(star ++ path).repartition(1)).first()
    val b = Graph.assortativity(pairsDf(star ++ path).repartition(13)).first()
    assert(a == b, "assortativity must be partition-order invariant")
    // attestation path: on collision-free input (distinct edges, every
    // pair canonically oriented) skipping the closure dedup must be
    // row-identical to the safe path
    val c = Graph.assortativity(pairsDf(star ++ path),
      dedupSymmetric = false).first()
    assert(c == a, "dedupSymmetric=false diverged on honest input")
  }

  test("bipartite specialization is row-identical to the general path") {
    // skewed bipartite graph, a-domain even / b-domain odd (the trade-
    // graph shape): every moment, the cast surface types, and the float
    // r must match the symmetric-closure path bit-for-bit
    val es = (0L until 500L)
      .map(i => ((i % 23) * 2, (i % 71) * 2 + 1)).distinct
    val general = Graph.assortativity(pairsDf(es), dedupSymmetric = false)
    val bip = Graph.assortativityBipartite(pairsDf(es))
    assert(general.schema == bip.schema,
      s"schema drift: ${general.schema} vs ${bip.schema}")
    assert(general.first() == bip.first(),
      "bipartite moments diverged from the symmetric-closure path")
    // star K1,5 with disjoint domains: r = -1 exactly on both paths
    val star = (1L to 5L).map(i => (0L, i * 2 + 1))
    assert(Graph.assortativityBipartite(pairsDf(star)).first() ==
      Graph.assortativity(pairsDf(star)).first())
  }

  test("per-iteration plan is join + partial-aggregated sum, no cartesian") {
    val plan = Graph.pageRank(pairsDf(Seq((1L, 2L), (2L, 3L))), iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
