package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Posting}

/** The bounded posting-list valve shared by every blocked pair
  * detector: (a) buffers stay ≤ ~maxBucket members even under a
  * pathological 10⁵-member hot block, (b) the owned pair set is
  * IDENTICAL to the uncapped run (split, not drop), and (c) each
  * detector (minhash bands, phash chunks — sax is covered in
  * TimeSeriesSpec) survives a planted degenerate bucket with exact
  * results. */
class PostingSpec extends SparkSpec {

  private def ownedPairs(posting: org.apache.spark.sql.DataFrame) = {
    val ms = col("ms")
    val kept = flatten(transform(sequence(lit(1), size(ms) - 1), i => {
      val a = element_at(ms, i)
      transform(filter(slice(ms, i + 1, size(ms) - i), e => Posting.owns(a, e)),
        e => struct(a.getField("id").as("i"), e.getField("id").as("j")))
    }))
    posting.select(col("block"), explode(kept).as("p"))
      .select(col("block"), col("p.i").as("i"), col("p.j").as("j"))
  }

  test("split postings own every pair exactly once (vs naive, mixed block sizes)") {
    val ss = spark
    import ss.implicits._
    // blocks of size 1, 3, 30, 300 with maxBucket=50: only the 300
    // splits (G=12); expected pairs from plain combinatorics
    val members = Seq(0 -> 1, 1 -> 3, 2 -> 30, 3 -> 300).flatMap {
      case (b, n) => (0 until n).map(k => (b, b * 1000L + k))
    }
    val rows = members.toDF("block", "id")
      .select(col("block"), struct(col("id")).as("m"))
    val got = ownedPairs(Posting.bounded(rows, Seq("block"), "m", 50))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val expect = (for {
      (b, n) <- Seq(0 -> 1, 1 -> 3, 2 -> 30, 3 -> 300)
      i <- 0 until n; j <- (i + 1) until n
    } yield (b, b * 1000L + i, b * 1000L + j)).toSet
    assert(got == expect, s"owned pairs != naive: ${got.size} vs ${expect.size}")
  }

  test("a 1e5-member hot block never builds a buffer over ~maxBucket") {
    val ss = spark
    import ss.implicits._
    val rows = (0L until 100000L).toDF("id")
      .select(lit(0).as("block"), struct(col("id")).as("m"))
    val posting = Posting.bounded(rows, Seq("block"), "m", 2000)
    val stats = posting.agg(max(size(col("ms"))).as("mx"),
      sum(size(col("ms"))).as("tot"), count(lit(1)).as("n")).head()
    // G = ceil(2e5/2000) = 100 -> cross sub-postings average 2000;
    // allow hash-uniformity fluctuation but nothing near the raw 1e5
    assert(stats.getInt(0) <= 2400,
      s"sub-posting too fat: ${stats.getInt(0)}")
    // every member replicated exactly G times across sub-postings
    assert(stats.getLong(1) == 100000L * 100, s"replication off: ${stats.getLong(1)}")
    assert(stats.getLong(2) == 100L * 101 / 2, s"sub-posting count off: ${stats.getLong(2)}")
  }

  test("fat list above broadcastFatMax joins UNHINTED, result identical") {
    val ss = spark
    import ss.implicits._
    // same mixed-size corpus as the ownership test; broadcastFatMax=0
    // forces the no-hint path a 100 TB fat list (10^7-10^8 entries)
    // would take — the optimizer must be free to pick a shuffled join
    // (no forced-broadcast OOM hazard), and the owned pair set must not
    // move
    val members = Seq(0 -> 1, 1 -> 3, 2 -> 30, 3 -> 300).flatMap {
      case (b, n) => (0 until n).map(k => (b, b * 1000L + k))
    }
    val rows = members.toDF("block", "id")
      .select(col("block"), struct(col("id")).as("m"))
    val unhinted = Posting.bounded(rows, Seq("block"), "m", 50,
      broadcastFatMax = 0L)
    assert(!unhinted.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast"),
      "fat join still carries a forced broadcast hint above the gate")
    val got = ownedPairs(unhinted)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val hinted = ownedPairs(Posting.bounded(rows, Seq("block"), "m", 50))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == hinted, "join strategy changed the owned pair set")
  }

  test("no fat block: capped path short-circuits to the classic shape") {
    val ss = spark
    import ss.implicits._
    val rows = Seq((0, 1L), (0, 2L), (0, 3L), (1, 8L), (1, 9L))
      .toDF("block", "id")
      .select(col("block"), struct(col("id")).as("m"))
    val posting = Posting.bounded(rows, Seq("block"), "m", 50)
    val p = posting.queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin").foreach(j =>
      assert(!p.contains(j), s"no-fat valve still plans a $j:\n$p"))
    assert(p.contains("InMemoryTableScan"),
      s"no-fat valve lost the compute-once pin:\n$p")
    val got = posting.collect()
    assert(got.forall(_.getAs[Int]("_g1") == -1))
    assert(ownedPairs(posting).count() == 3 + 1)
  }

  test("the pin self-releases at the caller's next action (no sweep needed)") {
    val ss = spark
    import ss.implicits._
    val rows = (0L until 500L).toDF("id")
      .select((col("id") % 3).as("block"), struct(col("id")).as("m"))
    val posting = Posting.bounded(rows, Seq("block"), "m", 64)
    assert(rows.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "valve did not pin its input for the count pass")
    // an UNRELATED action on the shared session must NOT release the
    // pin — on a shared/multi-threaded session that would silently
    // recompute the expensive upstream when the posting is consumed
    (0L until 10L).toDF("x").count()
    // deterministic negative: drain the async bus so a wrong release
    // from the unrelated action HAS landed by the time we assert — a
    // fixed sleep could pass vacuously under CI load
    drainListenerBus()
    assert(rows.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "an unrelated action released the valve pin before consumption")
    posting.count() // the consuming action — the release boundary
    // the QueryExecutionListener fires asynchronously on the bus thread
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (rows.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(rows.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "valve pin still cached after the consuming action — session leak")
    // the pin was a performance artifact only: recompute is identical
    // (ids mod 3: blocks of 167, 167, 166 members)
    assert(ownedPairs(posting).count() ==
      2L * (167L * 166 / 2) + 166L * 165 / 2)
  }

  test("uncapped path keeps the classic single-aggregation posting shape") {
    val ss = spark
    import ss.implicits._
    val rows = Seq((0, 1L), (0, 2L), (0, 3L), (1, 9L))
      .toDF("block", "id")
      .select(col("block"), struct(col("id")).as("m"))
    val posting = Posting.bounded(rows, Seq("block"), "m", Int.MaxValue)
    val got = posting.collect()
    assert(got.length == 1 && got.head.getAs[Int]("_g1") == -1)
    assert(ownedPairs(posting).count() == 3)
  }

  test("minhashLshPairs: 500 identical docs, cap 50 — same pairs as uncapped") {
    val ss = spark
    import ss.implicits._
    val docs = (1L to 500L)
      .map(i => (i, "the same exact document body repeated verbatim"))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(docs, maxBucket = 50)
    assert(capped.count() == 500L * 499 / 2)
    assert(capped.filter(col("est_jaccard") < 1.0).count() == 0)
    assert(capped.select("i", "j").distinct().count() == 500L * 499 / 2)
  }

  test("simhashPairs: 400 near-identical docs ride the shared valve, default cap real") {
    val ss = spark
    import ss.implicits._
    // one dominant token multiset: simhashes collide, every (chunk,
    // value) block holds ~the whole corpus — the buffer-OOM shape
    val docs = (1L to 400L)
      .map(i => (i, ("alpha beta gamma delta " * 10) + s"tail${i % 3}"))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val un = pairs(Dedup.simhashPairs(docs, 3, maxBucket = Int.MaxValue))
    val capped = pairs(Dedup.simhashPairs(docs, 3, maxBucket = 32))
    // ~all within-tail-variant pairs qualify: 3 groups of ~134 docs
    assert(un.size >= 400 * 60, s"corpus not degenerate enough: ${un.size}")
    assert(capped == un, "the bounded valve changed simhash's pair set")
  }

  test("winnowPairs: the df-cap fires BEFORE the posting buffer (anti-join plan)") {
    val ss = spark
    import ss.implicits._
    // 300 identical docs: every fingerprint is hot (df=300 > cap) and
    // must be EXCLUDED before collect_list; two near-copies that share
    // nothing with the hot block must still pair
    val hot = (1L to 300L).map(i => (i, "replicated boilerplate page body " * 6))
    val near = Seq(
      901L -> "unique snowflake content alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima",
      902L -> "unique snowflake content alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima extra")
    val docs = (hot ++ near).toDF("doc_id", "text")
    val got = Dedup.winnowPairs(docs, minShared = 5, maxDocFreq = 8)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"hot fingerprints are not excluded before the buffer:\n$plan")
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((901L, 902L)),
      s"expected exactly the planted near pair, got $rows")
  }

  test("span operators qualify grams with NO posting buffer at any skew") {
    val ss = spark
    import ss.implicits._
    // one 5-gram shared by every doc — the old collect-then-filter
    // shape would buffer all 500 (doc_id, pos) entries in one row
    val docs = (1L to 500L)
      .map(i => (i, s"shared five gram span here unique$i tail"))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, n = 5)
    assert(!spans.queryExecution.executedPlan.toString.contains("collect_list"),
      "repeatedSpans still materializes a posting buffer")
    assert(spans.count() == 500, "every doc carries the shared span")
    // the df valve still governs semantics: capped grams drop
    assert(Dedup.repeatedSpans(docs, n = 5, maxDocFreq = 100).count() == 0)
    // applySpanDedup: owner keeps its tokens, every other doc is cut
    val applied = Dedup.applySpanDedup(docs, n = 5)
    assert(applied.filter(col("doc_id") === 1L)
      .head.getAs[Long]("n_removed") == 0L)
    assert(applied.filter(col("doc_id") =!= 1L)
      .filter(col("n_removed") === 0L).count() == 0)
  }

  test("phashPairs: 300 identical images, cap 50 — same pairs as uncapped") {
    val ss = spark
    import ss.implicits._
    val img = Multimodal.PgmImage(8, 8,
      Array.tabulate(64)(i => (i * 37) % 256))
    val bytes = Multimodal.Pgm.encodeP5(img)
    val media = (1L to 300L).map(i => (i, bytes)).toDF("media_id", "payload")
    val capped = Multimodal.phashPairs(spark, media, maxBucket = 50)
    assert(capped.count() == 300L * 299 / 2)
    assert(capped.filter(col("dist") =!= 0).count() == 0)
    assert(capped.select("i", "j").distinct().count() == 300L * 299 / 2)
  }

  test("editDistancePairs: degenerate hot block rides the valve — same pairs as uncapped") {
    val ss = spark
    import ss.implicits._
    // 300 rows on ONE (blk, sz) blocking key — the shape that used to
    // serialize the whole quadratic scan onto one join task. Strings
    // "widget" + z^(i%6) spread lengths 0..5, so maxDist=2 keeps some
    // pairs (dist = length diff for suffix-appends) and prunes others —
    // the valve must preserve BOTH decisions exactly.
    val df = (0 until 300).map(i => (i.toLong, "A", 1, "widget" + ("z" * (i % 6))))
      .toDF("id", "blk", "sz", "name")
    def pairs(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getAs[Long]("k1"), r.getAs[Long]("k2"),
        r.getAs[Int]("dist"))).toSet
    val un = pairs(Dedup.editDistancePairs(df, "id", "name", Seq("blk", "sz"),
      maxDist = 2, maxBucket = Int.MaxValue))
    val capped = pairs(Dedup.editDistancePairs(df, "id", "name", Seq("blk", "sz"),
      maxDist = 2, maxBucket = 32)) // 300 > 32: G = 19, the split engages
    val expect = (for {
      i <- 0 until 300; j <- (i + 1) until 300
      d = math.abs(i % 6 - j % 6) if d <= 2
    } yield (i.toLong, j.toLong, d)).toSet
    assert(un == expect, s"uncapped pair set wrong: ${un.size} vs ${expect.size}")
    assert(capped == un, "the bounded valve changed the fuzzy pair set")
  }

  test("editDistancePairs: null blocking values never pair (equi-join contract)") {
    val ss = spark
    import ss.implicits._
    // two null-keyed rows with identical names, two non-null rows that
    // pair normally: the old equi-join dropped null blocks (null never
    // equi-joins), and the posting groupBy must not resurrect them as a
    // regular group
    val df = Seq(
      (1L, Some("A"), "widget"), (2L, Some("A"), "widgetz"),
      (3L, None, "widget"), (4L, None, "widget"))
      .toDF("id", "blk", "name")
    val got = Dedup.editDistancePairs(df, "id", "name", Seq("blk"), maxDist = 2)
      .select("k1", "k2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)),
      s"null-blocked rows paired (or real pair lost): $got")
  }
}
