package graft

import org.apache.spark.sql.functions._
import graft.ext.{Cluster, Curation, Dedup, Sampling, Similarity, TextOps}

/** Specs for the corpus-preparation ops: connected-component dedup
  * clustering, deterministic hash sampling, quality gating, vocabulary,
  * and centroid assignment. */
class CorpusSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("connectedComponents merges transitive chains (A~B, B~C => one cluster)") {
    // two chains and one isolated pair: {1,2,3,4} via 1-2,2-3,3-4; {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("i", "j")
    val comps = Cluster.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: driver union-find and distributed propagation agree") {
    // pseudo-random graph with chains, cliques, and isolated pairs
    val rng = new scala.util.Random(42)
    val pairs = (1 to 400).map { _ =>
      val a = rng.nextInt(200).toLong; val b = rng.nextInt(200).toLong
      (math.min(a, b), math.max(a, b) + 1) // +1 avoids self-loops
    }.toDF("i", "j")
    val fast = Cluster.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Cluster.connectedComponents(pairs, driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist, "hybrid paths diverged")
  }

  test("distributed CC closes a 2000-node chain within maxIter (pointer doubling)") {
    // a pure path graph: plain min-label propagation needs diameter
    // rounds (2000 > maxIter) and would silently split the component;
    // shortcutting must close it in O(log n) rounds
    val chain = (0L until 1999L).map(i => (i, i + 1)).toDF("i", "j")
    val comps = Cluster.connectedComponents(chain, driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 2000)
    assert(comps.values.forall(_ == 0L),
      s"chain split into ${comps.values.toSet.size} components")
  }

  test("applyClusterDedup keeps exactly one survivor per component") {
    val docs = (1L to 6L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("i", "j")
    val kept = Cluster.applyClusterDedup(docs, pairs)
      .select("doc_id").as[Long].collect().sorted
    // component {1,2,3} -> 1 survives; {5,6} -> 5; 4 untouched (singleton)
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("hashSample is deterministic, key-consistent, and near the target rate") {
    val df = spark.range(10000).toDF("doc_id")
    val s1 = Sampling.hashSample(df, col("doc_id"), 10).as[Long].collect().toSet
    val s2 = Sampling.hashSample(df.repartition(13), col("doc_id"), 10)
      .as[Long].collect().toSet
    assert(s1 == s2, "membership must not depend on partitioning")
    assert(math.abs(s1.size - 1000) < 150, s"rate off: ${s1.size}/10000")
    // key-consistency: sampling a DIFFERENT table on the same key keeps
    // exactly the same keys (joinable samples)
    val other = spark.range(10000).toDF("doc_id").withColumn("x", col("doc_id") * 2)
    val s3 = Sampling.hashSample(other, col("doc_id"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s3)
  }

  test("assignSplits labels every row with a disjoint, rerun-stable split") {
    val df = spark.range(10000).toDF("doc_id")
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val labeled = Sampling.assignSplits(df, col("doc_id"), splits)
    val byLabel = labeled.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exhaustive: every row labeled, only the three labels appear
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.sum == 10000L)
    assert(math.abs(byLabel("train") - 9000) < 200, s"train share off: $byLabel")
    // rerun/partitioning-stable per-key assignment
    val a = labeled.select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplits(df.repartition(17), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // consistency with hashSample: pct=10 sample == the LAST 10 hash
    // buckets' complement... (same hash, same buckets) — val+test keys are
    // exactly the keys hashSample(90) excludes
    val tail = a.collect { case (k, s) if s != "train" => k }.toSet
    val head = Sampling.hashSample(df, col("doc_id"), 90)
      .as[Long].collect().toSet
    assert(tail == (0L until 10000L).toSet -- head)
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, col("doc_id"), Seq("a" -> 50, "b" -> 49))
    }
  }

  test("stratifiedHashSample applies per-stratum rates and drops unknown strata") {
    val df = spark.range(9000).toDF("k")
      .withColumn("s", element_at(array(lit("a"), lit("b"), lit("c")),
        (col("k") % 3 + 1).cast("int")))
    val out = Sampling.stratifiedHashSample(df, col("k"), col("s"),
      Map("a" -> 50, "b" -> 10)).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("c"), "unlisted stratum must be dropped")
    assert(math.abs(out("a") - 1500) < 200, s"a: ${out("a")}/3000 at 50%")
    assert(math.abs(out("b") - 300) < 100, s"b: ${out("b")}/3000 at 10%")
  }

  test("hashSampleNPerStratum returns exactly n per stratum, rerun-stable") {
    val df = spark.range(1000).toDF("k")
      .withColumn("s", (col("k") % 4).cast("string"))
    val pick = Sampling.hashSampleNPerStratum(df, col("k"), col("s"), 7)
    val counts = pick.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(7L))
    val again = Sampling.hashSampleNPerStratum(df.repartition(11), col("k"), col("s"), 7)
    assert(pick.select("k").as[Long].collect().toSet ==
      again.select("k").as[Long].collect().toSet)
  }

  test("packBins fills bins to the token budget in doc order") {
    val docs = Seq(
      (1L, "a " * 900), (2L, "b " * 900), (3L, "c " * 900), // 900 tokens each
      (4L, "d " * 100), (5L, "e " * 2500)                   // small, oversized
    ).map { case (id, t) => (id, t.trim) }.toDF("doc_id", "text")
    val bins = graft.ext.TextOps.packBins(docs, 1000L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // cumsums before: 0, 900, 1800, 2700, 2800 -> bins 0,0,1,2,2
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 2L),
      s"unexpected packing: $bins")
  }

  test("budgetSelect keeps the exact greedy prefix at any parallelism") {
    // priorities scrambled vs doc ids; costs chosen so the budget cuts
    // mid-corpus: pr order is 4(10), 2(30), 5(25), 1(40), 3(50);
    // tokens_before 0, 10, 40, 65, 105 -> budget 100 keeps pr <= 4 items
    val items = Seq(
      (1L, 40L, 40), (2L, 20L, 30), (3L, 50L, 50), (4L, 10L, 10), (5L, 30L, 25)
    ).toDF("doc_id", "pr", "n_tokens").repartition(7)
    val got = graft.ext.TextOps.budgetSelect(items, budget = 100L, numShards = 3)
      .select("doc_id", "tokens_before").as[(Long, Long)].collect().toMap
    assert(got == Map(4L -> 0L, 2L -> 10L, 5L -> 40L, 1L -> 65L),
      s"unexpected selection: $got")
  }

  test("chunkDocs windows every token with the configured stride and overlap") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "a b c")                                    // shorter than a chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, 10, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getString(3))).toMap
    // doc 1: starts 0,7,...,98 (floor(99/7)=14) -> 15 chunks; full 10-token
    // windows until the tail clamps
    assert(out.keys.count(_._1 == 1L) == 15)
    assert(out((1L, 0L))._1 == 10 && out((1L, 12L))._1 == 10)
    assert(out((1L, 13L))._1 == 9 && out((1L, 14L))._1 == 2, "tail must clamp")
    // chunk 1 covers tokens 8..17 (1-based), witnessing the 3-token overlap
    val expect = (8 to 17).map(i => s"t$i").mkString(" ")
    assert(out((1L, 1L))._2 ==
      java.security.MessageDigest.getInstance("MD5").digest(expect.getBytes)
        .map("%02x".format(_)).mkString)
    // doc 2: one chunk holding all 3 tokens
    assert(out.keys.count(_._1 == 2L) == 1 && out((2L, 0L))._1 == 3)
  }

  test("curate drops gated, duplicate, and contaminated docs, then packs the rest") {
    val textA = "the quick brown fox jumps over the lazy dog near the bank of the big river"
    val textB = "a calm gray cat sits beside the warm stone wall watching birds in the garden"
    val textC = "men of the north sail to the cold sea and trade furs in the small town"
    val docs = Seq(
      (1L, textA),          // survives
      (2L, "too short"),    // quality-gated (< 10 tokens)
      (3L, textA + "!!"),   // same fingerprint as 1 -> dedup drops (keep-min)
      (4L, textB),          // shares an 8-gram with the benchmark -> decontaminated
      (5L, textC)           // survives
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(textB.split(" ").take(8).mkString(" "))).toDF("text")
    val out = Curation.curate(docs, bench, tokensPerBin = 16L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // textA and textC are 16 tokens each -> doc 1 fills bin 0, doc 5 opens bin 1
    assert(out == Map(1L -> 0L, 5L -> 1L), s"unexpected curation result: $out")
  }

  test("incrementalDedup drops batch docs already in base and keeps min within batch") {
    val base = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha, beta. GAMMA!"), // fingerprint-equal to base doc 1 -> dropped
      (11L, "new stuff here"),      // kept (min of the within-batch pair)
      (12L, "new stuff here"),      // within-batch dup of 11 -> dropped
      (13L, "unique thing")         // kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(base, batch).as[Long].collect().sorted
    assert(kept.toSeq == Seq(11L, 13L))
  }

  test("boilerplateScore measures the corpus-frequent shingle fraction per doc") {
    val docs = Seq(
      (1L, "one two three four five"),  // 3 shingles, 1 common
      (2L, "one two three six seven"),  // 3 shingles, 1 common
      (3L, "eight nine ten eleven")     // 2 shingles, none shared
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateScore(docs, n = 3, minDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (3L, 1L, 0.333333) && out(2L) == (3L, 1L, 0.333333))
    assert(out(3L) == (2L, 0L, 0.0))
  }

  test("urlDomains counts URL occurrences and distinct source docs per host") {
    val docs = Seq(
      (1L, "x https://a.com/p http://b.org/q y"),
      (2L, "see https://a.com/r again"),
      (3L, "no links here")
    ).toDF("doc_id", "text")
    val out = TextOps.urlDomains(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a.com" -> (2L, 2L), "b.org" -> (1L, 1L)))
  }

  test("normalizeText canonicalizes case, punctuation, and whitespace") {
    val got = Seq(Tuple1("  Hello,   WORLD!! x-y 42 "))
      .toDF("t").select(TextOps.normalizeText(col("t"))).head.getString(0)
    assert(got == "hello world x y 42")
  }

  test("mixtureRates computes downsampling-only rates toward a target blend") {
    val df = (1 to 1000).map(i =>
      (i.toLong, if (i <= 800) "en" else if (i <= 950) "de" else "fr"))
      .toDF("k", "lang")
    // target: 50/25/25 — fr (50 rows) is the binding stratum:
    // scale = 50/0.25 = 200 -> want en=100/800 (13%), de=50/150 (33%), fr=100%
    val rates = graft.ext.Sampling.mixtureRates(df, col("lang"),
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
    assert(rates("fr") == 100, s"binding stratum must be kept whole: $rates")
    assert(rates("en") == 13 && rates("de") == 33, s"rates off: $rates")
    // applying the rates lands near the target mixture
    val out = graft.ext.Sampling.stratifiedHashSample(df, col("k"), col("lang"), rates)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = out.values.sum.toDouble
    assert(math.abs(out("en") / total - 0.5) < 0.12, s"blend off: $out")
  }

  test("qualityFlags keeps normal prose and rejects degenerate docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank today"),
      (2L, "word"), // too few tokens
      (3L, ("a " * 50).trim), // mean token length 1 — too short
      (4L, "the " + "...... ,,,,, !!!!! " * 20) // punctuation soup
    ).toDF("doc_id", "text")
    val keep = TextOps.qualityFlags(docs)
      .select("doc_id", "keep").as[(Long, Int)].collect().toMap
    assert(keep(1L) == 1)
    assert(keep(2L) == 0 && keep(3L) == 0 && keep(4L) == 0)
  }

  test("zipfSlope recovers ~-1 on an exact power-law corpus") {
    // term r appears floor(2000/r) times -> ln f = ln 2000 - ln r + O(rounding)
    val words = (1 to 50).flatMap(r => Seq.fill(2000 / r)(f"term$r%02d"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = graft.ext.TextOps.zipfSlope(docs, topN = 50).collect()(0)
    assert(row.getLong(0) == 50L)
    val slope = row.getDouble(1)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope not ~-1")
  }

  test("charEntropy matches closed-form values on known alphabets") {
    val docs = Seq(
      (1L, "aaaaaaaa"),        // one symbol -> 0 bits
      (2L, "abababab"),        // two equiprobable -> 1 bit
      (3L, "abcdabcd"),        // four equiprobable -> 2 bits
      (4L, "aab")              // p=(2/3,1/3) -> 0.9182958341 bits
    ).toDF("doc_id", "text")
    val got = graft.ext.TextOps.charEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((8L, 1L, 0.0)))
    assert(got(2L) == ((8L, 2L, 1.0)))
    assert(got(3L) == ((8L, 4L, 2.0)))
    assert(got(4L)._1 == 3L && got(4L)._2 == 2L &&
      math.abs(got(4L)._3 - 0.918295834) < 1e-6)
    // empty text: NO output row (sequence(1, 0) must not count down and
    // fabricate stats — mirrors the oracle's empty range)
    val empty = graft.ext.TextOps.charEntropy(
      Seq((9L, "")).toDF("doc_id", "text")).count()
    assert(empty == 0L, "empty doc fabricated an entropy row")
    // and empty text yields no cdc chunks either (oracle filters n >= 1)
    val chunks = graft.ext.Dedup.cdcChunks(
      Seq((9L, "")).toDF("doc_id", "text")).count()
    assert(chunks == 0L, "empty doc fabricated a zero-length chunk")
  }

  test("vocab counts occurrences and document frequency") {
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val v = TextOps.vocab(docs).as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(v("a") == ((3L, 2L)) && v("b") == ((1L, 1L)) && v("c") == ((1L, 1L)))
  }

  test("kMeans is partitioning-invariant and separates the fixture labels") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a1 = Similarity.kMeans(emb, k = 8, iters = 3)
      .as[(Long, Int)].collect().toMap
    val a2 = Similarity.kMeans(emb.repartition(7), k = 8, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(a1 == a2, "assignments must not depend on partitioning")
    assert(a1.size == emb.count())
    // the model must actually cluster: most cells in use, and the average
    // cell should be dominated by few ground-truth labels (purity proxy)
    assert(a1.values.toSet.size >= 5, s"degenerate model: ${a1.values.toSet}")
  }

  test("powerIterationPC is partitioning-invariant and tracks a plain eigensolve") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
    val a = graft.ext.Similarity.powerIterationPC(emb, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = graft.ext.Similarity.powerIterationPC(emb.repartition(11), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "projection changed under repartitioning")
    // reference: same power iteration in plain driver-side doubles — the
    // decimal plumbing must not steer the direction away from it
    val xs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = xs.head._2.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 0 until 4) {
      val w = Array.fill(dim)(0.0)
      xs.foreach { case (_, x) =>
        val s = x.zip(v).map { case (p, q) => p * q }.sum
        for (p <- 0 until dim) w(p) += s * x(p)
      }
      val nrm = math.sqrt(w.map(t => t * t).sum)
      v = w.map(_ / nrm)
    }
    xs.foreach { case (id, x) =>
      val ref = x.zip(v).map { case (p, q) => p * q }.sum
      assert(math.abs(a(id) - ref) < 1e-4, s"vec $id: ${a(id)} vs $ref")
    }
  }

  test("SpaceSaving: exact when capacity suffices, bounded error when it doesn't") {
    // heavily skewed stream: three items own most of the mass (their
    // per-partition frequency must clear n_partition/capacity for the
    // sketch's guaranteed-present bound to apply), plus 47 light items
    val rows = Seq.fill(30000)("item_1") ++ Seq.fill(15000)("item_2") ++
      Seq.fill(10000)("item_3") ++
      (4 to 50).flatMap(k => Seq.fill(100)(s"item_$k"))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ds = spark.createDataset(scala.util.Random.shuffle(rows))(
      org.apache.spark.sql.Encoders.STRING).repartition(8)

    // exact regime: capacity >= 50 distinct
    val exact = ds.groupByKey(_ => 0)
      .agg(new graft.functions.SpaceSaving(1000).toColumn.name("hh"))
      .collect()(0)._2
    assert(exact.forall(h => h.err == 0L && truth(h.item) == h.count),
      "exact regime must report true counts with zero error")

    // bounded regime: capacity 16 << 50 distinct; n/capacity error bound
    val n = rows.size.toLong
    val bounded = ds.groupByKey(_ => 0)
      .agg(new graft.functions.SpaceSaving(16).toColumn.name("hh"))
      .collect()(0)._2
    assert(bounded.size <= 16, "sketch exceeded its capacity")
    bounded.foreach { h =>
      val t = truth.getOrElse(h.item, 0L)
      assert(h.count >= t, s"${h.item}: estimate ${h.count} below true $t")
      assert(h.count - t <= h.err, s"${h.item}: err bound violated")
    }
    // with 8 partials merged, the guaranteed-present threshold loosens to
    // ~numPartitions * n/capacity; the VERY heavy items must still surface
    val top = bounded.map(_.item).toSet
    assert((1 to 3).forall(k => top.contains(s"item_$k")),
      s"heaviest items missing from sketch: $top")
  }

  test("BPE training learns the expected merges and segment() applies them") {
    // classic toy corpus: "low" x5, "lowest" x2 -> 'l o' dominates (7),
    // then 'lo w' (7), then 'low' is a full token for the frequent word
    val docs = Seq((1L, ("low " * 5).trim + " " + ("lowest " * 2).trim))
      .toDF("doc_id", "text")
    val merges = graft.ext.Bpe.train(docs, nMerges = 3)
    assert(merges.map(m => (m.lhs, m.rhs)).take(2) == Seq(("l", "o"), ("lo", "w")),
      s"unexpected merge sequence: $merges")
    assert(merges(0).n == 7 && merges(1).n == 7)
    // determinism under repartitioning
    val again = graft.ext.Bpe.train(docs.repartition(5), nMerges = 3)
    assert(merges == again, "BPE merges depend on partitioning")
    // encode with the learned merges: frequent word collapses to one token
    val seg = docs.select(graft.ext.Bpe.segment(col("text"), merges).as("s"))
      .collect()(0).getString(0)
    assert(seg.startsWith("low low low low low"),
      s"frequent word not collapsed: $seg")
    assert(seg.contains("low e s t") || seg.contains("low es t") ||
      seg.contains("low est"), s"suffix should stay split: $seg")
  }

  test("SpaceSaving.merge keeps count upper bounds when partials disagree") {
    // build two partial sketches by hand: b1 is saturated (evictions
    // happened, min1 > 0), b2 is a fresh sparse sketch (min2 = 0)
    val agg = new graft.functions.SpaceSaving(4)
    // stream: a x5, b x4, c x3, d x2, then e arrives and evicts d
    val b1 = (Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d") :+ "e").foldLeft(agg.zero)(agg.reduce)
    assert(b1.size == 4 && b1.contains("e") && !b1.contains("d"),
      s"setup: e should have evicted d: $b1")
    val b2 = Seq.fill(3)("f").foldLeft(agg.zero)(agg.reduce) // sparse, min=0
    val m = agg.merge(b1, b2)
    // f is absent from SATURATED b1, so it may have been seen there and
    // evicted at up to min1=3: the sound merge is count 6 with err 3
    // (true count in [3, 6]). The pre-fix code inherited the SPARSE
    // side's minimum (0) instead and claimed "exactly 3, err 0" — an
    // unsound exactness claim the sketch cannot justify.
    val f = m("f")
    assert(f == ((6L, 3L)),
      s"f must merge as (count 6, err 3) — absent from a saturated sketch " +
        s"means 'up to its min', not 'zero'; got $f")
    assert(f._1 - f._2 <= 3L && 3L <= f._1, "true count outside [count-err, count]")
    // a is exact in b1 and absent from the SPARSE b2 (min2 = 0): its
    // absence there genuinely means zero occurrences — stays exact
    val a = m("a")
    assert(a == ((5L, 0L)), s"a must stay exact (5, 0): $a")
  }

  test("BPE merges repeated adjacent pairs in one pass (no boundary skip)") {
    // "abab": greedy BPE with merge (a,b) must produce "ab ab", and the
    // next round must then learn (ab, ab) — a single-space sentinel
    // scheme would leave " ab a b " and learn phantom pairs instead
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val merges = graft.ext.Bpe.train(docs, nMerges = 2)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b"), ("ab", "ab")),
      s"boundary-skip bug: $merges")
    val seg = docs.select(graft.ext.Bpe.segment(col("text"),
      merges.take(1)).as("s")).collect()(0).getString(0)
    assert(seg == "ab ab ab ab", s"segment skipped a repeat: '$seg'")
  }

  test("BPE driver fast path matches the distributed trajectory exactly") {
    // the oracle unrolls the merge trajectory, so the two paths must be
    // bit-identical — assert it on the real fixture corpus (the corpus
    // text_bpe_merges trains on) and on an adversarial toy built to
    // stress the parity-sensitive spots: count ties (byte-order
    // tie-break), repeated pairs (greedy scan), a supplementary-plane
    // character (code-point splitting vs UTF-16 code units)
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val viaTrain = graft.ext.Bpe.train(fixture, nMerges = 6)
    val viaDist = graft.ext.Bpe.trainDistributed(fixture, nMerges = 6)
    assert(viaTrain == viaDist,
      s"fast-path trajectory diverged on fixture:\n$viaTrain\nvs\n$viaDist")
    val toy = Seq((1L, "zz zz 𝄞x𝄞x ba ba ab"))
      .toDF("doc_id", "text")
    val a = graft.ext.Bpe.train(toy, nMerges = 4)
    val b = graft.ext.Bpe.trainDistributed(toy, nMerges = 4)
    assert(a == b, s"fast-path trajectory diverged on toy:\n$a\nvs\n$b")
  }

  test("Cdc treats null timestamps as oldest-known, never as current") {
    val changes = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")), 100L, "a"),
      (1L, Some(java.sql.Timestamp.valueOf("2026-01-01 11:00:00")), 101L, "b"),
      (1L, None, 102L, "null-ts") // unknown-time change
    ).toDF("user_id", "ts", "event_id", "v")
    val latest = graft.pipeline.Cdc.latestSnapshot(changes, "user_id", "ts", "event_id")
      .select("v").as[String].collect()
    assert(latest.toSeq == Seq("b"),
      s"null-ts change must not win the latest snapshot: ${latest.toSeq}")
    val hist = graft.pipeline.Cdc.scd2(changes, "user_id", "ts", "event_id")
      .select("v", "is_current").as[(String, Int)].collect().toMap
    assert(hist("null-ts") == 1 && hist("b") == 0,
      s"explicit NULLS LAST: null-ts sorts last in ASC history: $hist")
    // a successor with a NULL TIEBREAK must still supersede: exactly one
    // current version per key, detected via row existence, not a column
    val nullTie = Seq(
      (2L, Some(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")), Some(200L), "x"),
      (2L, Some(java.sql.Timestamp.valueOf("2026-01-01 11:00:00")), None, "y")
    ).toDF("user_id", "ts", "event_id", "v")
    val h2 = graft.pipeline.Cdc.scd2(nullTie, "user_id", "ts", "event_id")
      .select("v", "is_current").as[(String, Int)].collect().toMap
    assert(h2 == Map("x" -> 0, "y" -> 1),
      s"null-tiebreak successor must leave exactly one current row: $h2")
  }

  test("lshTopK derives the embedding dimension from the data") {
    // 8-dim vectors (not the 64 the old hard default assumed): two tight
    // groups; each query's nearest neighbours must come from its own group
    val rows = (0 until 40).map { i =>
      val g = i % 2
      val base = Array.fill(8)(0.05f * (i / 2))
      base(g * 4) = 10f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val top = graft.ext.Similarity.lshTopK(rows,
        rows.filter(col("vec_id") < 2), k = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect()
    assert(top.nonEmpty, "no candidates found — dim mismatch would cause this")
    assert(top.forall { case (q, v) => q % 2 == v % 2 },
      s"neighbours crossed groups — projections degenerate: ${top.toSeq}")
  }

  test("winnowPairs pairs a near-copy and ignores distinct docs") {
    // distinct per-doc vocabulary -> every fingerprint is rare, so the
    // planted copy's overlap survives the df cap
    val docs = (1 to 30).map(i =>
      (i.toLong, (1 to 40).map(t => s"d${i}q$t").mkString(" ")))
      .toDF("doc_id", "text")
    val planted = docs.unionByName(
      docs.filter($"doc_id" === 5)
        .select(lit(105L).as("doc_id"),
          concat($"text", lit(" !!")).as("text")))
    val pairs = Dedup.winnowPairs(planted, minShared = 10, maxDocFreq = 8)
      .select("i", "j", "n_shared").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.contains((5L, 105L)), s"planted pair missing from $pairs")
    assert(pairs((5L, 105L)) >= 10L, "copy must share most fingerprints")
    assert(!pairs.contains((1L, 2L)), "distinct docs must not pair")
  }

  test("gumbelTopK: deterministic, partitioning-invariant, weight-sensitive") {
    val n = 500
    val df = (0L until n).map(i => (i, if (i == 123L) 1000.0 else i % 7 * 0.1))
      .toDF("doc_id", "log_weight")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ext.Sampling.gumbelTopK(d, col("doc_id"), col("log_weight"), 50)
        .select("doc_id").as[Long].collect().toSet
    val a = run(df)
    assert(a.size == 50)
    assert(a == run(df.repartition(13)), "selection changed under repartitioning")
    assert(a.contains(123L), "a +1000 log-weight item must always be drawn")
    // Gumbel noise has scale 1: items with +0.6 weight should be clearly
    // overrepresented vs the lowest band, but not deterministic
    val top = a.count(_ % 7 == 6); val bottom = a.count(_ % 7 == 0)
    assert(top > bottom, s"weights not tilting the draw: top=$top bottom=$bottom")
  }

  test("temperatureRates: T=1 keeps everything, T>1 boosts the tail share") {
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val t1 = Sampling.temperatureRates(docs, col("source"), temperature = 1.0)
    assert(t1 == Map("big" -> 100, "small" -> 100),
      s"T=1 must reproduce the natural mixture (no drops): $t1")
    val t2 = Sampling.temperatureRates(docs, col("source"), temperature = 2.0)
    assert(t2("small") == 100, s"rarest stratum must keep all rows: $t2")
    assert(t2("big") < 100, s"head stratum must downsample: $t2")
    // the sampled mixture actually tilts toward the tail
    val kept = Sampling.stratifiedHashSample(docs, col("doc_id"),
        col("source"), t2)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val tailShare = kept("small").toDouble / (kept("big") + kept("small"))
    assert(tailShare > 0.1 && tailShare < 0.5,
      s"tail share should rise above its natural 10%: $kept")
  }

  test("domainBlocklistFilter blocks subdomains but never lookalikes or TLDs") {
    val docs = Seq(
      (1L, "clean doc no urls"),
      (2L, "see https://blocked.example.com/page"),      // exact host
      (3L, "see https://deep.a.blocked.example.com/x"),  // nested subdomain
      (4L, "see https://notblocked.example.com/x"),      // sibling host survives
      (5L, "see https://blockedexample.com/x"),          // lookalike survives
      (6L, "see https://other.com/x")                    // unrelated survives
    ).toDF("doc_id", "text")
    val kept = TextOps.domainBlocklistFilter(docs,
        Seq("blocked.example.com", "com")) // a bare TLD entry must be inert
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L), s"kept ${kept.toSeq}")
  }

  test("contaminationReport keeps zero-hit snippets and both kernels agree") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "beta gamma zeta"),
      (3L, "unrelated text here")
    ).toDF("doc_id", "text")
    val snips = Seq(("s1", "beta gamma"), ("s2", "never occurs anywhere"))
      .toDF("eval_id", "eval_text")
    def run(thr: Int) = Dedup.contaminationReport(docs, snips, thr)
      .select("eval_id", "n_docs").as[(String, Long)].collect().toMap
    val contains = run(1024)
    assert(contains == Map("s1" -> 2L, "s2" -> 0L), s"got $contains")
    assert(run(0) == contains, "automaton kernel must match the contains kernel")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by content") {
    val base = Seq((1L, "same text"), (2L, "will change"), (3L, "goes away"),
      (4L, "punct; only!")).toDF("doc_id", "text")
    val next = Seq((1L, "same text"), (2L, "has changed"),
      (4L, "punct only"), // differs only in punctuation -> unchanged
      (5L, "brand new")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(base, next)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"), s"got $got")
  }

  test("CountMin never undercounts and is partitioning-invariant") {
    val words = (0 until 2000).map(i => s"w${i % 97}") // 97 distinct, skewed ids
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def sketch(parts: Int): Seq[Long] = {
      val ds = spark.createDataset(words).repartition(parts)
      ds.groupByKey(_ => 0)
        .agg(new graft.functions.CountMin(4, 64).toColumn.name("cms"))
        .head()._2
    }
    val cms = sketch(1)
    assert(cms == sketch(7), "sketch state must not depend on partitioning")
    exact.foreach { case (w, n) =>
      val (h1, h2) = graft.functions.CountMin.hashPair(w)
      val est = (0 until 4).map(r =>
        cms(r * 64 + graft.functions.CountMin.bucket(h1, h2, r, 64))).min
      assert(est >= n, s"CMS undercounted $w: $est < $n")
    }
    // the weighted variant over the exact (term, count) aggregate must
    // produce the BIT-IDENTICAL counter array (additivity — this is
    // what lets text_cms_freq build sketch + exact counts in one scan)
    val weighted = spark.createDataset(exact.toSeq).repartition(5)
      .groupByKey(_ => 0)
      .agg(new graft.functions.CountMinWeighted(4, 64).toColumn.name("cms"))
      .head()._2
    assert(weighted == cms,
      "weighted CMS over counts diverged from the per-occurrence sketch")
  }

  test("unigramKl matches a driver-side brute-force on a tiny corpus") {
    val docs = Seq(
      (1L, "a", "the cat sat on the mat"),
      (2L, "a", "the cat ran"),
      (3L, "b", "dogs bark loudly at night"),
      (4L, "b", "the night was dark")
    ).toDF("doc_id", "source", "text")
    val got = TextOps.unigramKl(docs)
      .select("source", "n_terms", "kl").as[(String, Long, Double)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // brute force: identical smoothing and rounding
    val toks = Seq(
      "a" -> "the cat sat on the mat the cat ran".split(" ").toSeq,
      "b" -> "dogs bark loudly at night the night was dark".split(" ").toSeq)
    val all = toks.flatMap(_._2)
    val vocab = all.distinct.sorted
    val v = vocab.size.toLong
    val totAll = all.size.toLong
    val cntAll = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    toks.foreach { case (src, ts) =>
      val totS = ts.size.toLong
      val cntS = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val kl = vocab.map { w =>
        val p = (cntS.getOrElse(w, 0L) + 1).toDouble / (totS + v)
        val q = (cntAll(w) + 1).toDouble / (totAll + v)
        BigDecimal(p * math.log(p / q))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      assert(got(src)._1 == v, s"$src: grid must cover the full vocab")
      assert(math.abs(got(src)._2 - kl.toDouble) < 1e-12,
        s"$src: kl ${got(src)._2} != expected $kl")
    }
  }

  test("BloomUtil never false-negatives and holds the target fpp") {
    val members = (0 until 10000).map(i => s"member-$i")
    val bloom = graft.functions.BloomUtil.build(members, members.size.toLong,
      fpp = 0.01)
    assert(members.forall(bloom.mightContain),
      "bloom filters must never drop a real member")
    val falsePos = (0 until 10000).count(i => bloom.mightContain(s"other-$i"))
    // 3x headroom over the design point keeps the assert stable
    assert(falsePos < 300, s"fpp blew past design: $falsePos/10000")
  }

  test("bloomDecontaminate is row-identical to the exact path on fixture data") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val bench = docs.filter($"doc_id" % 50 === 7)
      .select(concat_ws(" ", slice(TextOps.tokens($"text"), 5, 20)).as("text"))
    val exact = Dedup.decontaminate(docs, bench, n = 8)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    for (bc <- Seq(true, false)) {
      val got = Dedup.bloomDecontaminate(docs, bench, n = 8,
          broadcastConfirm = bc)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(got == exact, s"bloom path (broadcastConfirm=$bc) diverged")
    }
  }

  test("embedOutliers flags the planted far vector and spares tight members") {
    // two tight 4-d clusters + one vector far off cluster A's center
    val rows = (0 until 24).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 0f, 1f, 0f)
      val jit = (i / 2) * 0.001f
      (i.toLong, base.zipWithIndex.map { case (x, d) =>
        if (d == 1) jit else x }.toSeq)
    } :+ (99L, Seq(4f, 4f, 0f, 0f))
    val out = Similarity.embedOutliers(
        rows.toDF("vec_id", "embedding"), k = 2, iters = 3, sigmas = 2.0)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out.size == 25, "one row per input vector")
    assert(out(99L), "the planted far vector must be flagged")
    assert(out.count(_._2) < 5,
      s"tight members must mostly survive: ${out.filter(_._2)}")
  }

  test("centroidAssign assigns separated clusters back to their own centroid") {
    // two well-separated label clusters in 4-d
    val rows = (0 until 20).map { i =>
      val lbl = i % 2
      val base = if (lbl == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 0f, 1f, 0f)
      val jit = (i / 2) * 0.01f
      (i.toLong, base.zipWithIndex.map { case (x, d) =>
        if (d == 1 || d == 3) jit else x }.toSeq, lbl)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidAssign(rows)
      .select("label", "assigned").as[(Int, Int)].collect()
    assert(out.forall { case (l, a) => l == a },
      "every vector's nearest centroid must be its own label's")
  }

  test("calibrateBySource pctl equals a plain per-source percent_rank") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(11)
    val scored = (0 until 300).map { i =>
      (i.toLong, s"src${i % 4}", (rng.nextInt(40) / 4.0))
    }.toDF("doc_id", "source", "score") // repeated scores => rank ties
    val got = TextOps.calibrateBySource(scored, minPctl = 0.25)
      .select("doc_id", "pctl", "keep")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val want = scored.withColumn("pctl",
        percent_rank().over(Window.partitionBy(col("source")).orderBy(col("score"))))
      .withColumn("keep", when(col("pctl") >= 0.25, 1).otherwise(0))
      .select("doc_id", "pctl", "keep")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got == want)
    // singleton source: percentile 0, dropped by any positive threshold
    val single = Seq((1L, "only", 3.0)).toDF("doc_id", "source", "score")
    val s1 = TextOps.calibrateBySource(single, minPctl = 0.2)
      .select("pctl", "keep").collect().head
    assert(s1.getDouble(0) == 0.0 && s1.getInt(1) == 0)
  }

  test("curriculumOrder: buckets are contiguous in rn and salts reshuffle within") {
    val docs = (0 until 200).map(i => (i.toLong, (i % 1000).toDouble))
      .toDF("doc_id", "difficulty")
    val out = Sampling.curriculumOrder(docs, col("doc_id"), col("difficulty"),
        edges = Seq(50.0, 120.0), salt = "e0")
      .select("doc_id", "bucket", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // rn is a permutation of 1..n
    assert(out.map(_._3).sorted.toSeq == (1L to 200L).toSeq)
    // every bucket-0 position precedes every bucket-1 position, etc.
    val maxByBucket = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minByBucket = out.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    assert(maxByBucket(0) < minByBucket(1) && maxByBucket(1) < minByBucket(2))
    // a different salt keeps buckets but permutes order within them
    val out2 = Sampling.curriculumOrder(docs, col("doc_id"), col("difficulty"),
        edges = Seq(50.0, 120.0), salt = "e1")
      .select("doc_id", "bucket", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(t => t._1 -> t._2).toMap == out2.map(t => t._1 -> t._2).toMap)
    assert(out.map(t => t._1 -> t._3).toMap != out2.map(t => t._1 -> t._3).toMap)
  }

  test("pmiBigrams scores a planted collocation with the closed-form PMI") {
    // 6 docs of "new york" + one "p q": B(new,york)=6, tot_b=7,
    // U(new)=U(york)=6, tot_u=14 -> lift=(6/7)/((6/14)^2), pmi=ln(lift)
    val docs = ((1 to 6).map(i => (i.toLong, "new york")) :+ (7L, "p q"))
      .toDF("doc_id", "text")
    val out = TextOps.pmiBigrams(docs, minCount = 5L, k = 10).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "new" && r.getString(1) == "york" && r.getLong(2) == 6L)
    val expect = BigDecimal(math.log((6.0 / 7) / ((6.0 / 14) * (6.0 / 14))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expect, s"pmi ${r.getDouble(3)} != $expect")
  }

  test("ccnetBuckets partitions each language into ordered terciles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val out = TextOps.ccnetBuckets(docs)
      .select("lang", "ppl_score", "pctl", "bucket")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    assert(out.nonEmpty)
    // buckets follow the tercile edges exactly, and scores never cross
    // bucket boundaries out of order within a language
    out.foreach { case (_, _, pctl, b) =>
      val want = if (pctl * 3 < 1) "head" else if (pctl * 3 < 2) "middle" else "tail"
      assert(b == want, s"pctl $pctl bucketed $b, want $want")
    }
    out.groupBy(_._1).foreach { case (lang, rows) =>
      def scores(b: String) = rows.filter(_._4 == b).map(_._2)
      for {
        lo <- Seq("head" -> "middle", "middle" -> "tail")
        hi = scores(lo._2) if hi.nonEmpty
        l = scores(lo._1) if l.nonEmpty
      } assert(l.max <= hi.min,
        s"$lang: ${lo._1} max ${l.max} > ${lo._2} min ${hi.min}")
      // languages with enough docs get all three buckets
      if (rows.length >= 9)
        assert(Set("head", "middle", "tail").subsetOf(rows.map(_._4).toSet))
    }
  }

  test("events_transitions probabilities are row-stochastic per prev state") {
    val q = graft.queries.Corpus.queries("events_transitions")
    val rows = q(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      val psum = rs.map(_._3).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"$prev rows sum to $psum")
      val tot = rs.map(_._2).sum
      rs.foreach { case (_, n, p) =>
        assert(p == n.toDouble / tot, s"$prev p $p != $n/$tot") }
    }
  }

  test("knNll matches hand-computed interpolated Kneser-Ney values") {
    // corpus: "a b" x2, "a c" -> c12(a,b)=2, c12(a,c)=1, ctx(a)=3,
    // fol(a)=2, bwd(b)=bwd(c)=1, btot=2
    // p(b|a) = (2-.75)/3 + .75*2/3*(1/2) = 2/3; p(c|a) = 1/3 — sums to 1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextOps.knNll(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((1L, r6(-math.log(2.0 / 3)))))
    assert(out(2L) == ((1L, r6(-math.log(2.0 / 3)))))
    assert(out(3L) == ((1L, r6(-math.log(1.0 / 3)))))
  }

  test("psiDrift is zero for identical epochs and positive under shift") {
    // bin from id/2 so BOTH parities (epochs) hit every bin 10 times
    val same = (1L to 200L).map(i => (i, (i / 2) % 10)).toDF("id", "bin")
    val psi0 = TextOps.psiDrift(same, (col("id") % 2).cast("int"), col("bin"))
      .collect()(0)
    assert(psi0.getLong(0) == 10L && psi0.getDouble(3) == 0.0)
    // epoch 1's bins shifted up -> every bin differs between epochs
    val shifted = (1L to 200L)
      .map(i => (i, if (i % 2 == 0) i % 10 else i % 10 + 100))
      .toDF("id", "bin")
    val psi1 = TextOps.psiDrift(shifted, (col("id") % 2).cast("int"), col("bin"))
      .collect()(0).getDouble(3)
    assert(psi1 > 1.0, s"disjoint-bin drift scored only $psi1")
  }

  test("sample_ess lies in (0, n] and equals n for flat weights") {
    val row = graft.queries.Corpus.queries("sample_ess")(spark, sf).collect()(0)
    val (n, ess, frac) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(ess > 0 && ess <= n + 1e-6, s"ess $ess outside (0, $n]")
    assert(math.abs(frac - ess / n) < 1e-12)
    // degenerate corpus: every doc identical -> identical weights -> ESS = n
    // (max-shift makes each term exactly round(exp(0),9) = 1)
    val flatDocs = (1L to 8L).map(i => (i, "x y", "src0"))
      .toDF("doc_id", "text", "source")
    val wts = TextOps.dsirWeights(flatDocs, col("source") === "src0")
    val lw = wts.select("log_weight").collect().map(_.getDouble(0))
    assert(lw.toSet.size == 1, "identical docs got different weights")
  }

  test("madOutliers selects the exact lower median and flags only extremes") {
    // scores 1..9 plus a planted 1000: median of 10 values = 5 (lower
    // middle of 1..9,1000), deviations |s-5| -> sorted 0..4,995 ->
    // MAD = 2 (index (10-1) div 2 = 4 of [0,1,1,2,2,3,3,4,4,995])
    val rows = ((1L to 9L).map(i => (i, i)) :+ (10L, 1000L))
      .toDF("doc_id", "n_chars")
    val out = TextOps.madOutliers(rows, col("n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(out(1L)._1 == 5L, s"median ${out(1L)._1} != 5")
    assert(out(1L)._2 == 2L, s"mad ${out(1L)._2} != 2")
    // threshold = 4.4478 * 2 = 8.8956: only the 1000 is flagged
    assert(out(10L)._3, "planted outlier not flagged")
    assert(out.filter(_._2._3).keySet == Set(10L),
      s"flagged ${out.filter(_._2._3).keys}")
    // even-count lower median: [1,2,3,4] -> 2
    val even = (1L to 4L).map(i => (i, i)).toDF("doc_id", "n_chars")
    val med = TextOps.madOutliers(even, col("n_chars"))
      .select("med").distinct().collect()(0).getLong(0)
    assert(med == 2L, s"even-count lower median $med != 2")
  }

  test("medianMadOfGrid enforces the same grid-cardinality contract") {
    // the fused one-pass med+mad path must keep the loud guard: a
    // too-wide grid fails instead of sorting it on one task silently
    val grid = (1L to 10L).map(i => (i, 1L)).toDF("_s", "_c")
    val ok = TextOps.medianMadOfGrid(grid, maxGridCardinality = 10L)
      .collect()(0)
    assert(ok.getLong(0) == 5L && ok.getLong(1) == 2L,
      s"med/mad of 1..10 was $ok, expected (5, 2)")
    intercept[Exception] {
      TextOps.medianMadOfGrid(grid, maxGridCardinality = 9L).collect()
    }
    // empty grid -> empty frame (not a one-null-row global aggregate)
    assert(TextOps.medianMadOfGrid(grid.filter(col("_s") > 100L)).isEmpty)
  }

  test("lowerMedian enforces its grid-cardinality contract at runtime") {
    // the unpartitioned cumulative window is safe only over the bounded
    // distinct-value grid; a near-continuous score must FAIL LOUDLY, not
    // silently become a corpus-sized single-partition sort
    val vals = (1L to 10L).toDF("_s")
    val ok = TextOps.lowerMedian(vals, maxGridCardinality = 10L)
      .collect()(0).getLong(0)
    assert(ok == 5L, s"lower median of 1..10 was $ok, expected 5")
    val e = intercept[Exception] {
      TextOps.lowerMedian(vals, maxGridCardinality = 9L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("grid cardinality")),
      s"wrong failure: ${msgs(e).take(2)}")
  }

  test("text_fertility reports >= 1 piece per word and exact ratio columns") {
    val out = graft.queries.Corpus.queries("text_fertility")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, p, ch) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p >= w, s"source ${r.getString(0)}: $p pieces < $w words")
      assert(r.getDouble(4) == p.toDouble / w)
      assert(r.getDouble(5) == ch.toDouble / p)
    }
  }

  test("snapshotAsOf agrees with the scd2 version covering the cut") {
    val ev = graft.Tables.events(spark, sf)
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val snap = graft.pipeline.Cdc
      .snapshotAsOf(ev, "user_id", "ts", "event_id", cut)
      .select(col("user_id"), col("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent path: the SCD-2 version whose validity interval
    // covers the cut must be the same row, for every key born by then
    val scd = graft.pipeline.Cdc.scd2(ev, "user_id", "ts", "event_id")
      .filter(col("valid_from") <= cut &&
        (col("valid_to").isNull || col("valid_to") > cut))
      .select(col("user_id"), col("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap.nonEmpty && snap == scd,
      s"temporal models disagree: snapshot ${snap.size} vs scd2 ${scd.size}")
  }

  test("applyChangeset: last op per key wins, D drops, replay is idempotent") {
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val base = Seq((1L, t(0), "a", 1.0), (2L, t(0), "b", 2.0),
      (3L, t(0), "c", 3.0)).toDF("k", "ts", "tag", "v")
    // key 1: U then D (same batch) -> dropped; key 2: D then U -> updated;
    // key 4: I (new); key 3 untouched
    val changes = Seq(
      (1L, t(1), "a1", 10.0, 100L, "U"), (1L, t(2), "a2", 11.0, 101L, "D"),
      (2L, t(1), "b1", 20.0, 102L, "D"), (2L, t(2), "b2", 21.0, 103L, "U"),
      (4L, t(1), "d", 4.0, 104L, "I"))
      .toDF("k", "ts", "tag", "v", "seq", "op")
    val out = graft.pipeline.Cdc.applyChangeset(
        base, changes, "k", "ts", "seq", "op")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("tag"), r.getAs[Double]("v")))).toMap
    assert(out == Map(2L -> (("b2", 21.0)), 3L -> (("c", 3.0)),
      4L -> (("d", 4.0))))
    // idempotent replay: applying the same changeset to the result
    // changes nothing (I-on-existing degrades to U, D already gone)
    val out2 = graft.pipeline.Cdc.applyChangeset(
        graft.pipeline.Cdc.applyChangeset(base, changes, "k", "ts", "seq", "op"),
        changes, "k", "ts", "seq", "op")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("tag"), r.getAs[Double]("v")))).toMap
    assert(out2 == out, "MERGE replay must be idempotent")
  }

  test("paretoFrontier2d matches brute-force strict dominance, any sharding") {
    // pseudo-random (cost, value) points with deliberate ties on both
    // keys — tied frontier duplicates must ALL survive
    val pts = (0 until 300).map { i =>
      (i.toLong, (i * 31 % 40).toLong, (i * 17 % 25).toLong)
    } ++ Seq((1000L, 5L, 24L), (1001L, 5L, 24L)) // exact duplicate pair
    val df = pts.toDF("id", "cost", "value")
    val brute = pts.filter { case (_, c, v) =>
      !pts.exists { case (_, c2, v2) =>
        c2 <= c && v2 >= v && (c2 < c || v2 > v) }
    }.map(_._1).toSet
    for (shards <- Seq(1, 7)) {
      val got = Curation.paretoFrontier2d(
          df.repartition(3), col("cost"), col("value"), shards)
        .collect().map(_.getLong(0)).toSet
      assert(got == brute, s"shards=$shards: got ${got.size}, " +
        s"want ${brute.size}; diff ${(got diff brute) ++ (brute diff got)}")
    }
  }

  test("paretoFrontier2d keeps extreme-value points (no sentinel collision)") {
    // a lone point whose maxKey IS Long.MinValue must survive — a
    // MinValue-sentinel prefix would silently drop it
    val one = Seq((1L, 5L, Long.MinValue)).toDF("id", "cost", "value")
    assert(Curation.paretoFrontier2d(one, col("cost"), col("value"))
      .count() == 1L)
    // and the cheapest point always survives regardless of its value
    val pts = Seq((1L, 1L, Long.MinValue), (2L, 2L, 0L), (3L, 3L, 10L))
      .toDF("id", "cost", "value")
    val got = Curation.paretoFrontier2d(pts, col("cost"), col("value"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("paretoFrontier2d plans no unpartitioned window") {
    val df = (0 until 50).map(i => (i.toLong, (i * 7 % 13).toLong,
      (i * 11 % 17).toLong)).toDF("id", "cost", "value")
    val qe = Curation.paretoFrontier2d(df, col("cost"), col("value"))
      .queryExecution
    val wins = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected a shard-local prefix-max window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"global single-partition window found:\n${qe.optimizedPlan}"))
    assert(!qe.executedPlan.toString.contains("CartesianProduct"))
  }
}
