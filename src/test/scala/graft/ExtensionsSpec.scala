package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextOps}
import graft.queries.Extensions

/** Behavioral checks for the LLM-pipeline extension operators; the exact
  * value gate is the DuckDB oracle (tools/compare_oracle.py).
  */
class ExtensionsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("dedup_exact finds exactly the planted exact duplicates") {
    val planted = Extensions.plantedDocs(spark, sf)
    val groups = Dedup.exactGroups(planted).collect()
    val expected = docs.filter(col("doc_id") % 25 === 0).count()
    assert(groups.length == expected)
    assert(groups.forall(_.getAs[Long]("n") == 2))
  }

  test("applying dedup removes exactly the planted copies, keeping min ids") {
    val planted = Extensions.plantedDocs(spark, sf)
    val deduped = Dedup.dedupExact(planted)
    val nPlantedExact = docs.filter(col("doc_id") % 25 === 0).count()
    assert(deduped.count() == planted.count() - nPlantedExact)
    // survivors are the ORIGINAL ids, not the +200000 copies
    assert(deduped.filter(col("doc_id") >= 200000).count() == 0)
    // pair-based apply drops the j-side of near-dup pairs
    val pairs = Dedup.ngramJaccardPairs(planted, 3, 0.5)
    val after = Dedup.applyPairDedup(planted, pairs)
    assert(after.count() < planted.count())
    assert(after.join(pairs.select(col("j").as("doc_id")).distinct(),
      Seq("doc_id"), "left_semi").count() == 0, "a dropped doc survived")
  }

  test("ngram jaccard finds planted near-dups with high similarity") {
    val pairs = Dedup.ngramJaccardPairs(Extensions.plantedDocs(spark, sf), 3, 0.5)
    val near = pairs.filter(col("j") - col("i") === 100000).collect()
    val planted = docs.filter(col("doc_id") % 25 === 13).count()
    assert(near.length == planted, s"missed planted near-dups: ${near.length} != $planted")
    assert(near.forall(_.getAs[Double]("jaccard") > 0.7))
    // exact copies have jaccard exactly 1.0
    val exact = pairs.filter(col("j") - col("i") === 200000).collect()
    assert(exact.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("minhash LSH recovers the planted pairs the exact jaccard finds") {
    val planted = Extensions.plantedDocs(spark, sf)
    val lsh = Dedup.minhashLshPairs(planted, 3, 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 200000)).toSet
    assert(exactPairs.subsetOf(lsh),
      s"LSH missed exact-duplicate pairs: ${exactPairs -- lsh}")
  }

  test("simhash of identical docs is identical; planted near pairs are close") {
    val planted = Extensions.plantedDocs(spark, sf)
    val pairs = Dedup.simhashPairs(planted, 3)
    val exact = pairs.filter(col("j") - col("i") === 200000)
    assert(exact.filter(col("hd") =!= 0).count() == 0)
    assert(exact.count() == docs.filter(col("doc_id") % 25 === 0).count())
  }

  test("simhash fat-bucket split preserves the exact pair set") {
    val ss = spark
    import ss.implicits._
    // degenerate near-identical corpus: every doc shares one dominant
    // token multiset, so simhashes collide and each (chunk, value)
    // posting holds essentially the whole corpus — the skew case the
    // maxBucket guard exists for
    val corpus = (1 to 120).map { i =>
      (i.toLong, ("alpha beta gamma delta " * 10) + s"tail${i % 3}")
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val uncapped = pairSet(Dedup.simhashPairs(corpus, 3))
    val capped = pairSet(Dedup.simhashPairs(corpus, 3, maxBucket = 10))
    assert(uncapped.size >= 120 * 39 / 2,
      s"corpus not degenerate enough to exercise the split: ${uncapped.size}")
    assert(capped == uncapped,
      s"split changed the pair set: only-capped=${capped -- uncapped} " +
        s"only-uncapped=${uncapped -- capped}")
  }

  test("LSH ANN recall vs brute force is reasonable") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 10, nBits = 4)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, f"LSH recall $recall%.2f too low even for 4-bit buckets")
    // structural guarantee: LSH never returns a pair outside the bucket join,
    // and every returned neighbor is a real corpus vector
    assert(approx.forall { case (q, v) => q != v })
    // zero bits x one table = single bucket = all candidates: the LSH
    // machinery must reproduce brute force EXACTLY (the ann_lsh_exact
    // oracle anchor)
    val exhaustive = Similarity.lshTopK(emb, queries, 10, nBits = 0, nTables = 1)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaustive == exact, "zero-bit LSH must equal brute force")
  }

  test("shingles of documents shorter than n tokens are empty, not an error") {
    val ss = spark
    import ss.implicits._
    val short = Seq((1L, "one two"), (2L, ""), (3L, "a b c d")).toDF("doc_id", "text")
    val got = short.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L) == Seq("a b c", "b c d"))
    // and the pair pipelines are total on short docs
    assert(Dedup.ngramJaccardPairs(short, 3, 0.1).count() == 0)
  }

  test("maxDocFreq caps hot-shingle pair blowup but keeps true near-dups") {
    val ss = spark
    import ss.implicits._
    // 20 unrelated docs sharing one boilerplate shingle ("common header"),
    // plus one genuine near-dup pair sharing 2 of 3+3 low-frequency shingles
    val hot = (1 to 20).map(i => (i.toLong, s"common header u$i"))
    val near = Seq((100L, "alpha beta gamma delta"), (101L, "alpha beta gamma epsilon"))
    val corpus = (hot ++ near).toDF("doc_id", "text")
    // uncapped: every hot pair shares "common header" -> jaccard 1/3 >= 0.3
    val uncapped = Dedup.ngramJaccardPairs(corpus, n = 2, threshold = 0.3)
    assert(uncapped.count() == 20L * 19 / 2 + 1, "expected 190 hot pairs + 1 near-dup")
    // capped: the df=20 boilerplate shingle is dropped from the index, so
    // the 190 boilerplate-only pairs vanish; the near-dup pair survives
    // because its shared shingles have df=2
    val capped = Dedup.ngramJaccardPairs(corpus, n = 2, threshold = 0.3, maxDocFreq = 5)
      .collect()
    assert(capped.length == 1)
    assert(capped.head.getAs[Long]("i") == 100L && capped.head.getAs[Long]("j") == 101L)
    assert(math.abs(capped.head.getAs[Double]("jaccard") - 0.5) < 1e-12)
    // the default cap is a no-op: bit-identical pair sets
    val default = Dedup.ngramJaccardPairs(corpus, n = 2, threshold = 0.3,
      maxDocFreq = Int.MaxValue)
    assert(default.except(uncapped).isEmpty && uncapped.except(default).isEmpty)
  }

  test("rescoreExact reproduces brute-force cos/rk and drops unknown ids") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "cos", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getInt(3)))).toMap
    // identity property: re-scoring the exact top-k candidate set must
    // return the same pairs with the same 4-dp cosine and the same rank
    val rescored = Similarity.rescoreExact(
      exact.select("qid", "vec_id"), emb, queries)
    assert(keyed(rescored) == keyed(exact),
      "rescoreExact diverged from bruteForceTopK on its own pair set")
    // a fabricated pair with an id that exists on neither side must be
    // dropped by the inner joins, never scored or null-padded
    import SparkSpec.spark.implicits._
    val bogus = Seq((queries.select("vec_id").first().getLong(0), -1L))
      .toDF("qid", "vec_id")
    assert(Similarity.rescoreExact(bogus, emb, queries).count() == 0,
      "rescoreExact invented a score for a nonexistent corpus id")
  }

  test("IVF ANN recall beats LSH at comparable candidate budgets") {
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nCells = 16, nProbe = 4)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, f"IVF recall $recall%.2f below gate")
    // probing all cells must recover brute force exactly
    val full = Similarity.ivfTopK(emb, queries, 10, nCells = 16, nProbe = 16)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "nProbe == nCells must equal the exact result")
  }

  test("unlabeled embedDedupApply blocks by learned IVF cells, never a cross product") {
    val unlabeled = emb.select(col("vec_id"), col("embedding"))
    val out = Similarity.embedDedupApply(unlabeled, 0.9)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"unlabeled dedup degenerated to an all-pairs comparison:\n${p.take(2000)}")

    // reference: label-blind all-pairs drop set (lower id survives)
    def cosOf(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.map(i => x(i) * y(i)).sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val vecs = unlabeled.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val bruteDrop = (for {
      ((i, vi), ii) <- vecs.zipWithIndex
      (j, vj) <- vecs.drop(ii + 1)
      if BigDecimal(cosOf(vi, vj)).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.9
    } yield j).toSet

    // full probe (nProbe == nCells) compares every pair -> exactly brute force
    val fullProbe = Similarity.embedDedupApplyCells(unlabeled, 0.9,
      nCells = 8, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(fullProbe == vecs.map(_._1).toSet -- bruteDrop,
      "full-probe cell dedup must equal the unblocked drop set")

    // blocked path: drops ⊆ brute drops (blocking only removes comparisons),
    // and every drop is justified by a pair SHARING a probe cell
    val kept = out.select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = vecs.map(_._1).toSet -- kept
    assert(dropped.subsetOf(bruteDrop),
      s"cell blocking dropped non-duplicates: ${dropped -- bruteDrop}")
    val cells = Similarity.ivfCells(unlabeled).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getInt(1)).toSet }
    val vecOf = vecs.toMap
    dropped.foreach { j =>
      assert(vecs.exists { case (i, vi) => i < j &&
        (cells(i) & cells(j)).nonEmpty &&
        BigDecimal(cosOf(vi, vecOf(j)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.9 },
        s"dropped $j has no qualifying same-cell lower-id pair")
    }
  }

  test("Aho-Corasick substring kernel matches the contains kernel on 1200 snippets") {
    val ss = spark
    import ss.implicits._
    // 600 genuine substrings of fixture docs (varied offsets — shared
    // prefixes/suffixes exercise the failure links) + 600 absent patterns
    val real = docs.orderBy("doc_id").limit(600).collect().zipWithIndex.map {
      case (r, i) =>
        val t = r.getAs[String]("text")
        val start = math.min((t.length * (i % 7)) / 10, math.max(0, t.length - 25))
        (i.toLong, t.substring(start, math.min(t.length, start + 20)))
    }.toSeq
    val fake = (0 until 600).map(i => (1000L + i, s"zzq_${i}_no_such_text"))
    val snips = (real ++ fake).toDF("eval_id", "eval_text")
    val viaContains = Dedup.substringContamination(docs, snips,
      automatonThreshold = Int.MaxValue)
    val viaAutomaton = Dedup.substringContamination(docs, snips,
      automatonThreshold = 1)
    assert(viaContains.count() > 0, "fixture substrings must hit")
    assert(viaAutomaton.except(viaContains).isEmpty &&
      viaContains.except(viaAutomaton).isEmpty,
      "automaton and contains kernels disagree")
  }

  test("multimodal features flow into the similarity operators end-to-end") {
    // real decode → normalized-histogram feature vectors → brute-force
    // cosine top-k: the full media-dedup pipeline shape with ordinary
    // columns between the stages (no special casing downstream)
    val feats = Multimodal.decodeFeatures(spark,
        Multimodal.mediaDataset(spark, docs))
      .toDF().select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val queries = feats.filter(col("vec_id") < 5)
    val topk = Similarity.bruteForceTopK(feats, queries, k = 3).collect()
    assert(topk.length == 5 * 3)
    assert(topk.forall(r => r.getAs[Double]("cos") <= 1.0001 &&
      r.getAs[Double]("cos") >= -1.0001))
    // value-histograms of the same deterministic generators are highly
    // similar within a kind — nearest neighbors should be close to 1
    assert(topk.filter(_.getAs[Int]("rk") == 1)
      .forall(_.getAs[Double]("cos") > 0.8))
  }

  test("multimodal decode: real codecs behind sniffed dispatch, exact stats") {
    val media = Multimodal.mediaDataset(spark, docs)
    val feats = Multimodal.decodeFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    // dispatch is by MAGIC BYTES and must land on the kind the table
    // declared: image→pgm, audio→wav, video→y4m
    assert(rows.forall(r => (r.kind, r.format) match {
      case ("image", "pgm") | ("audio", "wav") | ("video", "y4m") => true
      case _ => false
    }), "sniffed container disagrees with declared kind")
    // dimensions come from the real header parse
    rows.filter(_.kind == "image").foreach { r =>
      assert(r.width == (r.media_id % 5 + 8).toInt &&
        r.height == (r.media_id % 4 + 6).toInt && r.n_frames == 1)
      assert(r.n_values == r.width.toLong * r.height)
      assert(r.v_min >= 0 && r.v_max <= 255)
    }
    rows.filter(_.kind == "audio").foreach { r =>
      assert(r.n_values == 256 + (r.media_id % 7) * 64)
      assert(r.v_min >= -1024 && r.v_max <= 1023, "PCM range from generator")
    }
    rows.filter(_.kind == "video").foreach { r =>
      assert(r.width == 8 && r.height == 6 &&
        r.n_frames == (4 + r.media_id % 4).toInt)
      assert(r.n_values == 48L * r.n_frames)
    }
    // histogram partitions the value stream; feature = normalized hist
    assert(rows.forall(r => r.h0 + r.h1 + r.h2 + r.h3 == r.n_values))
    assert(rows.forall(r => r.feature.length == 4 &&
      math.abs(r.feature.sum - 1.0f) < 1e-3))
    // hand-check one image against the closed form the oracle replays
    val r0 = rows.find(_.media_id == 0L).get
    val pix0 = (0 until 8 * 6).map(i => (i * 101) % 256)
    assert(r0.v_sum == pix0.sum && r0.v_sumsq == pix0.map(p => p.toLong * p).sum)
    // partition count preserved through mapPartitions
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions)
  }

  test("frame-sampling explodes media 1->N and resize moves real pixels") {
    val media = Multimodal.mediaDataset(spark, docs)
    val byId = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    val frames = Multimodal.sampleFrames(spark, media, stride = 4)
    val byMedia = frames.collect().groupBy(_.media_id)
    byMedia.foreach { case (id, fs) =>
      byId(id).kind match {
        case "video" => // every stride-th decoded luma plane
          val nf = byId(id).n_frames
          assert(fs.map(_.frame_idx).toSet == (0 until nf by 4).toSet)
          assert(fs.forall(f => f.frame.length == 48 && f.width == 8 && f.height == 6))
        case "image" => // the single raster
          assert(fs.length == 1 && fs.head.frame_idx == 0)
          assert(fs.head.frame.length == fs.head.width * fs.head.height)
        case "audio" => // 256-sample PCM16 windows, every stride-th
          val nw = byId(id).n_values.toInt / 256
          assert(fs.map(_.frame_idx).toSet == (0 until nw by 4).toSet)
          assert(fs.forall(f => f.frame.length == 512 && f.width == 256 && f.height == 1))
      }
    }
    // frame bytes are REAL decoded luma: spot-check video 2's frame 0
    // against the generator closed form (id*37 + i*101) % 200 + 0
    byMedia.get(2L).foreach { fs =>
      val f0 = fs.find(_.frame_idx == 0).get
      val want = (0 until 48).map(i => (((2 * 37 + i * 101) % 200) & 0xFF).toByte)
      assert(f0.frame.sameElements(want), "frame 0 luma mismatch vs generator")
    }
    // resize: NN-resample to 8x4 — exact byte count AND the right pixels
    val rs = Multimodal.resizeFrames(spark, frames, targetW = 8, targetH = 4)
      .collect()
    assert(rs.nonEmpty)
    assert(rs.forall(f => f.frame.length == 32 && f.width == 8 && f.height == 4))
    val src = byMedia(2L).find(_.frame_idx == 0).get // 8x6 luma
    val got = rs.filter(_.media_id == 2L).find(_.frame_idx == 0).get
    val wantRs = (0 until 32).map { j =>
      val x = j % 8; val y = j / 8
      src.frame(math.min(5, y * 6 / 4) * 8 + math.min(7, x * 8 / 8))
    }
    assert(got.frame.sameElements(wantRs), "NN resize pixel mapping mismatch")
  }

  test("editDistancePairs respects blocks, threshold, and k1<k2 ordering") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "A", 1, "kitten"),  // block (A,1)
      (2L, "A", 1, "sitten"),  // dist 1 from kitten
      (3L, "A", 1, "sitting"), // dist 3 from kitten, 2 from sitten
      (4L, "A", 2, "kitten"),  // same string, DIFFERENT block — no pair
      (5L, "B", 1, "zzzzzzzzzz") // dist > 2 from everything, same-block none
    ).toDF("id", "blk", "sz", "name")
    val pairs = Dedup.editDistancePairs(df, "id", "name", Seq("blk", "sz"), maxDist = 2)
      .collect()
    val got = pairs.map(r => (r.getAs[Long]("k1"), r.getAs[Long]("k2"),
      r.getAs[Int]("dist"))).toSet
    assert(got == Set((1L, 2L, 1), (2L, 3L, 2)), s"got $got")
    // cross-block identical strings must NOT pair
    assert(!pairs.exists(r => r.getAs[Long]("k2") == 4L))
    // no blocking columns = unbounded cross product: refused loudly
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, "id", "name", Seq.empty, maxDist = 2)
    }
  }

  test("bigramNll matches a hand-computed add-one-smoothed corpus") {
    import SparkSpec.spark.implicits._
    // corpus: unigrams a:2 b:2 x:1 y:1 solo:1 -> V=5 (the one-token doc
    // contributes vocabulary); bigrams (a,b):2 (b,a):1 (x,y):1
    val df = Seq((1L, "a b a b"), (2L, "x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramNll(df).orderBy(col("doc_id")).collect()
    def term(c12: Long, c1: Long, v: Long): BigDecimal =
      BigDecimal(-math.log((c12 + 1.0) / (c1 + v).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val d1 = Seq(term(2, 2, 5), term(1, 2, 5), term(2, 2, 5)).sum.toDouble
    val d2 = term(1, 1, 5).toDouble
    // doc 3 has one token, no bigrams -> absent from the output
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got(0).getAs[Long]("n_bigrams") == 3 &&
      got(0).getAs[Double]("sum_nll") == d1)
    assert(got(1).getAs[Long]("n_bigrams") == 1 &&
      got(1).getAs[Double]("sum_nll") == d2)
  }

  test("dsirWeights matches a hand-computed two-model log-ratio; target scores higher") {
    import SparkSpec.spark.implicits._
    // target = doc 1 ("a b a b"): bigrams (a,b):2 (b,a):1; raw adds
    // doc 2's (x,y):1 -> stats c_raw/c_tgt per bigram, V=3 distinct
    // bigrams, n_raw=4, n_tgt=3
    val df = Seq((1L, "a b a b", "t"), (2L, "x y", "r"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.dsirWeights(df, col("source") === "t")
      .orderBy(col("doc_id")).collect()
    def term(cT: Long, cR: Long): BigDecimal =
      BigDecimal(math.log((cT + 1.0) / (3 + 3).toDouble) -
          math.log((cR + 1.0) / (4 + 3).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val w1 = Seq(term(2, 2), term(1, 1), term(2, 2)).sum.toDouble
    val w2 = term(0, 1).toDouble
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got(0).getAs[Long]("n_bigrams") == 3 &&
      got(0).getAs[Double]("log_weight") == w1 &&
      got(0).getAs[Int]("is_target") == 1)
    assert(got(1).getAs[Long]("n_bigrams") == 1 &&
      got(1).getAs[Double]("log_weight") == w2 &&
      got(1).getAs[Int]("is_target") == 0)
    // self-inclusion bias: the target doc outweighs the non-target one
    assert(w1 / 3 > w2 / 1, s"per-bigram target weight $w1/3 !> non-target $w2")
  }

  test("dsirWeights on the fixture: target docs outweigh non-target on average") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = TextOps.dsirWeights(docs,
        col("source").isin("src0", "src1", "src2", "src3"))
      .collect()
    val (t, r) = w.partition(_.getAs[Int]("is_target") == 1)
    assert(t.nonEmpty && r.nonEmpty)
    def meanPerBigram(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(x => x.getAs[Double]("log_weight") / x.getAs[Long]("n_bigrams"))
        .sum / rows.length
    assert(meanPerBigram(t) > meanPerBigram(r),
      s"expected self-inclusion bias: target ${meanPerBigram(t)} vs ${meanPerBigram(r)}")
  }

  test("substringContamination finds verbatim hits only, csv-sorted") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox appears"),
      (3L, "nothing to see here")
    ).toDF("doc_id", "text")
    val snippets = Seq((10L, "quick brown fox"), (11L, "lazy dog"))
      .toDF("eval_id", "eval_text")
    val got = graft.ext.Dedup.substringContamination(docs, snippets)
      .orderBy(col("doc_id")).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got(0).getAs[Long]("n_hits") == 2 &&
      got(0).getAs[String]("hit_ids") == "10,11")
    assert(got(1).getAs[Long]("n_hits") == 1 &&
      got(1).getAs[String]("hit_ids") == "10")
  }

  test("repetitionSignals flags degenerate text and zero-fills short docs") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam"),   // 1 distinct token, 3 identical bigrams
      (2L, "all tokens here differ"),
      (3L, "solo")                   // no bigrams/trigrams at all
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(df).orderBy(col("doc_id")).collect()
    assert(got(0).getAs[Double]("top_token_frac") == 1.0)
    assert(got(0).getAs[Double]("dup_bigram_frac") == 1.0 - 1.0 / 3.0)
    assert(got(0).getAs[Double]("dup_trigram_frac") == 0.5)
    assert(got(1).getAs[Double]("top_token_frac") == 0.25)
    assert(got(1).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(got(2).getAs[Long]("n_tokens") == 1L &&
      got(2).getAs[Double]("dup_bigram_frac") == 0.0 &&
      got(2).getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("mmrSelect matches the greedy brute force and out-diversifies top-k") {
    val s = spark
    import s.implicits._
    // corpus with a redundant cluster near the anchor: pure relevance
    // top-k would pick the clones; MMR must not
    val rng = new scala.util.Random(5)
    def jitter(base: Array[Double], eps: Double) =
      base.map(x => x + eps * rng.nextDouble())
    val anchor = Array(1.0, 0.0, 0.0, 0.0)
    // clone cluster: most relevant (cos ~0.95) and mutually near-identical;
    // the diverse candidates are slightly less relevant (cos 0.9) but far
    // from the clones — MMR must trade the clones for them after one pick
    val clone = Array(0.95, 0.3122498999, 0.0, 0.0)
    val rows =
      (1L, anchor.toSeq) +:                                   // anchor itself (vec_id 1)
      (2L to 5L).map(i => (i, jitter(clone, 0.005).toSeq)) :+ // clone cluster
      (6L, Seq(0.9, -0.4358898944, 0.0, 0.0)) :+
      (7L, Seq(0.9, 0.0, -0.4358898944, 0.0)) :+
      (8L, Seq(0.0, 1.0, 0.0, 0.0))
    val emb4 = rows.toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(emb4, anchorId = 1L, k = 3, lambdaPct = 70)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // brute force with Spark's exact arithmetic (round-half-up at 4dp)
    def r4(x: Double) =
      BigDecimal.valueOf(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def cos(a: Seq[Double], b: Seq[Double]) =
      r4(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    val cands = rows.filter(_._1 != 1L)
    val rel = cands.map { case (id, v) => id -> cos(v, anchor.toSeq) }.toMap
    val vecOf = cands.toMap
    var sel = List.empty[Long]
    val expect = (1 to 3).map { t =>
      val pick = cands.filter(c => !sel.contains(c._1)).map { case (id, v) =>
        val mmr =
          if (sel.isEmpty) rel(id)
          else 0.7 * rel(id) - 0.3 * sel.map(sid => cos(v, vecOf(sid))).max
        (id, mmr)
      }.minBy { case (id, m) => (-m, id) }
      sel = sel :+ pick._1
      (t, pick._1, rel(pick._1), pick._2)
    }
    assert(got.toSeq == expect)
    // diversity: the three picks are NOT all from the clone cluster,
    // though the top-3 by pure relevance are
    val topRel = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(3).map(_._1)
    assert(topRel.forall(id => id >= 2 && id <= 5))
    assert(!got.map(_._2).forall(id => id >= 2 && id <= 5))
  }

  test("embed_pool_mean is partition-invariant and matches driver math") {
    val out = SparkEntry.queries("embed_pool_mean")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // driver-side recompute with the same 7-dp decimal rounding
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0) % 50,
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val expect = vecs.groupBy(_._1).flatMap { case (g, vs) =>
      val dim = vs.head._2.length
      (0 until dim).map { p =>
        val terms = vs.map(v => BigDecimal(v._2(p))
          .setScale(7, BigDecimal.RoundingMode.HALF_UP))
        (g, p.toLong) -> ((vs.length.toLong,
          terms.sum.toDouble / vs.length))
      }
    }
    assert(out.size == expect.size)
    expect.foreach { case (k, v) =>
      assert(out(k) == v, s"pooled mismatch at $k: ${out(k)} vs $v") }
  }

  test("retrieval_hybrid_rrf: ranks contiguous, rrf matches the formula") {
    val rows = SparkEntry.queries("retrieval_hybrid_rrf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRk = g.sortBy(_.getLong(1))
      assert(byRk.map(_.getLong(1)).toSeq == (1L to g.length).toSeq,
        "fused ranks must be contiguous from 1")
      val scores = byRk.map(_.getDouble(5)).toSeq
      assert(scores == scores.sorted.reverse, "rrf not non-increasing by rank")
    }
    rows.foreach { r =>
      val d = Option(r.get(3)).map(_.asInstanceOf[Long])
      val l = Option(r.get(4)).map(_.asInstanceOf[Long])
      val expect = d.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        l.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(r.getDouble(5) == expect, s"rrf mismatch on row $r")
      assert(d.nonEmpty || l.nonEmpty, "a fused row must come from a leg")
    }
  }

  test("plantedDocs single-scan explode equals the 3-branch union form") {
    import org.apache.spark.sql.functions._
    // the union formulation the conditional explode replaced (round 8):
    // any drift in the planted arithmetic breaks every detector oracle
    val base = graft.Tables.tf(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val unionForm = base
      .unionByName(base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 25 === 13)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra token tail")).as("text")))
    val got = Extensions.plantedDocs(spark, sf)
    assert(got.count() == unionForm.count())
    assert(got.exceptAll(unionForm).isEmpty && unionForm.exceptAll(got).isEmpty,
      "single-scan planted corpus diverged from the union form")
  }

  test("co-purchase posting-list edges equal the self-join form") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.t(spark, sf, "lineitem")
      .filter(col("l_quantity") >= 30)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val joinForm = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
      .distinct()
    // exercise the PRODUCTION posting-list path (private[queries]), not
    // a re-implementation a production edit could silently drift from
    val postingForm = Extensions.bulkCoPurchaseEdges(spark, sf)
    assert(postingForm.exceptAll(joinForm).isEmpty &&
      joinForm.exceptAll(postingForm).isEmpty,
      "posting-list co-purchase edges diverged from the self-join form")
  }
}
