package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ext.Dedup

/** Property tests pinning the posting-list pair detectors to brute-force
  * references on RANDOM corpora — the DuckDB oracle only exercises the
  * fixture distribution; these guard the semantics (exact pair sets, not
  * just planted positives) across skewed vocabularies, repeated tokens,
  * short docs, and bucket-boundary cases. Deterministic: corpora are
  * drawn from a fixed ScalaCheck seed.
  */
class DedupPropertySpec extends SparkSpec {

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "ez",
    "fox", "golf", "hat", "i", "jazz")
  private val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, wordGen))
  private val corpusGen: Gen[List[List[String]]] = Gen.chooseNum(2, 24)
    .flatMap(n => Gen.listOfN(n, docGen))

  /** n deterministic corpora from a fixed seed. */
  private def corpora(n: Int, seed: Long = 42L): Seq[List[List[String]]] = {
    var s = Seed(seed)
    (1 to n).map { _ =>
      val v = corpusGen.pureApply(Gen.Parameters.default, s)
      s = s.next
      v
    }
  }

  private def toDf(corpus: List[List[String]]) = {
    val ss = spark
    import ss.implicits._
    corpus.zipWithIndex
      .map { case (ws, id) => (id.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  private def shingleSet(ws: List[String], n: Int): Set[String] =
    if (ws.length < n) Set.empty
    else ws.sliding(n).map(_.mkString(" ")).toSet

  test("ngramJaccardPairs == brute-force jaccard over distinct shingle sets") {
    corpora(10).foreach { corpus =>
      val n = 2
      val sets = corpus.map(shingleSet(_, n))
      val expected = (for {
        i <- corpus.indices; j <- corpus.indices
        if i < j && sets(i).nonEmpty && sets(j).nonEmpty
        inter = (sets(i) intersect sets(j)).size
        if inter > 0
        jac = inter.toDouble / (sets(i) union sets(j)).size
        if jac >= 0.4
      } yield (i.toLong, j.toLong, jac)).toSet
      val got = Dedup.ngramJaccardPairs(toDf(corpus), n = n, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("simhashPairs == brute-force hamming pairs over simhash32, each pair exactly once") {
    corpora(6, seed = 7L).foreach { corpus =>
      val df = toDf(corpus).filter("trim(text) != ''")
      val hashes = Dedup.simhash32(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (for {
        i <- hashes.keys; j <- hashes.keys
        if i < j
        hd = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
        if hd <= 3
      } yield (i, j, hd)).toSet
      // collect as a LIST: emission-uniqueness (one row per pair, from its
      // smallest shared chunk) must hold, not just set equality
      val got = Dedup.simhashPairs(df, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
      assert(got.distinct.size == got.size, s"duplicate pair emission: $got")
      assert(got.toSet == expected, s"corpus=$corpus")
    }
  }

  test("minhashLshPairs: candidates only from shared bands, estimate = matching fraction") {
    corpora(6, seed = 11L).foreach { corpus =>
      val df = toDf(corpus)
      val sigs = Dedup.minhashSignatures(df, n = 2).collect()
        .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
      def shareBand(a: Vector[Long], b: Vector[Long]): Boolean =
        (0 until 4).exists(bd => (0 until 4).forall(r => a(bd * 4 + r) == b(bd * 4 + r)))
      val expected = (for {
        i <- sigs.keys; j <- sigs.keys
        if i < j && shareBand(sigs(i), sigs(j))
        est = (0 until 16).count(k => sigs(i)(k) == sigs(j)(k)) / 16.0
        if est >= 0.5
      } yield (i, j, est)).toSet
      val got = Dedup.minhashLshPairs(df, n = 2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("contaminationScore: exact shared-fraction against set arithmetic") {
    corpora(5, seed = 23L).foreach { corpus =>
      val n = 2
      val df = toDf(corpus)
      val benchDocs = corpus.zipWithIndex.filter(_._2 % 3 == 0).map(_._1)
      val benchSet = benchDocs.flatMap(shingleSet(_, n)).toSet
      val expected = corpus.zipWithIndex.flatMap { case (ws, id) =>
        val s = shingleSet(ws, n)
        val shared = (s intersect benchSet).size
        if (s.nonEmpty && shared > 0) Some((id.toLong, s.size, shared.toLong))
        else None
      }.toSet
      val got = Dedup.contaminationScore(df, toDf(benchDocs), n)
        .filter("n_shared > 0")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("dedupExact keeps exactly one row per content even for repeated input rows") {
    val ss = spark
    import ss.implicits._
    // a re-ingested shard: the SAME (doc_id, text) row lands twice
    val docs = Seq((1L, "alpha beta"), (1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "gamma")).toDF("doc_id", "text")
    val kept = Dedup.dedupExact(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    assert(kept.size == kept.distinct.size, s"duplicate survivors: $kept")
    assert(kept.toSet == Set((1L, "alpha beta"), (3L, "gamma")), s"got $kept")
  }

  test("minhashLshAgainst == banded cross-(batch,base) candidates, estimate from signatures") {
    corpora(6, seed = 43L).foreach { corpus =>
      val df = toDf(corpus)
      val base = df.filter("doc_id % 2 = 0")
      val batch = df.filter("doc_id % 2 = 1")
      val sigs = Dedup.minhashSignatures(df, n = 2).collect()
        .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toVector).toMap
      def shareBand(a: Vector[Long], b: Vector[Long]): Boolean =
        (0 until 4).exists(bd => (0 until 4).forall(r => a(bd * 4 + r) == b(bd * 4 + r)))
      val expected = (for {
        i <- sigs.keys if i % 2 == 1
        j <- sigs.keys if j % 2 == 0
        if shareBand(sigs(i), sigs(j))
        est = (0 until 16).count(k => sigs(i)(k) == sigs(j)(k)) / 16.0
        if est >= 0.5
      } yield (i, j, est)).toSet
      val got = Dedup.minhashLshAgainst(base, batch, n = 2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("segmentDedup == first-occurrence scan over fixed-width segments") {
    corpora(8, seed = 31L).foreach { corpus =>
      val segWords = 3
      // brute force: walk docs in (doc_id, seg_idx) order, keep a segment
      // only the first time its text is seen anywhere in the corpus
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = corpus.zipWithIndex.map { case (ws, id) =>
        val words = if (ws.isEmpty) List("") else ws
        val segs = words.grouped(segWords).map(_.mkString(" ")).toList
        val kept = segs.filter(seg => seen.add(seg))
        (id.toLong, segs.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toSet
      val got = Dedup.segmentDedup(toDf(corpus), segWords)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("containmentPairs == brute-force |A∩B|/|A| in both directions") {
    corpora(8, seed = 37L).foreach { corpus =>
      val n = 2
      val sets = corpus.map(shingleSet(_, n))
      val expected = (for {
        i <- corpus.indices; j <- corpus.indices
        if i != j && sets(i).nonEmpty && sets(j).nonEmpty
        inter = (sets(i) intersect sets(j)).size
        if inter > 0
        cont = inter.toDouble / sets(i).size
        if cont >= 0.5
      } yield (i.toLong, j.toLong, cont)).toSet
      val got = Dedup.containmentPairs(toDf(corpus), n = n, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("repeatedSpans matches a brute-force span merge on random corpora") {
    val n = 2 // short grams so random corpora actually collide
    corpora(10, seed = 53L).foreach { corpus =>
      // brute force: positions whose n-gram occurs in >= 2 distinct docs,
      // merged into maximal consecutive runs
      val grams = corpus.zipWithIndex.flatMap { case (ws, d) =>
        ws.sliding(n).toList.zipWithIndex.collect {
          case (g, i) if g.length == n => (d.toLong, i + 1L, g.mkString(" "))
        }
      }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val expected = grams.filter(g => dup(g._3))
        .groupBy(_._1).toSeq.flatMap { case (d, ps) =>
          // consecutive positions share pos - rank: each group is one run
          ps.map(_._2).sorted.zipWithIndex
            .groupBy { case (p, idx) => p - idx }
            .values.map(_.map(_._1))
            .map(r => (d, r.min, r.max + n - 1, r.size.toLong))
        }.toSet
      val got = Dedup.repeatedSpans(toDf(corpus), n = n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("applySpanDedup cuts exactly the non-owner-covered tokens") {
    val n = 2
    corpora(10, seed = 59L).foreach { corpus =>
      val grams = corpus.zipWithIndex.flatMap { case (ws, d) =>
        ws.sliding(n).toList.zipWithIndex.collect {
          case (g, i) if g.length == n => (d.toLong, i + 1, g.mkString(" "))
        }
      }
      val owner = grams.groupBy(_._3)
        .collect { case (g, os) if os.map(_._1).distinct.size >= 2 =>
          g -> os.map(_._1).min }
      val expected = corpus.zipWithIndex.map { case (ws, di) =>
        val d = di.toLong
        val toks = (if (ws.isEmpty) List("") else ws).zipWithIndex
          .map { case (t, i) => (i + 1, t) }
        // token removed iff covered by a dup gram occurrence owned elsewhere
        val removed = grams.collect {
          case (`d`, p, g) if owner.get(g).exists(_ != d) =>
            (p until p + n).toSet
        }.foldLeft(Set.empty[Int])(_ ++ _)
        val kept = toks.filterNot { case (p, _) => removed(p) }
        (d, toks.size.toLong, removed.size.toLong,
          kept.map(_._2).mkString(" "))
      }.toSet
      val got = Dedup.applySpanDedup(toDf(corpus), n = n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }
}
