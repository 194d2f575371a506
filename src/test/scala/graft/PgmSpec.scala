package graft

import graft.ext.Multimodal.{Pgm, PgmImage}

/** The REAL netpbm codec: encode/decode roundtrips for both raster
  * encodings, spec-mandated header tolerance (comments, arbitrary
  * whitespace), the nearest-neighbor resize kernel, and the malformed-
  * input contract (throw, never garbage — pipelines wrap in a try-gate).
  */
class PgmSpec extends SparkSpec {

  private def randomImage(seed: Int): PgmImage = {
    val rng = new scala.util.Random(seed)
    val (w, h) = (1 + rng.nextInt(40), 1 + rng.nextInt(30))
    PgmImage(w, h, Array.fill(w * h)(rng.nextInt(256)))
  }

  test("P5 and P2 roundtrip losslessly on random images") {
    (1 to 20).foreach { s =>
      val img = randomImage(s)
      val viaP5 = Pgm.decode(Pgm.encodeP5(img))
      val viaP2 = Pgm.decode(Pgm.encodeP2(img))
      assert(viaP5.width == img.width && viaP5.height == img.height)
      assert(viaP5.pixels.toSeq == img.pixels.toSeq, s"P5 roundtrip seed $s")
      assert(viaP2.pixels.toSeq == img.pixels.toSeq, s"P2 roundtrip seed $s")
    }
  }

  test("header tolerates comments and arbitrary whitespace (netpbm spec)") {
    val bytes = "P2 # a comment\n# another line\n  3\t2 \n255\n0 64 128 192 255 7"
      .getBytes("US-ASCII")
    val img = Pgm.decode(bytes)
    assert(img.width == 3 && img.height == 2)
    assert(img.pixels.toSeq == Seq(0, 64, 128, 192, 255, 7))
  }

  test("nearest-neighbor resize picks the expected source pixels") {
    // 2x2 quadrants scaled to 4x4 must replicate each quadrant
    val img = PgmImage(2, 2, Array(10, 20, 30, 40))
    val up = Pgm.resizeNearest(img, 4, 4)
    assert(up.pixels.toSeq == Seq(
      10, 10, 20, 20,
      10, 10, 20, 20,
      30, 30, 40, 40,
      30, 30, 40, 40))
    // identity resize is a no-op; downscale picks the top-left of each cell
    assert(Pgm.resizeNearest(img, 2, 2).pixels.toSeq == img.pixels.toSeq)
    assert(Pgm.resizeNearest(up, 2, 2).pixels.toSeq == img.pixels.toSeq)
  }

  test("phash pigeonhole blocking finds exactly the brute-force pairs") {
    import org.apache.spark.sql.functions._
    // random corpus with planted near-dups: pairs of images differing in
    // a handful of pixels (small hamming), plus unrelated images
    val rng = new scala.util.Random(7)
    val imgs = (0 until 60).map { i =>
      if (i % 3 == 1) {
        // near-copy of the previous image: flip a few pixels
        val base = randomImage(i - 1).pixels.clone()
        (0 until 2).foreach(_ => base(rng.nextInt(base.length)) = rng.nextInt(256))
        val prev = randomImage(i - 1)
        (i.toLong, Pgm.encodeP5(PgmImage(prev.width, prev.height, base)))
      } else (i.toLong, Pgm.encodeP5(randomImage(i)))
    }
    val s = spark
    import s.implicits._
    val media = imgs.toDF("media_id", "payload")
    val got = graft.ext.Multimodal.phashPairs(spark, media, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same hashes
    val hs = imgs.map { case (id, b) =>
      (id, graft.ext.Multimodal.dHash56(Pgm.decode(b)))
    }
    val want = (for {
      (i, hi) <- hs; (j, hj) <- hs if i < j
      d = java.lang.Long.bitCount(hi ^ hj) if d <= 3
    } yield (i, j, d)).toSet
    assert(want.nonEmpty, "planted near-dups must produce pairs")
    assert(got == want)
    // plan shape: posting-list pipeline, never a quadratic join
    val plan = graft.ext.Multimodal.phashPairs(spark, media, maxDist = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"quadratic pair plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"quadratic pair plan:\n$plan")
  }

  test("malformed input throws instead of decoding garbage") {
    val bad = Seq(
      "P3\n2 2\n255\n0 0 0 0",      // wrong magic
      "P2\n2 2\n255\n0 0 0",        // truncated raster
      "P2\n0 2\n255\n",             // zero width
      "P2\n2 2\n999\n0 0 0 0",      // maxval out of byte range
      "P2\n2 2\n255\n0 0 0 300",    // pixel beyond maxval
      "P5\n65536 65536\n255\n")     // w*h wraps Int to 0 — must throw, not "decode"
    bad.foreach { s =>
      intercept[IllegalArgumentException](Pgm.decode(s.getBytes("US-ASCII")))
    }
    // P5 raster shorter than width*height
    val p5 = Pgm.encodeP5(PgmImage(2, 2, Array(1, 2, 3, 4))).dropRight(1)
    intercept[IllegalArgumentException](Pgm.decode(p5))
  }
}
