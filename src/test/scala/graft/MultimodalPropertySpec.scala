package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ext.{MediaFeatures, MediaMeta, MediaRecord, Multimodal}
import graft.ext.Multimodal.{PgmImage, WavClip, Y4mVideo}

/** Property tests for the generic media decode: the fixture generators
  * exercise ONE payload distribution; these pin [[Multimodal.decodeMedia]]
  * against direct computation on RANDOM images/clips/videos —
  * dimensions from the parse, exact stats over the decoded values,
  * histogram partition, and magic-byte dispatch — plus the P2-vs-P5
  * encoding equivalence (same pixels through either container must
  * decode to identical features except n_bytes). Deterministic: drawn
  * from a fixed ScalaCheck seed. */
class MultimodalPropertySpec extends SparkSpec {

  private def draws[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    var s = Seed(seed)
    (1 to n).map { _ =>
      val v = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      v
    }
  }

  private val imgGen: Gen[PgmImage] = for {
    w <- Gen.chooseNum(1, 17)
    h <- Gen.chooseNum(1, 13)
    px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
  } yield PgmImage(w, h, px.toArray)

  private val clipGen: Gen[WavClip] = for {
    rate <- Gen.oneOf(8000, 16000, 44100)
    n <- Gen.chooseNum(0, 300)
    s <- Gen.listOfN(n, Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt))
  } yield WavClip(rate, s.map(_.toShort).toArray)

  private val vidGen: Gen[Y4mVideo] = for {
    w <- Gen.oneOf(2, 4, 8, 10)
    h <- Gen.oneOf(2, 4, 6)
    nf <- Gen.chooseNum(0, 6)
    fs <- Gen.listOfN(nf, Gen.listOfN(w * h, Gen.chooseNum(0, 255)))
  } yield Y4mVideo(w, h, fs.map(_.toArray).toArray)

  private def rec(kind: String, fmt: String, payload: Array[Byte]) =
    MediaRecord(1L, kind, payload, MediaMeta(fmt, payload.length.toLong, "t"))

  private def check(values: Seq[Int], bin: Int => Int,
      f: MediaFeatures): Unit = {
    assert(f.n_values == values.length)
    if (values.nonEmpty) {
      assert(f.v_min == values.min && f.v_max == values.max)
      assert(f.v_sum == values.map(_.toLong).sum)
      assert(f.v_sumsq == values.map(v => v.toLong * v).sum)
      val hist = values.groupBy(bin).view.mapValues(_.size.toLong).toMap
      assert(Seq(f.h0, f.h1, f.h2, f.h3) ==
        (0 to 3).map(b => hist.getOrElse(b, 0L)))
    } else {
      assert(f.v_min == 0 && f.v_max == 0 && f.v_sum == 0)
    }
    assert(f.h0 + f.h1 + f.h2 + f.h3 == f.n_values)
  }

  test("random PGM payloads: sniff, parse, exact stats (P2 == P5 modulo bytes)") {
    draws(imgGen, 40, 7L).foreach { img =>
      val p5 = Multimodal.Pgm.encodeP5(img)
      val p2 = Multimodal.Pgm.encodeP2(img)
      assert(Multimodal.sniffFormat(p5) == "pgm" &&
        Multimodal.sniffFormat(p2) == "pgm")
      val f5 = Multimodal.decodeMedia(rec("image", "pgm", p5))
      val f2 = Multimodal.decodeMedia(rec("image", "pgm", p2))
      assert(f5.width == img.width && f5.height == img.height && f5.n_frames == 1)
      check(img.pixels.toSeq, _ >> 6, f5)
      // container-independent decode: same pixels, same features
      // (only n_bytes differs between the ASCII and binary containers)
      assert(f2.width == f5.width && f2.height == f5.height &&
        f2.v_sum == f5.v_sum && f2.v_sumsq == f5.v_sumsq &&
        f2.v_min == f5.v_min && f2.v_max == f5.v_max &&
        f2.h0 == f5.h0 && f2.h1 == f5.h1 && f2.h2 == f5.h2 && f2.h3 == f5.h3)
    }
  }

  test("random WAV payloads: sniff, chunk-walk, exact PCM stats") {
    draws(clipGen, 40, 11L).foreach { clip =>
      val bytes = Multimodal.Wav.encode(clip)
      assert(Multimodal.sniffFormat(bytes) == "wav")
      val f = Multimodal.decodeMedia(rec("audio", "wav", bytes))
      assert(f.format == "wav" && f.width == 0 && f.height == 0 && f.n_frames == 0)
      check(clip.samples.map(_.toInt).toSeq, v => (v + 32768) >> 14, f)
    }
  }

  test("random Y4M payloads: sniff, frame walk, exact luma stats") {
    draws(vidGen, 40, 13L).foreach { vid =>
      val bytes = Multimodal.Y4m.encode(vid)
      assert(Multimodal.sniffFormat(bytes) == "y4m")
      val f = Multimodal.decodeMedia(rec("video", "y4m", bytes))
      assert(f.width == vid.width && f.height == vid.height &&
        f.n_frames == vid.frames.length)
      check(vid.frames.flatten.toSeq, _ >> 6, f)
    }
  }

  test("unrecognized containers are refused loudly") {
    intercept[IllegalArgumentException](
      Multimodal.sniffFormat("GIF89a....".getBytes))
    intercept[IllegalArgumentException](Multimodal.sniffFormat(Array[Byte]()))
  }
}
