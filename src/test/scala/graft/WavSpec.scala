package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{Wav, WavClip}

/** Byte-level conformance of the REAL WAV codec: the golden vector is
  * hand-written from the RIFF spec (every byte a literal, independent of
  * the encoder's ByteBuffer construction), so a matched encode/decode
  * bug pair cannot silently cancel the way a pure round-trip test would
  * allow. */
class WavSpec extends SparkSpec {

  private val goldenSamples =
    Array[Short](0, 1000, -1000, Short.MaxValue, Short.MinValue)

  /** Canonical 44-byte-header PCM16 mono file at 8 kHz holding
    * goldenSamples — all 54 bytes written out by hand. */
  private val goldenBytes: Array[Byte] = Array(
    'R', 'I', 'F', 'F',             // RIFF magic
    46, 0, 0, 0,                    // riff size = 36 + 10
    'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ',
    16, 0, 0, 0,                    // fmt chunk size
    1, 0,                           // PCM
    1, 0,                           // mono
    0x40, 0x1F, 0, 0,               // 8000 Hz
    0x80, 0x3E, 0, 0,               // byte rate 16000
    2, 0,                           // block align
    16, 0,                          // bits per sample
    'd', 'a', 't', 'a',
    10, 0, 0, 0,                    // data size = 5 samples * 2
    0x00, 0x00,                     // 0
    0xE8, 0x03,                     // 1000
    0x18, 0xFC,                     // -1000
    0xFF, 0x7F,                     // 32767
    0x00, 0x80                      // -32768
  ).map(_.toByte)

  test("encoder reproduces the hand-written golden bytes exactly") {
    val got = Wav.encode(WavClip(8000, goldenSamples))
    assert(got.toSeq == goldenBytes.toSeq,
      s"byte ${got.toSeq.zip(goldenBytes).indexWhere(p => p._1 != p._2)} differs")
  }

  test("decoder recovers rate and samples from the golden bytes") {
    val clip = Wav.decode(goldenBytes)
    assert(clip.sampleRate == 8000)
    assert(clip.samples.toSeq == goldenSamples.toSeq)
  }

  test("decoder walks past unknown chunks (and their odd-size pad byte)") {
    // splice a 3-byte junk chunk (padded to 4) between fmt and data
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 7, 8, 9, 0)
    val spliced = goldenBytes.take(36) ++ junk ++ goldenBytes.drop(36)
    // riff size field is now stale — real readers tolerate that
    val clip = Wav.decode(spliced)
    assert(clip.samples.toSeq == goldenSamples.toSeq)
  }

  test("decoder rejects malformed files with specific errors") {
    def err(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](Wav.decode(bytes)).getMessage
    assert(err("OGGS".getBytes ++ goldenBytes.drop(4)).contains("RIFF"))
    assert(err(goldenBytes.take(30)).contains("overruns"))
    // data chunk ahead of fmt must fail, not NPE
    val noFmt = goldenBytes.take(12) ++ goldenBytes.drop(36)
    assert(err(noFmt).contains("before fmt"))
    // odd data size
    val odd = goldenBytes.clone(); odd(40) = 9
    assert(err(odd).toLowerCase.contains("odd") || err(odd).contains("overruns"))
  }

  test("round-trip holds for arbitrary clips") {
    val s = Array.tabulate(777)(i => ((i * 2731 + 17) % 65536 - 32768).toShort)
    val clip = WavClip(44100, s)
    val back = Wav.decode(Wav.encode(clip))
    assert(back.sampleRate == 44100 && back.samples.toSeq == s.toSeq)
  }

  test("resampleLinear: identity at equal rates, exact midpoints at 2x") {
    val clip = WavClip(8000, Array[Short](0, 100, -100, 31))
    assert(Multimodal.resampleLinear(clip, 8000).samples.toSeq ==
      clip.samples.toSeq)
    // 2x upsample: even outputs are the sources, odd are (a+b) quot 2
    // (truncation toward zero, so (100 + -100)/2 = 0 and (-100+31)/2 = -34)
    val up = Multimodal.resampleLinear(clip, 16000).samples.toSeq
    assert(up == Seq[Short](0, 50, 100, 0, -100, -34, 31, 31), up.toString)
  }

  test("acoustic fingerprint: planted exact copies always collide") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val pairs = graft.queries.Extensions
      .queries("multimodal_wav_fp_pairs")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.filter(col("doc_id") % 25 === 0)
      .collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(pairs.contains((id, id + 200000)),
        s"planted copy pair ($id, ${id + 200000}) missing")
    }
  }

  test("Y4M: encoder matches the hand-written golden bytes; decoder inverts") {
    import graft.ext.Multimodal.{Y4m, Y4mVideo}
    val v = Y4mVideo(2, 2, Array(Array(10, 20, 30, 40), Array(50, 60, 70, 80)))
    val golden: Array[Byte] =
      ("YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n" +
        "FRAME\n").getBytes("US-ASCII") ++
        Array[Byte](10, 20, 30, 40) ++ Array[Byte](128.toByte, 128.toByte) ++
        "FRAME\n".getBytes("US-ASCII") ++
        Array[Byte](50, 60, 70, 80) ++ Array[Byte](128.toByte, 128.toByte)
    assert(Y4m.encode(v).toSeq == golden.toSeq)
    val back = Y4m.decode(golden)
    assert(back.width == 2 && back.height == 2 && back.frames.length == 2)
    assert(back.frames(0).toSeq == Seq(10, 20, 30, 40))
    assert(back.frames(1).toSeq == Seq(50, 60, 70, 80))
  }

  test("Y4M decoder: real-reader tolerances and rejections") {
    import graft.ext.Multimodal.Y4m
    def b(s: String, tail: Array[Byte] = Array()): Array[Byte] =
      s.getBytes("US-ASCII") ++ tail
    // unknown header tags and FRAME parameters are skipped
    val tolerant = b("YUV4MPEG2 W2 H2 F30000:1001 Xcustom C420mpeg2\n" +
      "FRAME Ixyz\n", Array[Byte](1, 2, 3, 4, 9, 9))
    val v = Y4m.decode(tolerant)
    assert(v.frames(0).toSeq == Seq(1, 2, 3, 4))
    def err(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](Y4m.decode(bytes)).getMessage
    assert(err(b("MPEG4 W2 H2\nFRAME\n")).contains("magic"))
    assert(err(b("YUV4MPEG2 W2 H2 C444\nFRAME\n")).contains("colorspace"))
    assert(err(b("YUV4MPEG2 W3 H2\nFRAME\n")).contains("even"))
    assert(err(b("YUV4MPEG2 W2 H2\nFRAME\n", Array[Byte](1, 2)))
      .contains("truncated"))
  }

  test("y4mSceneCuts detects exactly the planted scene boundaries") {
    val docs = spark.range(7, 9).toDF("doc_id") // nf = 4+7%4=7 and 4+8%4=4
    val out = Multimodal.y4mSceneCuts(spark,
      Multimodal.y4mMediaTable(spark, docs))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    // cuts sit at f = 3, 6, ... (scene = f div 3 changes)
    assert(out(7L) == ((7, 2L, 3L + 6L)), out(7L).toString)
    assert(out(8L) == ((4, 1L, 3L)), out(8L).toString)
  }

  test("wavFeatures matches the closed-form statistics for a fixture id") {
    val docs = spark.range(5, 6).toDF("doc_id") // media_id 5
    val out = Multimodal.wavFeatures(spark,
      Multimodal.wavMediaTable(spark, docs)).collect()(0)
    val id = 5L
    val n = (256 + (id % 7) * 64).toInt
    val v = Array.tabulate(n)(i => ((id * 31 + i.toLong * 17) % 2048 - 1024).toInt)
    assert(out.getLong(1) == n.toLong)
    assert(out.getInt(2) == 8000 && out.getLong(3) == n * 1000L / 8000)
    assert(out.getInt(4) == v.map(math.abs).max)
    assert(out.getLong(5) ==
      v.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong)
    assert(out.getLong(6) == v.map(x => math.abs(x).toLong).sum)
    assert(out.getLong(7) == v.map(x => x.toLong * x).sum)
    assert(out.getDouble(8) == math.sqrt(out.getLong(7).toDouble / n))
  }
}
