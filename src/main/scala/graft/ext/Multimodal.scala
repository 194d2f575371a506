package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media metadata carried alongside the opaque payload. */
final case class MediaMeta(format: String, n_bytes: Long, source: String)

/** One media object: opaque binary payload + typed metadata. */
final case class MediaRecord(media_id: Long, kind: String,
    payload: Array[Byte], meta: MediaMeta)

/** Decoded/extracted features per media object — every field computed
  * from a REAL codec parse of the payload bytes (see [[Multimodal.decodeMedia]]):
  * container format from magic-byte sniffing, dimensions from the
  * parsed header, and exact integer statistics + 4-bin histogram over
  * the decoded value stream (pixels / PCM samples / luma planes).
  * `feature` is the normalized histogram as an ordinary vector column
  * for downstream similarity/dedup operators. */
final case class MediaFeatures(media_id: Long, kind: String, format: String,
    n_bytes: Long, width: Int, height: Int, n_frames: Int, n_values: Long,
    v_min: Int, v_max: Int, v_sum: Long, v_sumsq: Long,
    h0: Long, h1: Long, h2: Long, h3: Long, feature: Array[Float])

/** One sampled frame of a video payload (or the single "frame" of a
  * still image): the unit row after frame-sampling explodes media. */
final case class MediaFrame(media_id: Long, frame_idx: Int,
    width: Int, height: Int, frame: Array[Byte])

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (SURVEY.md north-star ops), decoded by
  * the REAL codecs below — PGM for images, RIFF/WAVE PCM16 for audio,
  * YUV4MPEG2 for video. Dispatch is by magic-byte sniffing (what a real
  * ingest does), dimensions come from the parsed headers, and every
  * statistic is computed over actually-decoded pixel/sample values.
  * Codec-class formats whose libraries aren't in this container
  * (JPEG/MP3/H.264) would slot in as extra [[sniffFormat]] branches.
  *
  * The 100 TB design: binary payloads stay columnar in Parquet, the
  * typed `Dataset[MediaRecord] → Dataset[MediaFeatures]` boundary runs
  * per-partition (`mapPartitions` — one iterator per task, payloads are
  * never collected to the driver), and downstream feature columns are
  * ordinary columns for the relational/similarity operators.
  */
object Multimodal {

  /** Build a mixed-kind media table over the fixture ids: REAL payload
    * bytes — PGM P5 images (doc_id%3=0), RIFF/WAVE PCM16 clips (=1),
    * YUV4MPEG2 videos (=2) — generated per partition from the same
    * deterministic closed forms the single-kind tables use
    * ([[pgmMediaTable]]/[[wavMediaTable]]/[[y4mMediaTable]] formulas),
    * so the DuckDB oracle can replay every downstream statistic without
    * parsing binary. Encoders are the spec-conformant ones below
    * (golden-vector spec-gated), so what flows is genuine media bytes. */
  def mediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        val (kind, fmt, payload) = (id % 3) match {
          case 0 =>
            val w = (id % 5 + 8).toInt
            val h = (id % 4 + 6).toInt
            val pix = Array.tabulate(w * h)(i =>
              ((id * 37 + i.toLong * 101) % 256).toInt)
            ("image", "pgm", Pgm.encodeP5(PgmImage(w, h, pix)))
          case 1 =>
            val n = (256 + (id % 7) * 64).toInt
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i.toLong * 17) % 2048) - 1024).toShort)
            ("audio", "wav", Wav.encode(WavClip(8000, samples)))
          case _ =>
            val nf = (4 + id % 4).toInt
            val frames = Array.tabulate(nf)(f =>
              Array.tabulate(48)(i =>
                (((id * 37 + (f / 3).toLong * 911 + i.toLong * 101) % 200)
                  + f % 3).toInt))
            ("video", "y4m", Y4m.encode(Y4mVideo(8, 6, frames)))
        }
        (id, kind, payload, fmt, payload.length.toLong, src)
      })
      .toDF("media_id", "kind", "payload", "format", "n_bytes", "source")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("format"), col("n_bytes"), col("source")).as("meta"))
  }

  /** Container sniffing by magic bytes — the dispatch step of a real
    * ingest (the `kind` metadata is advisory; bytes are the truth).
    * Throws on an unrecognized header, same error-as-exception policy
    * as the codec parsers (pipeline callers wrap with a try-gate). */
  def sniffFormat(bytes: Array[Byte]): String = {
    def ascii(n: Int) =
      new String(bytes, 0, math.min(n, bytes.length),
        java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length >= 2 && bytes(0) == 'P' &&
        (bytes(1) == '2' || bytes(1) == '5')) "pgm"
    else if (ascii(4) == "RIFF") "wav"
    else if (ascii(9) == "YUV4MPEG2") "y4m"
    else throw new IllegalArgumentException(
      s"unrecognized media container (header ${ascii(9)})")
  }

  /** REAL decode of one media record: sniff the container, parse with
    * the matching codec, reduce the decoded value stream (pixels / PCM
    * samples / luma planes across frames) to exact integer statistics
    * and a 4-bin histogram. Bins: pixels and luma quantize at value>>6
    * (domain 0..255), PCM16 at (v+32768)>>14 (domain -32768..32767).
    * Overflow headroom: v_sumsq <= 65025·n (pixels) or ~1.07e9·n (PCM),
    * so a Long holds exact sums past 1e12 pixels / 4e9 samples per
    * OBJECT — frame-level chunking applies long before any real media
    * object crosses that. */
  def decodeMedia(r: MediaRecord): MediaFeatures = sniffFormat(r.payload) match {
    case "pgm" =>
      val img = Pgm.decode(r.payload)
      statsRow(r, "pgm", img.width, img.height, 1, img.pixels, _ >> 6)
    case "wav" =>
      val c = Wav.decode(r.payload)
      statsRow(r, "wav", 0, 0, 0, c.samples.map(_.toInt),
        v => (v + 32768) >> 14)
    case "y4m" =>
      val v = Y4m.decode(r.payload)
      statsRow(r, "y4m", v.width, v.height, v.frames.length,
        v.frames.flatten, _ >> 6)
  }

  private def statsRow(r: MediaRecord, fmt: String, w: Int, h: Int,
      nf: Int, values: Array[Int], bin: Int => Int): MediaFeatures = {
    var vmin = Int.MaxValue; var vmax = Int.MinValue
    var sum = 0L; var sq = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      if (v < vmin) vmin = v
      if (v > vmax) vmax = v
      sum += v; sq += v.toLong * v
      hist(bin(v)) += 1L
      i += 1
    }
    if (values.isEmpty) { vmin = 0; vmax = 0 }
    val n = values.length.toLong
    MediaFeatures(r.media_id, r.kind, fmt, r.payload.length.toLong,
      w, h, nf, n, vmin, vmax, sum, sq,
      hist(0), hist(1), hist(2), hist(3),
      hist.map(c => if (n == 0) 0f else c.toFloat / n))
  }

  /** Per-partition decode + feature extraction — REAL codecs, see
    * [[decodeMedia]]. Partitioning is preserved; batch shape = one task
    * iterator (the Scala analogue of an Arrow-batch UDF: payload bytes
    * stream through the executor, never the driver). */
  def decodeFeatures(spark: SparkSession, ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions(_.map(decodeMedia))
  }

  /** Frame-sampling over REAL decoded media: one row per kept frame.
    * Videos yield every `stride`-th decoded luma plane; an image is its
    * single raster (frame 0); audio yields every `stride`-th 256-sample
    * window as 16-bit LE PCM bytes with width = samples-per-window and
    * height = 1 (the framing step a spectrogram/fingerprint pipeline
    * runs). The 1→N explode happens inside the executor task (flatMap
    * on the typed Dataset) — frames land as ordinary rows that
    * downstream resize / embed / dedup operators consume; nothing
    * widens on the driver. At 100 TB follow this with a repartition on
    * media_id only if a later stage needs co-located frames. */
  def sampleFrames(spark: SparkSession, ds: Dataset[MediaRecord],
      stride: Int = 4): Dataset[MediaFrame] = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    ds.flatMap { r =>
      sniffFormat(r.payload) match {
        case "pgm" =>
          val img = Pgm.decode(r.payload)
          Iterator.single(MediaFrame(r.media_id, 0, img.width, img.height,
            img.pixels.map(p => (p & 0xFF).toByte)))
        case "y4m" =>
          val v = Y4m.decode(r.payload)
          (0 until v.frames.length by stride).iterator.map(f =>
            MediaFrame(r.media_id, f, v.width, v.height,
              v.frames(f).map(p => (p & 0xFF).toByte)))
        case "wav" =>
          val c = Wav.decode(r.payload)
          val win = 256
          val nw = c.samples.length / win
          (0 until nw by stride).iterator.map { k =>
            val bb = java.nio.ByteBuffer.allocate(win * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var i = k * win
            val end = i + win
            while (i < end) { bb.putShort(c.samples(i)); i += 1 }
            MediaFrame(r.media_id, k, win, 1, bb.array())
          }
      }
    }
  }

  /** REAL nearest-neighbor resize on frame rasters — the byte-level
    * twin of [[Pgm.resizeNearest]]: output pixel (x, y) reads the
    * source pixel at the floor-scaled index, actual pixels move. A
    * narrow map — no shuffle, no driver involvement; output
    * width/height become plain filterable columns. (Audio window
    * "frames" passing through get byte-level decimation — resize is a
    * raster op; use [[resampleLinear]] for audio rate changes.) */
  def resizeFrames(spark: SparkSession, frames: Dataset[MediaFrame],
      targetW: Int, targetH: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "resize target must be positive")
    frames.map { fr =>
      val out = Array.tabulate(targetW * targetH) { j =>
        val x = j % targetW
        val y = j / targetW
        fr.frame(math.min(fr.height - 1, y * fr.height / targetH) * fr.width +
          math.min(fr.width - 1, x * fr.width / targetW))
      }
      MediaFrame(fr.media_id, fr.frame_idx, targetW, targetH, out)
    }
  }

  /** Convenience: documents fixture → typed media dataset. */
  def mediaDataset(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaTable(spark, docs).as[MediaRecord]
  }

  /** Exact integer stats per frame raster (unsigned byte view) — the
    * reduction that makes the decode→sample→resize chain oracle-
    * hashable end-to-end. Narrow map, no shuffle. */
  final case class FrameStats(media_id: Long, frame_idx: Int,
      width: Int, height: Int, b_min: Int, b_max: Int, b_sum: Long)

  def frameStats(spark: SparkSession, frames: Dataset[MediaFrame]): DataFrame = {
    import spark.implicits._
    frames.map { fr =>
      var mn = 255; var mx = 0; var sm = 0L
      var i = 0
      while (i < fr.frame.length) {
        val v = fr.frame(i) & 0xFF
        if (v < mn) mn = v
        if (v > mx) mx = v
        sm += v
        i += 1
      }
      if (fr.frame.isEmpty) { mn = 0; mx = 0 }
      FrameStats(fr.media_id, fr.frame_idx, fr.width, fr.height, mn, mx, sm)
    }.toDF()
  }

  /** Decoded PGM image: real pixels, not a stub. */
  final case class PgmImage(width: Int, height: Int, pixels: Array[Int])

  /** Per-image REAL decode features (see [[Pgm.decode]]). */
  final case class PgmFeatures(media_id: Long, width: Int, height: Int,
      n_pixels: Long, p_min: Int, p_max: Int, p_mean: Double,
      h0: Long, h1: Long, h2: Long, h3: Long)

  /** REAL image codec for the netpbm grayscale formats — P2 (ASCII) and
    * P5 (binary) PGM — written against the published spec, no libraries:
    * magic, whitespace/`#`-comment-tolerant header (width, height,
    * maxval), then the raster. This is NOT a stub: the decoder parses
    * actual image bytes, the resize below moves actual pixels.
    * Codec-class formats (JPEG/MP3/H.264) whose libraries aren't in
    * this container would land as additional sniffFormat branches. */
  object Pgm {
    def encodeP5(img: PgmImage): Array[Byte] = {
      val header = s"P5\n${img.width} ${img.height}\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      header ++ img.pixels.map(p => (p & 0xFF).toByte)
    }

    def encodeP2(img: PgmImage): Array[Byte] =
      (s"P2\n${img.width} ${img.height}\n255\n" + img.pixels.mkString(" "))
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    /** Parse P2/P5 bytes. Throws IllegalArgumentException on malformed
      * input — callers in pipelines wrap with a try-gate, same policy as
      * the JSON source's error-as-null discipline. */
    def decode(bytes: Array[Byte]): PgmImage = {
      var i = 0
      def skipWs(): Unit = {
        var in = true
        while (in && i < bytes.length) {
          val c = bytes(i).toChar
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c.isWhitespace) i += 1
          else in = false
        }
      }
      def token(): String = {
        skipWs()
        val s = i
        while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
        require(i > s, s"pgm: truncated header at byte $s")
        new String(bytes, s, i - s, java.nio.charset.StandardCharsets.US_ASCII)
      }
      val magic = token()
      require(magic == "P2" || magic == "P5", s"pgm: bad magic '$magic'")
      val (w, h, maxval) = (token().toInt, token().toInt, token().toInt)
      require(w > 0 && h > 0 && maxval > 0 && maxval <= 255,
        s"pgm: bad dimensions ${w}x$h maxval $maxval")
      // Long multiply: 65536x65536 would wrap w*h to 0 and "decode" a
      // zero-pixel image instead of throwing
      require(w.toLong * h <= Int.MaxValue, s"pgm: dimensions overflow ${w}x$h")
      val n = w * h
      val pixels =
        if (magic == "P2") Array.fill(n)(token().toInt)
        else {
          i += 1 // exactly ONE whitespace byte separates header and raster
          require(bytes.length - i >= n, "pgm: truncated P5 raster")
          Array.tabulate(n)(j => bytes(i + j) & 0xFF)
        }
      require(pixels.forall(p => p >= 0 && p <= maxval),
        "pgm: pixel out of range")
      PgmImage(w, h, pixels)
    }

    /** REAL nearest-neighbor resize on decoded pixels. */
    def resizeNearest(img: PgmImage, tw: Int, th: Int): PgmImage = {
      require(tw > 0 && th > 0, "resize target must be positive")
      val out = Array.tabulate(tw * th) { j =>
        val (x, y) = (j % tw, j / tw)
        img.pixels(math.min(img.height - 1, y * img.height / th) * img.width +
          math.min(img.width - 1, x * img.width / tw))
      }
      PgmImage(tw, th, out)
    }
  }

  /** Deterministic synthetic P2 payloads over the fixture ids — the same
    * arithmetic the DuckDB oracle uses to construct ITS payloads, so the
    * binary-level Scala parser and the oracle's string-level parse can be
    * compared end-to-end. W/H vary per id; pixel(i) = (id·37 + i·101) % 256. */
  def pgmMediaTable(docs: DataFrame): DataFrame = {
    val w = (col("media_id") % 5 + 8).cast("int")
    val h = (col("media_id") % 4 + 6).cast("int")
    val pixels = transform(sequence(lit(0), w * h - 1),
      i => pmod(col("media_id") * 37 + i * 101, lit(256)).cast("string"))
    docs.select(col("doc_id").as("media_id"))
      .select(col("media_id"),
        concat(lit("P2\n"), w.cast("string"), lit(" "), h.cast("string"),
          lit("\n255\n"), concat_ws(" ", pixels)).cast("binary").as("payload"))
  }

  private def imageStats(id: Long, img: PgmImage): PgmFeatures = {
    val n = img.pixels.length
    val hist = new Array[Long](4)
    img.pixels.foreach(p => hist(p >> 6) += 1L)
    PgmFeatures(id, img.width, img.height, n.toLong,
      img.pixels.min, img.pixels.max,
      img.pixels.map(_.toLong).sum.toDouble / n,
      hist(0), hist(1), hist(2), hist(3))
  }

  /** REAL decode + feature extraction over PGM payloads: parse the bytes
    * per partition (payloads never reach the driver), then per-image
    * stats — dimensions, min/max/mean, 4-bin histogram. The mean is the
    * single IEEE division of exact integer sums, so the whole row is
    * oracle-hashable. */
  def pgmFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        imageStats(id, Pgm.decode(bytes))
      })
      .toDF()
  }

  /** REAL decode → nearest-neighbor resize → stats: the whole image
    * kernel chain on actual pixels, per partition. Same output schema as
    * [[pgmFeatures]], post-resize. */
  def pgmResizeStats(spark: SparkSession, media: DataFrame,
      tw: Int, th: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        imageStats(id, Pgm.resizeNearest(Pgm.decode(bytes), tw, th))
      })
      .toDF()
  }

  /** dHash-style 56-bit perceptual hash on REAL pixels: NN-resize to an
    * 8×8 grid, then one bit per horizontal neighbor comparison
    * (7 per row × 8 rows). 56 bits — not the classic 9×8/64 — keeps the
    * hash strictly inside a non-negative BIGINT so the oracle can build
    * the identical value with `1::BIGINT << k` shifts and no sign edge. */
  def dHash56(img: PgmImage): Long = {
    val r = Pgm.resizeNearest(img, 8, 8)
    var h = 0L
    var k = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (r.pixels(y * 8 + x) > r.pixels(y * 8 + x + 1)) h |= 1L << k
        k += 1; x += 1
      }
      y += 1
    }
    h
  }

  /** Per-image perceptual hash: decode + hash per partition (payloads
    * never leave the executor task) → (media_id, phash). */
  def pgmPhash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, dHash56(Pgm.decode(bytes)))
      })
      .toDF("media_id", "phash")
  }

  /** Decoded WAV clip: real samples, not a stub. */
  final case class WavClip(sampleRate: Int, samples: Array[Short])

  /** Per-clip REAL decode features (see [[Wav.decode]]): exact integer
    * sums + one sqrt — the whole row oracle-hashable. */
  final case class WavFeatures(media_id: Long, n_samples: Long,
      sample_rate: Int, duration_ms: Long, peak: Int, zero_crossings: Long,
      sum_abs: Long, sum_sq: Long, rms: Double)

  /** REAL audio codec for canonical RIFF/WAVE PCM16 mono — written
    * against the published RIFF spec, no libraries: 12-byte RIFF header,
    * chunk walk (tolerating extra chunks before `data`), fmt validation
    * (PCM, 16-bit), little-endian sample extraction. NOT a stub: the
    * parser reads actual bytes (golden-vector spec-gated), the encoder
    * emits the canonical 44-byte-header file. Codec-class formats
    * (MP3/AAC) whose libraries aren't in this container would land as
    * additional sniffFormat branches. */
  object Wav {
    def encode(clip: WavClip): Array[Byte] = {
      val n = clip.samples.length
      val dataSize = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(36 + dataSize)
      bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(16)            // PCM fmt chunk size
      bb.putShort(1)           // audio format: PCM
      bb.putShort(1)           // channels: mono
      bb.putInt(clip.sampleRate)
      bb.putInt(clip.sampleRate * 2) // byte rate = rate * block align
      bb.putShort(2)           // block align = channels * 16/8
      bb.putShort(16)          // bits per sample
      bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(dataSize)
      clip.samples.foreach(bb.putShort)
      bb.array()
    }

    /** Parse RIFF/WAVE PCM16 mono bytes. Throws IllegalArgumentException
      * on malformed input — same error-as-exception policy as
      * [[Pgm.decode]], wrapped by pipeline callers. */
    def decode(bytes: Array[Byte]): WavClip = {
      require(bytes.length >= 12, "wav: truncated RIFF header")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); bb.get(b)
        new String(b, java.nio.charset.StandardCharsets.US_ASCII)
      }
      require(fourcc() == "RIFF", "wav: missing RIFF magic")
      bb.getInt // riff size (unchecked: streams may understate it)
      require(fourcc() == "WAVE", "wav: not a WAVE form")
      // chunk walk: fmt must precede data; skip unknown chunks (LIST,
      // fact, ...) like a real reader
      var rate = -1
      var samples: Array[Short] = null
      while (samples == null && bb.remaining() >= 8) {
        val id = fourcc()
        val size = bb.getInt
        require(size >= 0 && size <= bb.remaining(),
          s"wav: chunk '$id' overruns file")
        id match {
          case "fmt " =>
            require(size >= 16, "wav: fmt chunk too small")
            val fmtEnd = bb.position() + size
            require(bb.getShort == 1, "wav: not PCM")
            require(bb.getShort == 1, "wav: not mono")
            rate = bb.getInt
            require(rate > 0, "wav: bad sample rate")
            bb.getInt // byte rate
            bb.getShort // block align
            require(bb.getShort == 16, "wav: not 16-bit")
            bb.position(fmtEnd)
          case "data" =>
            require(rate > 0, "wav: data chunk before fmt")
            require(size % 2 == 0, "wav: odd PCM16 data size")
            samples = Array.fill(size / 2)(bb.getShort)
          case _ =>
            // unknown chunk: skip payload (+ pad byte when size is odd)
            bb.position(bb.position() + size + (size % 2))
        }
      }
      require(samples != null, "wav: no data chunk")
      WavClip(rate, samples)
    }
  }

  /** Deterministic synthetic PCM over the fixture ids, ENCODED AS REAL
    * WAV BYTES: n = 256 + (id mod 7)·64 samples at 8 kHz,
    * sample(i) = ((id·31 + i·17) mod 2048) − 1024. The DuckDB oracle
    * never parses the binary — it recomputes the statistics from this
    * closed form, so codec round-trip and arithmetic check each other
    * (spec conformance of the byte layout is golden-vector spec-gated). */
  def wavMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (256 + (id % 7) * 64).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 31 + i.toLong * 17) % 2048) - 1024).toShort)
        (id, Wav.encode(WavClip(8000, samples)))
      })
      .toDF("media_id", "payload")
  }

  /** REAL decode + audio stats over WAV payloads, per partition: peak,
    * zero-crossing count (sign change over consecutive samples, 0 counts
    * as non-negative), exact |x| and x² sums, RMS as the single sqrt of
    * an exact ratio. Payloads never reach the driver. */
  def wavFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val clip = Wav.decode(bytes)
        val s = clip.samples
        var sumAbs = 0L; var sumSq = 0L; var peak = 0; var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          sumAbs += a; sumSq += v.toLong * v
          if (a > peak) peak = a
          if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        val n = s.length.toLong
        WavFeatures(id, n, clip.sampleRate, n * 1000L / clip.sampleRate,
          peak, zc, sumAbs, sumSq,
          if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
      })
      .toDF()
  }

  /** REAL linear-interpolation resample in INTEGER arithmetic — the
    * audio twin of [[Pgm.resizeNearest]]: output j maps to the exact
    * rational source position j·srcRate/targetRate; the interpolated
    * value is (s[k]·(R−f) + s[k+1]·f) quot R with R = targetRate and
    * f the position's fractional numerator. No floats anywhere, so the
    * kernel is bit-reproducible and the oracle replays it as plain
    * SQL integer arithmetic (both sides truncate toward zero). */
  def resampleLinear(clip: WavClip, targetRate: Int): WavClip = {
    require(targetRate > 0, "resample target rate must be positive")
    val s = clip.samples
    val n = s.length
    val m = (n.toLong * targetRate / clip.sampleRate).toInt
    val out = new Array[Short](m)
    var j = 0
    while (j < m) {
      val num = j.toLong * clip.sampleRate
      val k = (num / targetRate).toInt
      val f = num % targetRate
      val a = s(k).toLong
      val b = s(math.min(k + 1, n - 1)).toLong
      out(j) = ((a * (targetRate - f) + b * f) / targetRate).toShort
      j += 1
    }
    WavClip(targetRate, out)
  }

  /** decode → integer-exact resample → stats: the full audio kernel
    * chain on real bytes, per partition; same schema as [[wavFeatures]]. */
  def wavResampleStats(spark: SparkSession, media: DataFrame,
      targetRate: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val clip = resampleLinear(Wav.decode(bytes), targetRate)
        val s = clip.samples
        var sumAbs = 0L; var sumSq = 0L; var peak = 0; var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          sumAbs += a; sumSq += v.toLong * v
          if (a > peak) peak = a
          if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        val n = s.length.toLong
        WavFeatures(id, n, clip.sampleRate,
          if (clip.sampleRate == 0) 0L else n * 1000L / clip.sampleRate,
          peak, zc, sumAbs, sumSq,
          if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
      })
      .toDF()
  }

  /** Integer "energy-delta" acoustic fingerprint — the audio twin of
    * [[dHash56]]: frame the clip (`frame` samples per frame, tail
    * dropped), per-frame energy as an EXACT long Σv², one bit per
    * consecutive-frame comparison (energy rising = 1). Robust to uniform
    * gain-free copies, fully integer → bit-reproducible and
    * SQL-replayable. Returns (n_frames, fp). */
  def audioFingerprint(clip: WavClip, frame: Int = 32): (Int, Long) = {
    require(frame > 0, "frame must be positive")
    val s = clip.samples
    val nf = s.length / frame
    val e = new Array[Long](nf)
    var k = 0
    while (k < nf) {
      var acc = 0L; var i = k * frame
      val end = i + frame
      while (i < end) { val v = s(i).toLong; acc += v * v; i += 1 }
      e(k) = acc; k += 1
    }
    var fp = 0L
    k = 0
    while (k < nf - 1) { if (e(k + 1) > e(k)) fp |= 1L << k; k += 1 }
    (nf, fp)
  }

  /** Per-clip acoustic fingerprints: decode + fingerprint per partition
    * → (media_id, n_frames, fp). */
  def wavFingerprints(spark: SparkSession, media: DataFrame,
      frame: Int = 32): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (nf, fp) = audioFingerprint(Wav.decode(bytes), frame)
        (id, nf, fp)
      })
      .toDF("media_id", "n_frames", "fp")
  }

  /** Audio dedup CANDIDATE pairs: fingerprint-equality collisions over
    * `media` — (i, j, fp) with i < j, one row per colliding pair, the
    * exact result set of a self equi-join on (n_frames, fp). Built as a
    * bounded posting list instead of that self-join (r15, guide §2/§6):
    * the join shape consumed the fingerprint frame twice, so the
    * dominant per-row cost — WAV decode + energy fingerprint — ran
    * TWICE over the corpus, plus a two-sided join shuffle; the posting
    * build decodes once (Posting.bounded pins the tiny fp rows for its
    * two passes), shuffles once on the collision key, and emits pairs
    * in-task. `maxBucket` is the 100 TB fat-bucket valve (planted exact
    * copies make collision buckets grow with the corpus); Posting's
    * split-don't-drop keeps the pair set identical to the uncapped
    * join, and [[Posting.owns]] keeps emission exactly-once. */
  def wavFpPairs(spark: SparkSession, media: DataFrame, frame: Int = 32,
      maxBucket: Int = 4096): DataFrame = {
    val rows = wavFingerprints(spark, media, frame)
      .select(col("n_frames"), col("fp"),
        struct(col("media_id")).as("m"))
    Posting.streamPairs(
        Posting.bounded(rows, Seq("n_frames", "fp"), "m", maxBucket)
          .transform(graft.Tables.fanout))
      .filter(Posting.owns(col("a"), col("b")))
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"),
        col("fp"))
  }

  /** PLANTED wav corpus: the fixture clips plus exact re-encoded copies
    * of every 25th id (+200000) — the sample formula keys on
    * media_id mod 200000, so a copy is bit-identical audio under a new
    * id. Drives the fingerprint-collision dedup query. */
  def plantedWavMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val ids = docs.select(col("doc_id").as("media_id"))
      .unionByName(docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000).as("media_id")))
    ids.as[Long].mapPartitions(_.map { id =>
      val base = id % 200000
      val n = (256 + (base % 7) * 64).toInt
      val samples = Array.tabulate(n)(i =>
        (((base * 31 + i.toLong * 17) % 2048) - 1024).toShort)
      (id, Wav.encode(WavClip(8000, samples)))
    }).toDF("media_id", "payload")
  }

  /** Decoded Y4M video: luma planes only (chroma is validated and
    * consumed by the parser but not retained — every op here is
    * luma-based, the standard shortcut for cut detection). */
  final case class Y4mVideo(width: Int, height: Int,
      frames: Array[Array[Int]])

  /** Per-video scene-cut readout (exact integers throughout). */
  final case class Y4mCuts(media_id: Long, width: Int, height: Int,
      n_frames: Int, n_cuts: Long, cut_idx_sum: Long, sad_total: Long)

  /** REAL video container codec for YUV4MPEG2 (the uncompressed
    * interchange format every ffmpeg pipeline can emit) — written
    * against the published format, no libraries: space-separated header
    * tags (W/H required, C420 family enforced, unknown tags skipped like
    * a real reader), then per frame a `FRAME` line with optional
    * parameters and raw planar 4:2:0 — Y plane kept, U/V validated for
    * length and consumed. NOT a stub; golden-vector spec-gated. */
  object Y4m {
    def encode(v: Y4mVideo): Array[Byte] = {
      val cw = v.width / 2
      val ch = v.height / 2
      val header = s"YUV4MPEG2 W${v.width} H${v.height} F25:1 Ip A1:1 C420jpeg\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new java.io.ByteArrayOutputStream()
      out.write(header, 0, header.length)
      v.frames.foreach { y =>
        val fh = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        out.write(fh, 0, fh.length)
        y.foreach(p => out.write(p & 0xFF))
        // flat mid-gray chroma
        (0 until 2 * cw * ch).foreach(_ => out.write(128))
      }
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Y4mVideo = {
      var i = 0
      def line(): String = {
        val s = i
        while (i < bytes.length && bytes(i) != '\n') i += 1
        require(i < bytes.length, "y4m: unterminated line")
        i += 1
        new String(bytes, s, i - 1 - s, java.nio.charset.StandardCharsets.US_ASCII)
      }
      val header = line()
      val tags = header.split(" ")
      require(tags.headOption.contains("YUV4MPEG2"), "y4m: bad magic")
      var w = -1; var h = -1; var colorspace = "C420jpeg" // spec default 4:2:0
      tags.drop(1).foreach {
        case t if t.startsWith("W") => w = t.drop(1).toInt
        case t if t.startsWith("H") => h = t.drop(1).toInt
        case t if t.startsWith("C") => colorspace = t
        case _ => // F/I/A/X...: irrelevant to plane layout, skip
      }
      require(w > 0 && h > 0, s"y4m: missing/bad dimensions ${w}x$h")
      require(w % 2 == 0 && h % 2 == 0, "y4m: 4:2:0 needs even dimensions")
      require(colorspace.startsWith("C420"),
        s"y4m: unsupported colorspace $colorspace")
      val ySize = w * h
      val cSize = (w / 2) * (h / 2)
      val frames = Array.newBuilder[Array[Int]]
      while (i < bytes.length) {
        val fl = line()
        require(fl == "FRAME" || fl.startsWith("FRAME "),
          s"y4m: expected FRAME, got '$fl'")
        require(bytes.length - i >= ySize + 2 * cSize, "y4m: truncated frame")
        frames += Array.tabulate(ySize)(j => bytes(i + j) & 0xFF)
        i += ySize + 2 * cSize
      }
      Y4mVideo(w, h, frames.result())
    }
  }

  /** Deterministic synthetic videos over the fixture ids, ENCODED AS
    * REAL Y4M BYTES: 8×6 luma, 4 + (id mod 4) frames, a scene change
    * every 3 frames. y(f, i) = ((id·37 + (f quot 3)·911 + i·101) mod
    * 200) + (f mod 3): inside a scene consecutive frames differ by
    * EXACTLY +1 per pixel (SAD = 48 — no mod wraparound by
    * construction), across a scene boundary every pixel moves by 89 or
    * 111 (SAD ≥ 4272), so the threshold can't false-fire either way. */
  def y4mMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val nf = (4 + id % 4).toInt
        val frames = Array.tabulate(nf)(f =>
          Array.tabulate(48)(i =>
            (((id * 37 + (f / 3).toLong * 911 + i.toLong * 101) % 200)
              + f % 3).toInt))
        (id, Y4m.encode(Y4mVideo(8, 6, frames)))
      })
      .toDF("media_id", "payload")
  }

  /** REAL decode → scene-cut detection over Y4M payloads, per
    * partition: consecutive-frame sum of absolute luma differences
    * (SAD), cut where SAD > width·height·16 — the shot-boundary pass a
    * video curation pipeline runs before frame sampling (sample per
    * scene, not per fixed stride). All integers; payloads never reach
    * the driver. */
  def y4mSceneCuts(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val v = Y4m.decode(bytes)
        val threshold = v.width * v.height * 16
        var nCuts = 0L; var cutIdxSum = 0L; var sadTotal = 0L
        var f = 1
        while (f < v.frames.length) {
          val (a, b) = (v.frames(f - 1), v.frames(f))
          var sad = 0L; var i = 0
          while (i < a.length) { sad += math.abs(b(i) - a(i)); i += 1 }
          sadTotal += sad
          if (sad > threshold) { nCuts += 1; cutIdxSum += f }
          f += 1
        }
        Y4mCuts(id, v.width, v.height, v.frames.length,
          nCuts, cutIdxSum, sadTotal)
      })
      .toDF()
  }

  /** One kept frame per detected scene. */
  final case class SceneFrame(media_id: Long, scene_idx: Int,
      frame_idx: Int, y_sum: Long, y_min: Int, y_max: Int)

  /** Scene-aware frame sampling — the step AFTER cut detection: keep
    * the FIRST frame of every scene (frame 0 plus each cut frame), so a
    * 10-minute static shot contributes one frame instead of stride/N
    * near-duplicates. Scenes come from the REAL SAD detector over
    * decoded frames (not from any prior knowledge of the content);
    * per-frame luma stats are exact integers. */
  def y4mSceneFrames(spark: SparkSession, media: DataFrame): Dataset[SceneFrame] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val v = Y4m.decode(bytes)
        val threshold = v.width * v.height * 16
        val keep = Seq.newBuilder[Int]
        if (v.frames.nonEmpty) keep += 0
        var f = 1
        while (f < v.frames.length) {
          val (a, b) = (v.frames(f - 1), v.frames(f))
          var sad = 0L; var i = 0
          while (i < a.length) { sad += math.abs(b(i) - a(i)); i += 1 }
          if (sad > threshold) keep += f
          f += 1
        }
        keep.result().zipWithIndex.map { case (fi, si) =>
          val y = v.frames(fi)
          SceneFrame(id, si, fi, y.map(_.toLong).sum, y.min, y.max)
        }
      })
  }

  /** Image near-dup pairs at Hamming distance ≤ `maxDist` over the
    * perceptual hash — the visual twin of simhash text dedup, and EXACT
    * for maxDist ≤ 3 by pigeonhole: the 56-bit hash splits into four
    * 14-bit chunks, and any pair within distance 3 must agree on at
    * least one chunk, so blocking on (chunk_idx, chunk_value) loses
    * nothing. Pipeline is the standard posting-list shape (no self-join,
    * no cartesian): explode 4 chunk rows per image → group to posting
    * lists → emit ordered pairs IN the task → distance filter AT
    * emission → first-agreeing-chunk ownership so every pair is emitted
    * exactly once (no distinct).
    *
    * `maxBucket` is the 100 TB fat-bucket valve (a flat-color meme
    * template shared by millions of images = one degenerate posting
    * list): fat postings SPLIT into bounded sub-postings BEFORE the
    * collect via [[Posting.bounded]] — no aggregation buffer ever holds
    * more than ~maxBucket members, and [[Posting.owns]] keeps the pair
    * set IDENTICAL to the uncapped run (split, not drop). The Hamming
    * filter runs AT EMISSION, so rejected candidates cost one
    * xor+popcount and never allocate a row.
    * Returns (i, j, dist), i < j. */
  def phashPairs(spark: SparkSession, media: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 4096): DataFrame = {
    require(maxDist <= 3, s"pigeonhole exactness needs maxDist <= 3, got $maxDist")
    val hashes = pgmPhash(spark, media)
    val rows = hashes
      .select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(lit): _*)).as("c"))
      .withColumn("chunk",
        expr("shiftright(phash, c * 14) & 16383"))
      .select(col("c"), col("chunk"),
        struct(col("media_id"), col("phash")).as("m"))
    // First-agreeing-chunk ownership (r15, guide §2.4 — distinct on
    // already-unique data): a pair within distance `maxDist` agrees on
    // >= 1 of the 4 chunks and is bucketed once PER agreeing chunk;
    // owning it to the LOWEST agreeing chunk makes emission globally
    // exactly-once, so the cross-chunk `.distinct()` — a full shuffle
    // of the (inherently quadratic) pair set, with dist-0 pairs emitted
    // 4x — disappears. Chunk agreement is exact bit arithmetic on the
    // xor (the bucket key IS the chunk value), so ownership is provably
    // the bucket-collision predicate, not an approximation of it.
    val x = col("a.phash").bitwiseXOR(col("b.phash"))
    def chunkAgrees(cp: Int): Column =
      shiftright(x, cp * 14).bitwiseAND(lit(16383L)) === 0L
    val firstAgreeingChunk =
      when(chunkAgrees(0), 0).when(chunkAgrees(1), 1)
        .when(chunkAgrees(2), 2).otherwise(3)
    Posting.streamPairs(
        Posting.bounded(rows, Seq("c", "chunk"), "m", maxBucket)
          .transform(graft.Tables.fanout))
      .filter(Posting.owns(col("a"), col("b")) &&
        bit_count(x) <= maxDist && col("c") === firstAgreeingChunk)
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"),
        bit_count(x).cast("int").as("dist"))
  }
}
