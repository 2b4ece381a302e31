package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as `mapPartitions` stages
  * (the Scala analogue of Pandas-UDF-over-mapInPandas: per-partition batch
  * processing with an explicit output schema, so Spark plans them as a
  * single narrow stage — no shuffle, no driver round-trip).
  *
  * The codec layer is pluggable ([[Multimodal.MediaCodec]]):
  *  - [[Multimodal.ImageCodec]] is REAL for images — `javax.imageio`
  *    (shipped with every JDK) sniffs PNG/JPEG/GIF/BMP magic bytes,
  *    header-probes dimensions without a full pixel decode, decodes
  *    pixels, and resizes via `BufferedImage`+`Graphics2D`.
  *  - [[Multimodal.WavCodec]] is REAL for audio — `javax.sound.sampled`
  *    (also in the JDK) parses WAV/AIFF/AU headers and decodes PCM for
  *    waveform features; [[Multimodal.JdkAvCodec]] routes images + audio
  *    to the real codecs in one `MediaCodec`.
  *  - Only VIDEO remains stubbed — the JDK ships no video codec.
  *  - [[Multimodal.DeterministicFakeCodec]] derives everything from raw
  *    bytes deterministically — the stand-in for encoders that need
  *    external model runtimes (and the historical default, so metadata
  *    stays stable for payloads that are not real media).
  */
object Multimodal {

  /** The pluggable codec boundary: everything the mapPartitions stages
    * need from a media implementation. Implementations must be
    * serializable (they ride task closures). */
  trait MediaCodec extends Serializable {
    def name: String
    def sniffMime(payload: Array[Byte]): String
    /** (width, height), or (-1, -1) when the payload is not decodable. */
    def probeDimensions(payload: Array[Byte]): (Int, Int)
    /** Media duration for the meta struct. Default: the historical
      * byte-length convention; codecs with real timing (audio) override. */
    def durationMs(payload: Array[Byte]): Long =
      if (payload == null) 0L else payload.length.toLong
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(payload: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]]
    def featuresBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
    def features(payload: Array[Byte]): Array[Float]
  }

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** A media table schema: id + opaque payload + typed metadata. */
  def mediaSchema(idType: DataType = LongType): StructType = StructType(Seq(
    StructField("media_id", idType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** The stub codec: everything derived deterministically from payload
    * bytes, so tests are stable. Use [[ImageCodec]] for real image
    * decode; this remains the stand-in for audio/video and for encoder
    * models (??? marks the steps that need an external runtime). */
  object DeterministicFakeCodec extends MediaCodec {
    val name = "stub"
    def sniffMime(payload: Array[Byte]): String =
      if (payload == null || payload.isEmpty) "application/octet-stream"
      else payload(0) & 0x3 match {
        case 0 => "image/jpeg"
        case 1 => "image/png"
        case 2 => "audio/wav"
        case _ => "video/mp4"
      }

    /** REAL IMPL WOULD: decode the image header. Stub: dimensions from the
      * first 8 payload bytes read as two big-endian uint32s (decode step
      * intentionally not implemented: ???). */
    def probeDimensions(payload: Array[Byte]): (Int, Int) = {
      if (payload == null || payload.length < 8) return (64, 64)
      def be32(o: Int): Long =
        ((payload(o) & 0xFFL) << 24) | ((payload(o + 1) & 0xFFL) << 16) |
          ((payload(o + 2) & 0xFFL) << 8) | (payload(o + 3) & 0xFFL)
      ((64 + be32(0) % 1024).toInt, (64 + be32(4) % 1024).toInt)
    }

    /** REAL IMPL WOULD: resample pixels. Stub: truncate/pad bytes to a
      * deterministic size proportional to the target area. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(16, (w * h) / 64)
      java.util.Arrays.copyOf(payload, target)
    }

    /** REAL IMPL WOULD: decode frames at `everyMs` intervals. Stub: slice
      * the payload into frame-sized chunks. */
    def sampleFrames(payload: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]] = {
      val n = math.max(1, (durationMs / math.max(1, everyMs)).toInt).min(16)
      val sz = math.max(1, payload.length / n)
      (0 until n).map(i => java.util.Arrays.copyOfRange(
        payload, i * sz, math.min(payload.length, (i + 1) * sz)))
    }

    /** Batch entry point a real encoder would implement (one model call
      * per batch). Stub: per-item features. */
    def featuresBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map(features)

    /** REAL IMPL WOULD: run a vision/audio encoder. Stub: a deterministic
      * 16-dim feature vector from byte statistics. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](16)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          out(i % 16) += (payload(i) & 0xFF) / 255.0f
          i += 1
        }
        val n = math.max(1, payload.length / 16)
        (0 until 16).foreach(j => out(j) /= n.toFloat)
      }
      out
    }
  }

  /** REAL image codec on the JDK's own `javax.imageio` — no external
    * dependency. Sniffs magic bytes (PNG/JPEG/GIF/BMP), header-probes
    * dimensions WITHOUT a full pixel decode (`ImageReader.getWidth(0)`
    * reads only the header), decodes pixels, and resizes with
    * `BufferedImage` + `Graphics2D` (bilinear), re-encoding PNG
    * (lossless, so solid-color fidelity is exact). Audio is real too —
    * via [[WavCodec]] (`javax.sound.sampled`); only VIDEO frame
    * sampling delegates to [[DeterministicFakeCodec]] — the JDK ships no
    * video codec, and that boundary stays honestly stubbed.
    * Features for decodable images are REAL pixel statistics (per-channel
    * means + a 12-bin luma histogram — signal processing, not a learned
    * embedding); non-images fall back to the stub's byte statistics.
    *
    * Thread safety: every call builds its own reader/stream (ImageIO's
    * static reader registry is thread-safe for lookup); the disk-backed
    * stream cache is disabled once per JVM (executor temp dirs + an extra
    * fsync per decode otherwise). */
  object ImageCodec extends MediaCodec {
    val name = "imageio"

    // ImageIO.setUseCache is a JVM-global toggle; idempotent, do it once
    // per executor JVM on first use
    @transient private lazy val init: Unit = javax.imageio.ImageIO.setUseCache(false)

    def sniffMime(payload: Array[Byte]): String = {
      if (payload == null || payload.length < 8) return "application/octet-stream"
      def u(i: Int): Int = payload(i) & 0xFF
      if (u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
          u(4) == 0x0D && u(5) == 0x0A && u(6) == 0x1A && u(7) == 0x0A) "image/png"
      else if (u(0) == 0xFF && u(1) == 0xD8 && u(2) == 0xFF) "image/jpeg"
      else if (u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8' &&
          (u(4) == '7' || u(4) == '9') && u(5) == 'a') "image/gif"
      else if (u(0) == 'B' && u(1) == 'M') "image/bmp"
      else "application/octet-stream"
    }

    /** Header-only dimension probe: grabs the format's ImageReader and asks
      * for width/height of image 0 — readers parse just the header for
      * this, so probing a 10 MB JPEG costs a few hundred bytes of I/O. */
    def probeDimensions(payload: Array[Byte]): (Int, Int) = {
      init
      if (sniffMime(payload) == "application/octet-stream") return (-1, -1)
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) return (-1, -1)
        val r = readers.next()
        try { r.setInput(in); (r.getWidth(0), r.getHeight(0)) }
        finally r.dispose()
      } catch {
        // NonFatal, not just IOException: JDK readers throw
        // ArrayIndexOutOfBounds/NegativeArraySize/IllegalArgument on
        // malformed GIF LZW / PNG chunk data — a corrupt web-corpus row
        // must degrade to "not decodable", never fail the task
        case scala.util.control.NonFatal(_) => (-1, -1)
      }
      finally in.close()
    }

    /** Full pixel decode; null when the payload is not a decodable image. */
    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      init
      if (payload == null) return null
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    }

    /** Lossless PNG encode. */
    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      init
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Synthesize a solid-color PNG — deterministic real bytes for tests
      * and oracle-gated queries. */
    def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      encodePng(img)
    }

    /** Real resample for decodable images (bilinear `Graphics2D`,
      * re-encoded PNG); non-image payloads pass through UNCHANGED — in a
      * mixed media table, image resize is a no-op for audio/video rows. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = decode(payload)
      if (src == null) return payload
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      encodePng(dst)
    }

    /** Video stays stubbed — no JDK video codec. */
    def sampleFrames(payload: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]] =
      DeterministicFakeCodec.sampleFrames(payload, everyMs, durationMs)

    def featuresBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map(features)

    /** Real pixel statistics for images: [meanR, meanG, meanB, meanLuma,
      * 12-bin luma histogram (mass)] = 16 dims, matching the stub's
      * dimensionality so downstream schemas are codec-independent. */
    def features(payload: Array[Byte]): Array[Float] = {
      val img = decode(payload)
      if (img == null) return DeterministicFakeCodec.features(payload)
      val out = new Array[Float](16)
      val w = img.getWidth; val h = img.getHeight
      val n = math.max(1, w * h).toFloat
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          val luma = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
          out(0) += r / 255.0f; out(1) += g / 255.0f; out(2) += b / 255.0f
          out(3) += luma
          out(4 + math.min(11, (luma * 12).toInt)) += 1.0f
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < 16) { out(i) /= n; i += 1 }
      out
    }

    /** 64-bit perceptual difference hash (dHash): decode → 9×8 bilinear
      * downscale (skipped when the image is already 9×8 — the identity
      * fast path keeps the hash an exact function of the pixels there) →
      * integer luma `(77r + 150g + 29b) >> 8` (256-weight sum, so a
      * grayscale pixel's luma is exactly its value) → bit `y*8+x` set iff
      * `luma(x+1,y) > luma(x,y)`. Robust to re-encoding and uniform
      * brightness shifts; Hamming distance between hashes is the standard
      * image near-dup metric. Undecodable payloads hash to 0. */
    def dHash64(payload: Array[Byte]): Long = {
      val src = decode(payload)
      if (src == null) return 0L
      val img =
        if (src.getWidth == 9 && src.getHeight == 8) src
        else decode(resize(payload, 9, 8))
      if (img == null) return 0L
      var fp = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        var prev = luma8(img.getRGB(0, y))
        while (x < 8) {
          val cur = luma8(img.getRGB(x + 1, y))
          if (cur > prev) fp |= 1L << (y * 8 + x)
          prev = cur
          x += 1
        }
        y += 1
      }
      fp
    }

    private def luma8(rgb: Int): Int = {
      val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
      (77 * r + 150 * g + 29 * b) >> 8
    }
  }

  /** REAL audio codec on the JDK's own `javax.sound.sampled` (WAV/AIFF/AU
    * ship with every JDK — only video has no platform codec). Header
    * probe yields sample rate / channels / frame count (duration) without
    * decoding samples; PCM decode yields the real waveform for
    * signal-processing features (per-window RMS energy). Corrupt payloads
    * degrade to sentinels, never fail the task. */
  object WavCodec {
    val name = "javax.sound"

    def sniffMime(payload: Array[Byte]): String = {
      if (payload == null || payload.length < 12) return "application/octet-stream"
      def s4(o: Int) = new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (s4(0) == "RIFF" && s4(8) == "WAVE") "audio/wav"
      else if (s4(0) == "FORM" && (s4(8) == "AIFF" || s4(8) == "AIFC")) "audio/aiff"
      else if (s4(0) == ".snd") "audio/basic"
      else "application/octet-stream"
    }

    /** (duration_ms, sample_rate_hz, channels), or (-1, -1, -1) when not
      * parseable. Header-only — no sample decode. */
    def probe(payload: Array[Byte]): (Long, Int, Int) = {
      if (payload == null) return (-1L, -1, -1)
      try {
        val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ff.getFormat
        val frames = ff.getFrameLength
        val rate = fmt.getSampleRate
        val dur = if (frames >= 0 && rate > 0) (frames * 1000.0 / rate).toLong else -1L
        (dur, rate.toInt, fmt.getChannels)
      } catch { case scala.util.control.NonFatal(_) => (-1L, -1, -1) }
    }

    /** Decode to normalized mono double samples in [-1, 1] (PCM16
      * little-endian path; multi-channel averages channels). Null when
      * not decodable. */
    def decodeSamples(payload: Array[Byte]): Array[Double] = {
      if (payload == null) return null
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            return null // scope: PCM16 signed, the canonical WAV layout
          val raw = in.readAllBytes()
          val ch = fmt.getChannels
          val be = fmt.isBigEndian
          val n = raw.length / (2 * ch)
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              val v = if (be) ((raw(o) << 8) | (raw(o + 1) & 0xFF)).toShort
                      else ((raw(o + 1) << 8) | (raw(o) & 0xFF)).toShort
              acc += v / 32768.0
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          out
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => null }
    }

    /** REAL waveform feature: RMS energy per fixed window of samples —
      * signal processing over the decoded PCM, not byte statistics. */
    def rmsWindows(payload: Array[Byte], windowSamples: Int): Array[Double] = {
      val s = decodeSamples(payload)
      if (s == null || windowSamples < 1) return Array.empty
      val nw = (s.length + windowSamples - 1) / windowSamples
      val out = new Array[Double](nw)
      var w = 0
      while (w < nw) {
        val start = w * windowSamples
        val end = math.min(s.length, start + windowSamples)
        var acc = 0.0
        var i = start
        while (i < end) { acc += s(i) * s(i); i += 1 }
        out(w) = math.sqrt(acc / math.max(1, end - start))
        w += 1
      }
      out
    }

    /** Synthesize a PCM16 mono WAV — real RIFF bytes, fully
      * deterministic (44-byte canonical header + little-endian samples).
      * `sample(i)` returns the 16-bit amplitude for frame i. */
    /** 64-bit audio fingerprint (chromaprint-lite): RMS energy over
      * consecutive `windowSamples`-sample windows, bit `i` set iff
      * `rms(i+1) > rms(i)` over the first 65 windows (missing windows are
      * silence). Robust to uniform gain changes being monotone; Hamming
      * distance between fingerprints is the near-dup metric, served by
      * the same chunk-blocked pair machinery as text simhash and image
      * dHash. For PCM16 square waves of per-window amplitude A the RMS is
      * exactly A/32768 (power-of-two denominator), so the bits are exact
      * integer comparisons an external oracle can replay. Undecodable
      * payloads fingerprint to 0. */
    def audioFingerprint64(payload: Array[Byte], windowSamples: Int): Long = {
      val rms = rmsWindows(payload, windowSamples)
      if (rms.isEmpty) return 0L
      def at(i: Int): Double = if (i < rms.length) rms(i) else 0.0
      var fp = 0L
      var i = 0
      while (i < 64) {
        if (at(i + 1) > at(i)) fp |= 1L << i
        i += 1
      }
      fp
    }

    def synthesizeWav(nSamples: Int, sampleRate: Int)(sample: Int => Short): Array[Byte] = {
      val dataLen = nSamples * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) { buf.putShort(sample(i)); i += 1 }
      buf.array()
    }
  }

  /** REAL video container parsing — pure-JDK RIFF/AVI reader for
    * UNCOMPRESSED (BI_RGB "DIB") video streams. AVI is the RIFF sibling
    * of WAV: `LIST hdrl` carries the `avih` main header
    * (µs-per-frame, frame count, dimensions), `LIST movi` carries one
    * `00db`/`00dc` chunk per frame. For BI_RGB the frame chunk is the
    * raw bottom-up BGR24 bitmap (rows padded to 4 bytes) — decoding it
    * is arithmetic, no codec needed, so frame sampling and pixel
    * statistics are REAL for this format. Motion-JPEG AVIs (`MJPG`
    * streams whose `00dc` chunks are self-contained JFIF JPEGs) decode
    * REAL too — per-frame `javax.imageio` ([[frameMeanRgb]]); MJPG
    * streams relying on OpenDML implicit Huffman tables may not decode.
    * Other compressed video (H.264, VP9, …) is where the JDK ships no
    * decoder; [[JdkAvCodec.sampleFrames]] handles AVI here and keeps the
    * documented stub for everything else. Corrupt payloads degrade to
    * sentinels/empty, never fail the task. */
  object AviCodec {
    val name = "riff-avi"

    def sniffMime(payload: Array[Byte]): String = {
      if (payload == null || payload.length < 12) return "application/octet-stream"
      def s4(o: Int) = new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (s4(0) == "RIFF" && s4(8) == "AVI ") "video/x-msvideo"
      else "application/octet-stream"
    }

    private def le32(p: Array[Byte], o: Int): Long =
      (p(o) & 0xFFL) | ((p(o + 1) & 0xFFL) << 8) |
        ((p(o + 2) & 0xFFL) << 16) | ((p(o + 3) & 0xFFL) << 24)

    /** Parsed container: (usPerFrame, totalFrames, width, height,
      * frame chunk [offset, length) pairs in stream order). */
    private[graft] case class Avi(usPerFrame: Long, totalFrames: Long,
      width: Int, height: Int, frames: IndexedSeq[(Int, Int)])

    /** Single sequential chunk walk; None when not a parseable AVI. */
    private[graft] def parse(payload: Array[Byte]): Option[Avi] = {
      if (sniffMime(payload) != "video/x-msvideo") return None
      try {
        var usPerFrame = -1L; var total = -1L; var w = -1; var h = -1
        val frames = IndexedSeq.newBuilder[(Int, Int)]
        def s4(o: Int) = new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        def walk(from: Int, until: Int): Unit = {
          var o = from
          while (o + 8 <= until) {
            val id = s4(o)
            val sz = le32(payload, o + 4).toInt
            val body = o + 8
            if (sz < 0 || body + sz > until) return // truncated — keep what we have
            if (id == "LIST" && sz >= 4) {
              val lt = s4(body)
              if (lt == "hdrl" || lt == "strl" || lt == "movi")
                walk(body + 4, body + sz)
            } else if (id == "avih" && sz >= 40) {
              usPerFrame = le32(payload, body)
              total = le32(payload, body + 16)
              w = le32(payload, body + 32).toInt
              h = le32(payload, body + 36).toInt
            } else if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc"))) {
              frames += ((body, sz))
            }
            o = body + sz + (sz & 1) // chunks are word-aligned
          }
        }
        walk(12, payload.length)
        if (usPerFrame <= 0 || w <= 0 || h <= 0) None
        else Some(Avi(usPerFrame, total, w, h, frames.result()))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    def probeDimensions(payload: Array[Byte]): (Int, Int) =
      parse(payload).map(a => (a.width, a.height)).getOrElse((-1, -1))

    def durationMs(payload: Array[Byte]): Long =
      parse(payload).map(a => a.frames.length * a.usPerFrame / 1000L).getOrElse(-1L)

    /** Frames nearest the `everyMs` sampling instants (t = 0, everyMs, …
      * while t < duration): idx = t / framePeriod, deduplicated. Returns
      * the raw frame chunk bytes (BI_RGB: bottom-up BGR24). */
    def sampleFrames(payload: Array[Byte], everyMs: Long): Seq[(Int, Array[Byte])] =
      parse(payload) match {
        case None => Seq.empty
        case Some(a) =>
          val periodMs = math.max(1L, a.usPerFrame / 1000L)
          val durMs = a.frames.length * periodMs
          val idxs = Iterator.iterate(0L)(_ + math.max(1L, everyMs))
            .takeWhile(_ < durMs)
            .map(t => (t / periodMs).toInt)
            .filter(_ < a.frames.length)
            .toIndexedSeq.distinct
          idxs.map { i =>
            val (o, sz) = a.frames(i)
            (i, java.util.Arrays.copyOfRange(payload, o, o + sz))
          }
      }

    /** Exact (meanR, meanG, meanB) of a BI_RGB frame chunk: bottom-up
      * BGR24 rows padded to 4-byte boundaries. None on size mismatch. */
    def dibMeanRgb(frame: Array[Byte], w: Int, h: Int): Option[(Double, Double, Double)] = {
      if (frame == null || w <= 0 || h <= 0) return None
      val rowBytes = (w * 3 + 3) & ~3
      if (frame.length < rowBytes * h) return None
      var r = 0.0; var g = 0.0; var b = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        val base = y * rowBytes
        while (x < w) {
          val o = base + x * 3
          b += frame(o) & 0xFF; g += frame(o + 1) & 0xFF; r += frame(o + 2) & 0xFF
          x += 1
        }
        y += 1
      }
      val n = (w * h).toDouble
      Some((r / n, g / n, b / n))
    }

    /** Synthesize a REAL minimal AVI — genuine RIFF bytes (hdrl with
      * avih/strh/strf, movi with one `00db` BI_RGB frame per entry), so
      * the parse/sample/decode path exercises real container work while
      * an arithmetic oracle knows every expected value. `frameRgbs` are
      * solid fills, one per frame; 25 fps (40 000 µs/frame). */
    def synthesizeAvi(w: Int, h: Int, frameRgbs: Seq[Int]): Array[Byte] = {
      val rowBytes = (w * 3 + 3) & ~3
      val frames = frameRgbs.map { rgb =>
        val r = ((rgb >> 16) & 0xFF).toByte
        val g = ((rgb >> 8) & 0xFF).toByte
        val b = (rgb & 0xFF).toByte
        val f = new Array[Byte](rowBytes * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = y * rowBytes + x * 3
            f(o) = b; f(o + 1) = g; f(o + 2) = r
            x += 1
          }
          y += 1
        }
        f
      }
      buildAvi(w, h, frames, "DIB ", "00db", compression = 0)
    }

    /** Synthesize a REAL Motion-JPEG AVI: same container, `MJPG` stream
      * with one self-contained JFIF JPEG (ImageIO-encoded) per `00dc`
      * chunk. JPEG is lossy, so fills round-trip approximately — this is
      * the spec-verified compressed path, not an exact-oracle one. */
    def synthesizeMjpegAvi(w: Int, h: Int, frameRgbs: Seq[Int]): Array[Byte] = {
      val frames = frameRgbs.map { rgb =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
        finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      // fourcc 'MJPG' = biCompression for Motion JPEG
      buildAvi(w, h, frames, "MJPG", "00dc", compression = 0x47504A4D)
    }

    private def buildAvi(w: Int, h: Int, frames: Seq[Array[Byte]],
        handler: String, chunkId: String, compression: Int): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      def padded(n: Int) = n + (n & 1)
      val moviBody = 4 + frames.map(f => 8 + padded(f.length)).sum
      val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
      val buf = java.nio.ByteBuffer.allocate(8 + riffBody)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(ascii)).putInt(riffBody).put("AVI ".getBytes(ascii))
      buf.put("LIST".getBytes(ascii)).putInt(hdrlBody).put("hdrl".getBytes(ascii))
      // avih: µsPerFrame, maxBytesPerSec, padding, flags, totalFrames,
      // initialFrames, streams, suggestedBufSize, width, height, reserved×4
      buf.put("avih".getBytes(ascii)).putInt(56)
        .putInt(40000).putInt(0).putInt(0).putInt(0).putInt(frames.length)
        .putInt(0).putInt(1).putInt(maxFrame).putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      buf.put("LIST".getBytes(ascii)).putInt(4 + (8 + 56) + (8 + 40))
        .put("strl".getBytes(ascii))
      // strh: vids/<handler>, flags, prio+lang, initial, scale=1 rate=25,
      // start, length, bufSize, quality, sampleSize, rcFrame
      buf.put("strh".getBytes(ascii)).putInt(56)
        .put("vids".getBytes(ascii)).put(handler.getBytes(ascii))
        .putInt(0).putInt(0).putInt(0).putInt(1).putInt(25)
        .putInt(0).putInt(frames.length).putInt(maxFrame).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      // strf: BITMAPINFOHEADER (biCompression 0 = BI_RGB, 'MJPG' = MJPEG)
      buf.put("strf".getBytes(ascii)).putInt(40)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(compression).putInt(maxFrame).putInt(0).putInt(0).putInt(0).putInt(0)
      buf.put("LIST".getBytes(ascii)).putInt(moviBody).put("movi".getBytes(ascii))
      frames.foreach { f =>
        buf.put(chunkId.getBytes(ascii)).putInt(f.length).put(f)
        if ((f.length & 1) == 1) buf.put(0.toByte) // word alignment
      }
      buf.array()
    }

    /** REAL 16-dim pixel statistics of a BI_RGB frame, same layout as
      * [[ImageCodec.features]] ([meanR, meanG, meanB, meanLuma, 12-bin
      * luma histogram]); null when the frame is not a matching DIB. */
    def dibFeatures(frame: Array[Byte], w: Int, h: Int): Array[Float] = {
      if (frame == null || w <= 0 || h <= 0) return null
      val rowBytes = (w * 3 + 3) & ~3
      if (frame.length < rowBytes * h) return null
      val out = new Array[Float](16)
      val n = (w * h).toFloat
      var y = 0
      while (y < h) {
        var x = 0
        val base = y * rowBytes
        while (x < w) {
          val o = base + x * 3
          val b = frame(o) & 0xFF; val g = frame(o + 1) & 0xFF; val r = frame(o + 2) & 0xFF
          val luma = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
          out(0) += r / 255.0f; out(1) += g / 255.0f; out(2) += b / 255.0f
          out(3) += luma
          out(4 + math.min(11, (luma * 12).toInt)) += 1.0f
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < 16) { out(i) /= n; i += 1 }
      out
    }

    /** Exact (meanR, meanG, meanB) for BI_RGB frames; REAL ImageIO decode
      * for JPEG frames (the MJPEG case — self-contained JFIF per chunk).
      * None when neither applies. */
    def frameMeanRgb(frame: Array[Byte], w: Int, h: Int): Option[(Double, Double, Double)] = {
      if (frame == null || frame.length < 3) return None
      // JPEG magic first: a large-enough JPEG chunk could otherwise pass
      // the DIB size check and "decode" as pixel garbage
      if ((frame(0) & 0xFF) != 0xFF || (frame(1) & 0xFF) != 0xD8)
        return dibMeanRgb(frame, w, h)
      val img = ImageCodec.decode(frame)
      if (img == null) return None
      var r = 0.0; var g = 0.0; var b = 0.0
      val iw = img.getWidth; val ih = img.getHeight
      var y = 0
      while (y < ih) {
        var x = 0
        while (x < iw) {
          val rgb = img.getRGB(x, y)
          r += (rgb >> 16) & 0xFF; g += (rgb >> 8) & 0xFF; b += rgb & 0xFF
          x += 1
        }
        y += 1
      }
      val n = math.max(1, iw * ih).toDouble
      Some((r / n, g / n, b / n))
    }
  }

  /** The combined REAL codec on JDK platform libraries only: images via
    * [[ImageCodec]], audio via [[WavCodec]] (real header durations and
    * PCM-derived features), uncompressed RIFF/AVI video via [[AviCodec]]
    * (real container parse, time-based frame sampling, exact BI_RGB pixel
    * decode), everything else `application/octet-stream` with null
    * dimensions. Audio features are 16 per-sixteenth RMS energies of the
    * decoded waveform — real signal processing. COMPRESSED video has no
    * JDK codec; its frame sampling stays the documented stub. */
  object JdkAvCodec extends MediaCodec {
    val name = "jdk-av"

    def sniffMime(payload: Array[Byte]): String = {
      val img = ImageCodec.sniffMime(payload)
      if (img != "application/octet-stream") return img
      val wav = WavCodec.sniffMime(payload)
      if (wav != "application/octet-stream") wav else AviCodec.sniffMime(payload)
    }

    def probeDimensions(payload: Array[Byte]): (Int, Int) = {
      val img = ImageCodec.probeDimensions(payload)
      if (img._1 >= 0) img else AviCodec.probeDimensions(payload)
    }

    override def durationMs(payload: Array[Byte]): Long = {
      val (dur, _, _) = WavCodec.probe(payload)
      if (dur >= 0) return dur
      val vid = AviCodec.durationMs(payload)
      if (vid >= 0) vid else super.durationMs(payload)
    }

    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      ImageCodec.resize(payload, w, h)

    def sampleFrames(payload: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]] =
      if (AviCodec.sniffMime(payload) == "video/x-msvideo")
        AviCodec.sampleFrames(payload, everyMs).map(_._2)
      else DeterministicFakeCodec.sampleFrames(payload, everyMs, durationMs)

    def featuresBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map(features)

    def features(payload: Array[Byte]): Array[Float] = {
      val samples = WavCodec.decodeSamples(payload)
      if (samples != null && samples.length > 0) {
        val win = math.max(1, (samples.length + 15) / 16)
        val rms = WavCodec.rmsWindows(payload, win)
        val out = new Array[Float](16)
        var i = 0
        while (i < math.min(16, rms.length)) { out(i) = rms(i).toFloat; i += 1 }
        return out
      }
      // AVI: REAL first-frame pixel statistics, same 16-dim layout as
      // images (DIB → direct raw-pixel stats; MJPEG → the frame IS a
      // JPEG, so the image feature path decodes it)
      if (AviCodec.sniffMime(payload) == "video/x-msvideo") {
        AviCodec.sampleFrames(payload, everyMs = Long.MaxValue).headOption.foreach {
          case (_, frame) =>
            if (frame.length >= 3 && (frame(0) & 0xFF) == 0xFF && (frame(1) & 0xFF) == 0xD8)
              return ImageCodec.features(frame)
            val (w, h) = AviCodec.probeDimensions(payload)
            val f = AviCodec.dibFeatures(frame, w, h)
            if (f != null) return f
        }
      }
      ImageCodec.features(payload)
    }
  }

  /** Decode pass: fill the `meta` struct from the payload. Batched per
    * partition; payload column stays opaque (never shuffled wider than
    * needed — project before calling at scale). */
  def decodeMeta(df: DataFrame, payloadCol: String = "payload",
      codec: MediaCodec = DeterministicFakeCodec): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("decoded_meta", mediaMetaType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val (w, h) = codec.probeDimensions(payload)
        val meta = Row(codec.sniffMime(payload),
          if (w < 0) null else w, if (h < 0) null else h,
          codec.durationMs(payload), codec.name)
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Feature-extraction pass → `features: array<float>` column.
    *
    * Batched like mapInPandas: rows are processed `batchSize` at a time so
    * a real encoder can amortize model invocation over the batch (the
    * stub's batch API is a map, but the batching plumbing — grouping,
    * order preservation, last-partial-batch — is the real contract). */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload",
      batchSize: Int = 64, codec: MediaCodec = DeterministicFakeCodec): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = codec.featuresBatch(
          batch.map(_.get(idx).asInstanceOf[Array[Byte]]))
        batch.iterator.zip(feats.iterator).map { case (r, f) =>
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(enc)
  }

  /** Fused decode + feature pass: one `mapPartitions`, so each media row is
    * deserialized/reserialized ONCE instead of paying the RowEncoder
    * boundary twice (chaining [[decodeMeta]] then [[extractFeatures]]
    * deserializes every row at both stage entries — measurably pure
    * overhead, and the non-codegen boundary deoptimizes the surrounding
    * plan twice). Output schema and values are identical to the chain:
    * `decoded_meta` struct then `features: array<float>`. Feature
    * extraction stays batched (`batchSize`) so a real encoder amortizes
    * model invocation; metadata decode is per-row within the same batch. */
  def decodeAndFeaturize(df: DataFrame, payloadCol: String = "payload",
      batchSize: Int = 64, codec: MediaCodec = DeterministicFakeCodec): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("decoded_meta", mediaMetaType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val payloads = batch.map(_.get(idx).asInstanceOf[Array[Byte]])
        val feats = codec.featuresBatch(payloads)
        batch.iterator.zip(payloads.iterator).zip(feats.iterator).map {
          case ((r, payload), f) =>
            val (w, h) = codec.probeDimensions(payload)
            val meta = Row(codec.sniffMime(payload),
              if (w < 0) null else w, if (h < 0) null else h,
              codec.durationMs(payload), codec.name)
            Row.fromSeq(r.toSeq ++ Seq(meta, f.toSeq))
        }
      }
    }(enc)
  }

  /** Resize pass (image semantics): payload → resized payload. */
  def resize(df: DataFrame, w: Int, h: Int, payloadCol: String = "payload",
      codec: MediaCodec = DeterministicFakeCodec): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val resized = if (payload == null) null
          else codec.resize(payload, w, h)
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(enc)
  }

  /** Frame-sampling pass (video semantics): one output row per sampled
    * frame — a flatMap, so downstream stages parallelize over frames. */
  def sampleFrames(df: DataFrame, everyMs: Long,
      payloadCol: String = "payload", metaCol: String = "meta",
      codec: MediaCodec = DeterministicFakeCodec): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val mIdx = df.schema.fieldIndex(metaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.get(pIdx).asInstanceOf[Array[Byte]]
        if (payload == null) Iterator.empty
        else {
          val meta = r.getStruct(mIdx)
          val dur = if (meta == null || meta.isNullAt(3)) payload.length.toLong else meta.getLong(3)
          codec.sampleFrames(payload, everyMs, dur).iterator
            .zipWithIndex.map { case (f, i) => Row.fromSeq(r.toSeq ++ Seq(i, f)) }
        }
      }
    }(enc)
  }

  /** Synthesize a deterministic media table from any keyed frame (for tests
    * and benches: payload bytes derived from the id). */
  def synthesize(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("media_id"),
      // payload: repeatable pseudo-bytes from the id
      unhex(repeat(substring(md5(col(idCol).cast(StringType)), 1, 16), 8)).as("payload"))
      .withColumn("meta", lit(null).cast(mediaMetaType))

  /** Deterministic dims/fill for [[synthesizeImages]] — shared with tests
    * and oracle SQL (which replays this arithmetic): for id `i`,
    * width = 16 + i%48, height = 16 + (i/7)%40, channel fills
    * (37i, 59i, 83i) mod 256. */
  def imageParams(id: Long): (Int, Int, Int, Int, Int) =
    ((16 + id % 48).toInt, (16 + (id / 7) % 40).toInt,
      ((id * 37) % 256).toInt, ((id * 59) % 256).toInt, ((id * 83) % 256).toInt)

  /** Deterministic WAV params for [[synthesizeAudio]], shared with tests
    * and oracle SQL: for id `i`, nSamples = 1000 + (i%5)·500 at 8 kHz
    * mono, square-wave amplitude A = 1000 + (i%20)·1000. |sample| is
    * constant, so EVERY RMS window is exactly A/32768 — and 32768 = 2^15
    * makes that value float-exact, so an arithmetic oracle can assert it
    * to 6 decimals with no tolerance. */
  def audioParams(id: Long): (Int, Short) =
    ((1000 + (id % 5) * 500).toInt, (1000 + (id % 20) * 1000).toShort)

  /** Synthesize REAL PCM16 WAVs keyed by `idCol` — genuine RIFF bytes
    * (44-byte canonical header + samples), so decode / feature paths
    * exercise the real `javax.sound.sampled` codec while an arithmetic
    * oracle knows every expected value. */
  def synthesizeAudio(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType).as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (n, a) = audioParams(id)
        Row(id, WavCodec.synthesizeWav(n, 8000)(i =>
          if (i % 2 == 0) a else (-a).toShort))
      }
    }(enc)
  }

  /** Deterministic AVI params for [[synthesizeVideos]], shared with tests
    * and oracle SQL: for id `i`, nFrames = 3 + i%5 at 25 fps (40 ms
    * periods), width = 8 + (i%5)·4, height = 6 + (i/3)%8, and frame `f`
    * solid fill (r, g, b) = ((37i + 11f) mod 256, (59i + 17f) mod 256,
    * (83i + 23f) mod 256) — all replayable arithmetically. */
  def videoParams(id: Long): (Int, Int, Int) =
    ((3 + id % 5).toInt, (8 + (id % 5) * 4).toInt, (6 + (id / 3) % 8).toInt)

  def videoFrameRgb(id: Long, f: Int): Int =
    ((((id * 37 + f * 11) % 256).toInt << 16) |
      (((id * 59 + f * 17) % 256).toInt << 8) |
      ((id * 83 + f * 23) % 256).toInt)

  /** Synthesize REAL uncompressed AVIs keyed by `idCol` — genuine RIFF
    * container bytes (hdrl/movi, BI_RGB frames), so the video decode /
    * frame-sample path exercises the real [[AviCodec]] parser while an
    * arithmetic oracle knows every expected value. */
  def synthesizeVideos(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType).as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (n, w, h) = videoParams(id)
        Row(id, AviCodec.synthesizeAvi(w, h, (0 until n).map(videoFrameRgb(id, _))))
      }
    }(enc)
  }

  /** Frame-sampling pass for AVI payloads with REAL per-frame pixel
    * stats: one output row per sampled frame — (frame_idx, mean_r/g/b).
    * Exact for BI_RGB frames, ImageIO-decoded for MJPEG (JFIF) frames;
    * non-AVI payloads emit no rows. */
  def sampleFrameStats(df: DataFrame, everyMs: Long,
      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.get(pIdx).asInstanceOf[Array[Byte]]
        val (w, h) = AviCodec.probeDimensions(payload)
        AviCodec.sampleFrames(payload, everyMs).iterator.flatMap { case (i, f) =>
          AviCodec.frameMeanRgb(f, w, h).map { case (mr, mg, mb) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](i, mr, mg, mb))
          }
        }
      }
    }(enc)
  }

  /** Synthesize REAL solid-color PNGs keyed by `idCol` — genuine image
    * bytes (encoded per-partition with [[ImageCodec]]), so decode /
    * resize / feature paths exercise the real `javax.imageio` codec while
    * an arithmetic oracle still knows every expected value. */
  /** Perceptual-hash pass → `dhash: long` column ([[ImageCodec.dHash64]]),
    * the image analogue of the text simhash signature: one mapPartitions
    * scan, no shuffle. */
  def dHash(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("dhash", LongType, nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+
          ImageCodec.dHash64(r.get(idx).asInstanceOf[Array[Byte]]))
      }
    }(enc)
  }

  /** Image near-dup pairs by dHash Hamming distance ≤ `maxDist` —
    * [[dHash]] signatures through the generic chunk-blocked
    * [[Dedup.hammingNearDupPairs]] (complete recall at dist ≤ 3, no
    * all-pairs join anywhere): (id_a, id_b, hamming). */
  def imageNearDupPairs(df: DataFrame, idCol: String,
      payloadCol: String = "payload", maxDist: Int = 3,
      maxBucketSize: Int = 1000): DataFrame =
    Dedup.hammingNearDupPairs(
      dHash(df, payloadCol).select(col(idCol), col("dhash")),
      idCol, "dhash", maxDist, maxBucketSize)

  /** Synthesize 9×8 grayscale gradient PNGs for dHash testing: from rows
    * (media_id, salt, bump), pixel value
    * `v(x,y) = (x·31 + y·53 + (salt % 97)·(x² + 3y² + 7xy + 1)·11
    *            + bump·[x=y=0]) % 256`
    * — quadratic cross terms so adjacent-pixel differences vary within a
    * row (a linear gradient's dHash bits would be wrap-driven and
    * salt-correlated), exactly replayable in SQL, and `bump` perturbs one
    * corner pixel so a clone sits at Hamming distance ≤ 1 from its base. */
  def synthesizeGradientImages(src: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val in = src.select(col("media_id").cast(LongType),
      col("salt").cast(LongType), col("bump").cast(IntegerType))
    in.mapPartitions { rows =>
      rows.map { r =>
        val (id, salt, bump) = (r.getLong(0), r.getLong(1), r.getInt(2))
        val img = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val v = ((x * 31 + y * 53 +
              (salt % 97) * (x * x + 3 * y * y + 7 * x * y + 1) * 11 +
              (if (x == 0 && y == 0) bump else 0)) % 256).toInt
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        Row(id, ImageCodec.encodePng(img))
      }
    }(enc)
  }

  /** Audio-fingerprint pass → `afp: long` column
    * ([[WavCodec.audioFingerprint64]]): one mapPartitions scan, no
    * shuffle — the audio analogue of [[dHash]]. */
  def audioFingerprint(df: DataFrame, payloadCol: String = "payload",
      windowSamples: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("afp", LongType, nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ WavCodec.audioFingerprint64(
          r.get(idx).asInstanceOf[Array[Byte]], windowSamples))
      }
    }(enc)
  }

  /** Audio near-dup pairs by fingerprint Hamming distance ≤ `maxDist` via
    * the generic [[Dedup.hammingNearDupPairs]]: (id_a, id_b, hamming). */
  def audioNearDupPairs(df: DataFrame, idCol: String,
      payloadCol: String = "payload", windowSamples: Int = 64,
      maxDist: Int = 3, maxBucketSize: Int = 1000): DataFrame =
    Dedup.hammingNearDupPairs(
      audioFingerprint(df, payloadCol, windowSamples).select(col(idCol), col("afp")),
      idCol, "afp", maxDist, maxBucketSize)

  /** Synthesize stepped square-wave WAVs for fingerprint testing: from
    * rows (media_id, salt, bump), 65 windows of 64 samples whose
    * per-window amplitude is
    * `A(w) = ((salt + 1)·(w² + 1)·7919 + bump·[w=0]) % 25000`
    * (multiplicative mixing: the wrap pattern, and so the bit pattern,
    * depends on the salt — a per-salt constant FACTOR alone would leave
    * every non-wrapping salt with identical comparison bits)
    * — alternating ±A(w) samples make every window's RMS exactly
    * A(w)/32768, so fingerprint bits reduce to integer comparisons a SQL
    * oracle replays; `bump` perturbs the first window so a clone sits at
    * Hamming distance ≤ 1 from its base. */
  def synthesizeSteppedWavs(src: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val in = src.select(col("media_id").cast(LongType),
      col("salt").cast(LongType), col("bump").cast(IntegerType))
    in.mapPartitions { rows =>
      rows.map { r =>
        val (id, salt, bump) = (r.getLong(0), r.getLong(1), r.getInt(2))
        def amp(w: Int): Int =
          (((salt + 1) * (w * w + 1) * 7919L +
            (if (w == 0) bump else 0)) % 25000).toInt
        val payload = WavCodec.synthesizeWav(65 * 64, 8000) { i =>
          val a = amp(i / 64)
          (if (i % 2 == 0) a else -a).toShort
        }
        Row(id, payload)
      }
    }(enc)
  }

  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val src = df.select(col(idCol).cast(LongType).as("media_id"))
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h, cr, cg, cb) = imageParams(id)
        Row(id, ImageCodec.solidPng(w, h, (cr << 16) | (cg << 8) | cb))
      }
    }(enc)
  }
}
