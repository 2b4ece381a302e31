package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.synthesize(
    spark.range(0, 20).toDF("id"), "id")

  test("synthesize produces deterministic binary payloads with media schema") {
    val a = media.orderBy("media_id").collect()
    val b = media.orderBy("media_id").collect()
    assert(a.length === 20)
    assert(a.map(_.getAs[Array[Byte]]("payload").toSeq) ===
      b.map(_.getAs[Array[Byte]]("payload").toSeq))
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("decodeMeta fills the typed metadata struct per partition") {
    val out = Multimodal.decodeMeta(media)
    assert(out.schema("decoded_meta").dataType === Multimodal.mediaMetaType)
    val m = out.select("decoded_meta.*").collect()
    assert(m.forall(r => r.getInt(1) >= 64 && r.getInt(2) >= 64))
    assert(m.forall(r => Set("image/jpeg", "image/png", "audio/wav", "video/mp4")
      .contains(r.getString(0))))
  }

  test("extractFeatures emits fixed-width float vectors") {
    val out = Multimodal.extractFeatures(media)
    val feats = out.select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length === 16))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media)
      .select("features").collect().map(_.getSeq[Float](0))
    assert(feats.toSeq === again.toSeq)
  }

  test("decodeAndFeaturize (fused) matches the decodeMeta→extractFeatures chain") {
    val fused = Multimodal.decodeAndFeaturize(media).orderBy("media_id")
    val chained = Multimodal.extractFeatures(Multimodal.decodeMeta(media)).orderBy("media_id")
    assert(fused.schema === chained.schema)
    val f = fused.select("media_id", "decoded_meta", "features").collect()
    val c = chained.select("media_id", "decoded_meta", "features").collect()
    assert(f.toSeq === c.toSeq)
    // odd partial batch exercised (20 rows, batchSize 7)
    val partial = Multimodal.decodeAndFeaturize(media, batchSize = 7)
    assert(partial.count() === 20)
  }

  test("resize rewrites payloads to the target size budget") {
    val out = Multimodal.resize(media, 128, 128)
    val sizes = out.select("payload").collect().map(_.getAs[Array[Byte]](0).length).distinct
    assert(sizes.toSeq === Seq((128 * 128) / 64))
  }

  // ── real image codec (javax.imageio) ──────────────────────────────────

  test("ImageCodec sniffs real magic bytes and rejects junk") {
    val png = Multimodal.ImageCodec.solidPng(5, 4, 0x336699)
    assert(Multimodal.ImageCodec.sniffMime(png) === "image/png")
    // JPEG via the JDK encoder
    val img = new java.awt.image.BufferedImage(6, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    assert(Multimodal.ImageCodec.sniffMime(jbos.toByteArray) === "image/jpeg")
    val gbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", gbos)
    assert(Multimodal.ImageCodec.sniffMime(gbos.toByteArray) === "image/gif")
    val bbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bbos)
    assert(Multimodal.ImageCodec.sniffMime(bbos.toByteArray) === "image/bmp")
    assert(Multimodal.ImageCodec.sniffMime("not an image".getBytes) ===
      "application/octet-stream")
    assert(Multimodal.ImageCodec.sniffMime(null) === "application/octet-stream")
  }

  test("ImageCodec header-probes true dimensions for png/jpeg/gif/bmp") {
    val png = Multimodal.ImageCodec.solidPng(37, 23, 0xAA5511)
    assert(Multimodal.ImageCodec.probeDimensions(png) === ((37, 23)))
    val img = new java.awt.image.BufferedImage(41, 19, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("jpg", "gif", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      assert(Multimodal.ImageCodec.probeDimensions(bos.toByteArray) === ((41, 19)), fmt)
    }
    assert(Multimodal.ImageCodec.probeDimensions("junk bytes here".getBytes) === ((-1, -1)))
  }

  test("ImageCodec resize really resamples: dimensions change, solid color survives") {
    val src = Multimodal.ImageCodec.solidPng(60, 40, 0x7F3001)
    val out = Multimodal.ImageCodec.resize(src, 24, 18)
    assert(Multimodal.ImageCodec.probeDimensions(out) === ((24, 18)))
    val img = Multimodal.ImageCodec.decode(out)
    // bilinear resample of a solid color is exactly that color, PNG is lossless
    assert((img.getRGB(0, 0) & 0xFFFFFF) === 0x7F3001)
    assert((img.getRGB(23, 17) & 0xFFFFFF) === 0x7F3001)
    // non-image payloads pass through unchanged
    val junk = "audio bytes".getBytes
    assert(Multimodal.ImageCodec.resize(junk, 8, 8) eq junk)
  }

  test("ImageCodec degrades to not-decodable on corrupt payloads with valid magic") {
    // truncated GIF/PNG: magic bytes intact, body garbage — JDK readers
    // throw RuntimeExceptions on these; the codec must return the
    // documented sentinels, never fail the task
    val img = new java.awt.image.BufferedImage(20, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("gif", "png", "jpg")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val full = bos.toByteArray
      for (cut <- Seq(10, 24, full.length / 2)) {
        val truncated = java.util.Arrays.copyOf(full, cut)
        val dims = Multimodal.ImageCodec.probeDimensions(truncated)
        assert(dims._1 >= -1 && dims._2 >= -1) // no throw is the contract
        Multimodal.ImageCodec.decode(truncated) // may be null; must not throw
        val corrupted = full.clone()
        // scramble the body after the header region
        for (i <- 16 until corrupted.length) corrupted(i) = (i * 31).toByte
        Multimodal.ImageCodec.decode(corrupted)
        Multimodal.ImageCodec.probeDimensions(corrupted)
      }
    }
  }

  test("WavCodec: real WAV round trip — sniff, header probe, PCM decode, RMS") {
    // 8000 samples at 8 kHz = exactly 1000 ms; square wave amp 12000
    val wav = Multimodal.WavCodec.synthesizeWav(8000, 8000)(i =>
      if (i % 2 == 0) 12000 else -12000)
    assert(Multimodal.WavCodec.sniffMime(wav) === "audio/wav")
    val (dur, rate, ch) = Multimodal.WavCodec.probe(wav)
    assert((dur, rate, ch) === ((1000L, 8000, 1)))
    val samples = Multimodal.WavCodec.decodeSamples(wav)
    assert(samples.length === 8000)
    assert(samples(0) === 12000 / 32768.0)
    assert(samples(1) === -12000 / 32768.0)
    // RMS of a constant-|amplitude| wave is exactly amp/2^15 per window
    val rms = Multimodal.WavCodec.rmsWindows(wav, 500)
    assert(rms.length === 16)
    assert(rms.forall(_ === 12000 / 32768.0))
    // corrupt payloads degrade, never throw
    assert(Multimodal.WavCodec.probe("RIFFjunkWAVEgarbage!!".getBytes) === ((-1L, -1, -1)))
    assert(Multimodal.WavCodec.decodeSamples(java.util.Arrays.copyOf(wav, 30)) === null)
    assert(Multimodal.WavCodec.sniffMime("not audio".getBytes) === "application/octet-stream")
  }

  test("JdkAvCodec routes images and audio to the real codecs in one MediaCodec") {
    val audio = Multimodal.synthesizeAudio(spark.range(0, 20).toDF("id"), "id")
    val out = Multimodal.decodeMeta(audio, codec = Multimodal.JdkAvCodec)
      .select("media_id", "decoded_meta.*").orderBy("media_id").collect()
    out.foreach { r =>
      val (n, _) = Multimodal.audioParams(r.getLong(0))
      assert(r.getString(1) === "audio/wav")
      assert(r.isNullAt(2) && r.isNullAt(3)) // no image dimensions
      assert(r.getLong(4) === n * 1000L / 8000L) // REAL duration from the header
      assert(r.getString(5) === "jdk-av")
    }
    // and a PNG through the same codec still decodes as an image
    val imgs = Multimodal.synthesizeImages(spark.range(0, 3).toDF("id"), "id")
    val im = Multimodal.decodeMeta(imgs, codec = Multimodal.JdkAvCodec)
      .select("media_id", "decoded_meta.*").collect()
    im.foreach { r =>
      val (w, h, _, _, _) = Multimodal.imageParams(r.getLong(0))
      assert(r.getString(1) === "image/png")
      assert(r.getInt(2) === w && r.getInt(3) === h)
    }
  }

  test("ImageCodec features are real pixel statistics (golden solid image)") {
    val png = Multimodal.ImageCodec.solidPng(10, 10, (200 << 16) | (100 << 8) | 50)
    val f = Multimodal.ImageCodec.features(png)
    assert(f.length === 16)
    assert(math.round(f(0) * 255) === 200)
    assert(math.round(f(1) * 255) === 100)
    assert(math.round(f(2) * 255) === 50)
    // histogram mass sums to 1 (one luma bin holds all pixels)
    assert(math.abs(f.drop(4).sum - 1.0f) < 1e-5)
    assert(f.drop(4).max === 1.0f)
  }

  test("decodeMeta with ImageCodec on synthesized PNGs matches imageParams; junk gets null dims") {
    val imgs = Multimodal.synthesizeImages(spark.range(0, 30).toDF("id"), "id")
    val out = Multimodal.decodeMeta(imgs, codec = Multimodal.ImageCodec)
      .select("media_id", "decoded_meta.*").orderBy("media_id").collect()
    out.foreach { r =>
      val (w, h, _, _, _) = Multimodal.imageParams(r.getLong(0))
      assert(r.getString(1) === "image/png")
      assert(r.getInt(2) === w); assert(r.getInt(3) === h)
      assert(r.getString(5) === "imageio")
    }
    // a non-image payload through the same path: octet-stream, null dims
    val junk = Multimodal.synthesize(spark.range(0, 3).toDF("id"), "id")
    val jm = Multimodal.decodeMeta(junk, codec = Multimodal.ImageCodec)
      .select("decoded_meta.*").collect()
    jm.foreach { r =>
      assert(r.getString(0) === "application/octet-stream")
      assert(r.isNullAt(1) && r.isNullAt(2))
    }
  }

  test("AviCodec: real RIFF/AVI round trip — sniff, probe, frame sample, DIB decode") {
    // 5 frames, 12×7, distinct solid fills per frame
    val fills = (0 until 5).map(f => (f * 40 << 16) | (f * 30 << 8) | (f * 20))
    val avi = Multimodal.AviCodec.synthesizeAvi(12, 7, fills)
    assert(Multimodal.AviCodec.sniffMime(avi) === "video/x-msvideo")
    assert(Multimodal.AviCodec.probeDimensions(avi) === ((12, 7)))
    assert(Multimodal.AviCodec.durationMs(avi) === 200L) // 5 × 40 ms
    // everyMs = 80 over 200 ms at 25 fps → frame indexes 0, 2, 4
    val sampled = Multimodal.AviCodec.sampleFrames(avi, everyMs = 80)
    assert(sampled.map(_._1) === Seq(0, 2, 4))
    sampled.foreach { case (i, frame) =>
      val Some((mr, mg, mb)) = Multimodal.AviCodec.dibMeanRgb(frame, 12, 7)
      assert((mr, mg, mb) === ((i * 40.0, i * 30.0, i * 20.0)))
    }
    // everyMs shorter than the frame period dedupes to each frame once
    assert(Multimodal.AviCodec.sampleFrames(avi, everyMs = 10).map(_._1) ===
      Seq(0, 1, 2, 3, 4))
    // corrupt payloads degrade, never throw
    assert(Multimodal.AviCodec.probeDimensions("RIFFjunkAVI garbage".getBytes) === ((-1, -1)))
    assert(Multimodal.AviCodec.sampleFrames(
      java.util.Arrays.copyOf(avi, 40), everyMs = 80) === Seq.empty)
    assert(Multimodal.AviCodec.sniffMime("not video".getBytes) === "application/octet-stream")
    // JdkAvCodec routes AVI payloads to the real parser
    assert(Multimodal.JdkAvCodec.sniffMime(avi) === "video/x-msvideo")
    assert(Multimodal.JdkAvCodec.durationMs(avi) === 200L)
    assert(Multimodal.JdkAvCodec.sampleFrames(avi, 80, 200L).length === 3)
  }

  test("AviCodec: Motion-JPEG AVI — same container, real per-frame ImageIO decode") {
    val fills = Seq(0x102030, 0x405060, 0x708090, 0xA0B0C0)
    val avi = Multimodal.AviCodec.synthesizeMjpegAvi(16, 12, fills)
    assert(Multimodal.AviCodec.sniffMime(avi) === "video/x-msvideo")
    assert(Multimodal.AviCodec.probeDimensions(avi) === ((16, 12)))
    assert(Multimodal.AviCodec.durationMs(avi) === 160L)
    val sampled = Multimodal.AviCodec.sampleFrames(avi, everyMs = 40)
    assert(sampled.map(_._1) === Seq(0, 1, 2, 3))
    sampled.foreach { case (i, frame) =>
      // each chunk is a self-contained JFIF JPEG
      assert((frame(0) & 0xFF) === 0xFF && (frame(1) & 0xFF) === 0xD8)
      val Some((mr, mg, mb)) = Multimodal.AviCodec.frameMeanRgb(frame, 16, 12)
      val rgb = fills(i)
      // JPEG is lossy: solid fills round-trip within a small tolerance
      assert(math.abs(mr - ((rgb >> 16) & 0xFF)) < 4.0, s"frame $i mean_r=$mr")
      assert(math.abs(mg - ((rgb >> 8) & 0xFF)) < 4.0, s"frame $i mean_g=$mg")
      assert(math.abs(mb - (rgb & 0xFF)) < 4.0, s"frame $i mean_b=$mb")
    }
  }

  test("sampleFrameStats on synthesized AVIs matches videoParams arithmetic") {
    val vids = Multimodal.synthesizeVideos(spark.range(1, 25).toDF("id"), "id")
    val out = Multimodal.sampleFrameStats(vids, everyMs = 80)
      .select("media_id", "frame_idx", "mean_r", "mean_g", "mean_b")
      .orderBy("media_id", "frame_idx").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0); val f = r.getInt(1)
      assert(f % 2 === 0) // 80 ms sampling over 40 ms frames
      val rgb = Multimodal.videoFrameRgb(id, f)
      assert(r.getDouble(2) === ((rgb >> 16) & 0xFF).toDouble)
      assert(r.getDouble(3) === ((rgb >> 8) & 0xFF).toDouble)
      assert(r.getDouble(4) === (rgb & 0xFF).toDouble)
    }
    val (n1, _, _) = Multimodal.videoParams(1L) // id 1 → 4 frames → idx 0, 2
    assert(out.filter(_.getLong(0) == 1L).map(_.getInt(1)).toSeq ===
      (0 until n1 by 2).toSeq)
  }

  test("JdkAvCodec video features are real first-frame pixel statistics") {
    // DIB: exact — frame 0 fill (200, 100, 50)
    val avi = Multimodal.AviCodec.synthesizeAvi(10, 10,
      Seq((200 << 16) | (100 << 8) | 50, 0x000000))
    val f = Multimodal.JdkAvCodec.features(avi)
    assert(f.length === 16)
    assert(math.round(f(0) * 255) === 200)
    assert(math.round(f(1) * 255) === 100)
    assert(math.round(f(2) * 255) === 50)
    assert(math.abs(f.drop(4).sum - 1.0f) < 1e-5) // histogram mass
    // MJPEG: approximate (lossy), same layout via the image feature path
    val mj = Multimodal.AviCodec.synthesizeMjpegAvi(16, 12,
      Seq((200 << 16) | (100 << 8) | 50))
    val fm = Multimodal.JdkAvCodec.features(mj)
    assert(math.abs(fm(0) * 255 - 200) < 4.0)
    assert(math.abs(fm(1) * 255 - 100) < 4.0)
    assert(math.abs(fm(2) * 255 - 50) < 4.0)
  }

  test("e2e multimodal pipeline: video frames → features → embedding near-dup") {
    import graft.operators.Dedup
    // two ids with the SAME frame fills (planted via id arithmetic is not
    // possible — videoFrameRgb is injective in id — so plant by unioning
    // id 7 twice under different media ids), plus distinct others
    val base = Multimodal.synthesizeVideos(spark.range(1, 20).toDF("id"), "id")
    val dup = Multimodal.synthesizeVideos(
      spark.range(7, 8).toDF("id"), "id")
      .withColumn("media_id", col("media_id") + 1000)
    val frames = Multimodal.sampleFrameStats(base.unionByName(dup), everyMs = 40)
    // per-frame stats → a per-video embedding: mean over sampled frames
    val emb = frames.groupBy("media_id").agg(
      array(avg("mean_r").cast("float"), avg("mean_g").cast("float"),
        avg("mean_b").cast("float")).as("embedding"))
    val pairs = Dedup.embeddingNearDupPairs(emb, "media_id", "embedding",
        threshold = 0.99999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the planted copy (7, 1007) must surface as an embedding near-dup
    assert(pairs.contains((7L, 1007L)),
      s"planted duplicate video not found: ${pairs.mkString(",")}")
  }

  test("sampleFrames flat-maps one row per frame with frame index") {
    val withMeta = Multimodal.decodeMeta(media)
      .withColumnRenamed("meta", "meta_orig").withColumnRenamed("decoded_meta", "meta")
    val frames = Multimodal.sampleFrames(withMeta, everyMs = 16)
    assert(frames.count() > media.count()) // fan-out happened
    assert(frames.schema.fieldNames.contains("frame_idx"))
    val perDoc = frames.groupBy("media_id").count().select(min("count")).first().getLong(0)
    assert(perDoc >= 1)
  }

  test("dHash64: bits follow the hand-computed luma comparisons on a 9×8 image") {
    // grayscale row pattern 0,10,5,20,… : bit set iff next pixel brighter
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val vals = Array(0, 10, 5, 20, 20, 3, 200, 100, 150)
    (0 until 8).foreach { y =>
      (0 until 9).foreach { x =>
        val v = vals(x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val fp = Multimodal.ImageCodec.dHash64(Multimodal.ImageCodec.encodePng(img))
    // per-row bits: 10>0, !(5>10), 20>5, !(20>20), !(3>20), 200>3, !(100>200), 150>100
    val rowBits = Seq(1, 0, 1, 0, 0, 1, 0, 1)
    val wantRow = rowBits.zipWithIndex.map { case (b, x) => b.toLong << x }.sum
    val want = (0 until 8).map(y => wantRow << (y * 8)).sum
    assert(fp === want)
    // re-encoding the same pixels does not move the hash
    val again = Multimodal.ImageCodec.dHash64(Multimodal.ImageCodec.encodePng(img))
    assert(again === fp)
  }

  test("dHash64 downscales larger images and is stable under upscale re-encode") {
    // a 90×80 blow-up of a gradient hashes like SOME 64-bit signature and
    // identically across re-encodes; undecodable payloads hash to 0
    val big = new java.awt.image.BufferedImage(
      90, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 80).foreach { y =>
      (0 until 90).foreach { x =>
        val v = (x * 2 + y) % 256
        big.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val p = Multimodal.ImageCodec.encodePng(big)
    assert(Multimodal.ImageCodec.dHash64(p) === Multimodal.ImageCodec.dHash64(p))
    assert(Multimodal.ImageCodec.dHash64(Array[Byte](1, 2, 3)) === 0L)
  }

  test("imageNearDupPairs: corner-pixel clones sit within Hamming 1 of their base") {
    val ids = spark.range(1, 31).toDF("media_id")
    val base = ids.select($"media_id", $"media_id".as("salt"), lit(0).as("bump"))
    val clones = ids.filter($"media_id" % 10 === 0)
      .select(($"media_id" + 1000).as("media_id"), $"media_id".as("salt"),
        lit(8).as("bump"))
    val media = Multimodal.synthesizeGradientImages(base.unionByName(clones))
    val pairs = Multimodal.imageNearDupPairs(media, "media_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every clone pairs with its base at distance ≤ 1
    Seq(10L, 20L, 30L).foreach { b =>
      val hit = pairs.find(p => p._1 == b && p._2 == b + 1000)
      assert(hit.isDefined, s"clone of $b not found in ${pairs.toSeq}")
      assert(hit.get._3 <= 1)
    }
    // every reported pair honors the distance contract
    assert(pairs.forall(_._3 <= 3))
  }

  test("audioFingerprint64: bits equal the per-window amplitude comparisons exactly") {
    // amplitudes 100,50,200,200,… repeating: bit i = A(i+1) > A(i)
    val amps = (0 until 65).map(w => Seq(100, 50, 200, 200)(w % 4))
    val wav = Multimodal.WavCodec.synthesizeWav(65 * 64, 8000) { i =>
      val a = amps(i / 64); (if (i % 2 == 0) a else -a).toShort
    }
    val fp = Multimodal.WavCodec.audioFingerprint64(wav, 64)
    val want = (0 until 64).map { i =>
      if (amps(i + 1) > amps(i)) 1L << i else 0L
    }.sum
    assert(fp === want)
    assert(Multimodal.WavCodec.audioFingerprint64(Array[Byte](1, 2, 3), 64) === 0L)
  }

  test("audioNearDupPairs: first-window clones sit within Hamming 1 of their base") {
    val ids = spark.range(1, 31).toDF("media_id")
    val base = ids.select($"media_id", $"media_id".as("salt"), lit(0).as("bump"))
    val clones = ids.filter($"media_id" % 10 === 0)
      .select(($"media_id" + 1000).as("media_id"), $"media_id".as("salt"),
        lit(5000).as("bump"))
    val media = Multimodal.synthesizeSteppedWavs(base.unionByName(clones))
    val pairs = Multimodal.audioNearDupPairs(media, "media_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    Seq(10L, 20L, 30L).foreach { b =>
      val hit = pairs.find(p => p._1 == b && p._2 == b + 1000)
      assert(hit.isDefined, s"clone of $b not found in ${pairs.toSeq}")
      assert(hit.get._3 <= 1)
    }
    assert(pairs.forall(_._3 <= 3))
  }
}
