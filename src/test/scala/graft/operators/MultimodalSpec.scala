package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // kinds by doc_id mod 3: 0,3→image 1→audio 2,5→video (2 has empty content)
  private def media = Multimodal.syntheticMediaTable(
    Seq((0L, "hello world"), (1L, "spark histogram"), (2L, ""),
      (3L, "audio bytes here"), (5L, "a long enough synthetic video payload"))
      .toDF("doc_id", "text"))

  test("schema convention: binary content + typed metadata struct") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSet == Set("kind", "width", "height", "sample_rate", "duration_ms"))
  }

  test("decodeFeatures appends a fixed-dim float feature column, deterministically") {
    val out = Multimodal.decodeFeatures(media, "content")
    assert(out.schema("features").dataType.simpleString == "array<float>")
    val rows = out.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == Multimodal.FeatureDim))
    // determinism: re-running yields identical features
    val rows2 = Multimodal.decodeFeatures(media, "content")
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows == rows2)
    // the empty-payload video still carries a parseable container:
    // header features (dims real, duration 0), not stub hashes
    assert(math.abs(rows(2L)(0) - 1280 / 4096.0f) < 1e-6, s"id2: ${rows(2L)}")
    assert(rows(2L)(3) == 0.0f, s"empty payload → zero duration: ${rows(2L)}")
    // truly empty bytes → zero vector, not a crash (totality)
    val emptyRow = Multimodal.decodeFeatures(
      media.withColumn("content", when(col("media_id") === 2L,
        lit(Array.empty[Byte])).otherwise(col("content"))), "content")
      .where(col("media_id") === 2L).select("features").collect()(0).getSeq[Float](0)
    assert(emptyRow.forall(_ == 0.0f))
    // different content → different features
    assert(rows(0L) != rows(1L))
  }

  test("generation-time sidecar matches the real decode for every synthetic kind") {
    val out = Multimodal.decodeFeatures(media, "content")
      .select(col("media_id"), col("features"), col("expected")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getSeq[Float](1)
      val e = r.getSeq[Float](2)
      assert(e != null, s"id ${r.getLong(0)}: synthetic rows must carry a sidecar")
      assert(e.length == Multimodal.FeatureDim)
      val dev = f.zip(e).map { case (a, b) => math.abs(a - b) }.max
      assert(dev < 1e-4, s"id ${r.getLong(0)}: decoded vs expected dev $dev\n  $f\n  $e")
    }
  }

  test("resizeImages rewrites image rows and metadata, passes others through") {
    val out = Multimodal.resizeImages(media, 224, 224)
    assert(out.count() == media.count(), "row count unchanged")
    val byId = out.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val origKinds = media.select(col("media_id"), col("meta.kind")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byId.foreach { case (id, r) =>
      val m = r.getStruct(r.fieldIndex("meta"))
      assert(m.getString(0) == origKinds(id), "kind preserved")
      if (origKinds(id) == "image") {
        assert(m.getInt(1) == 224 && m.getInt(2) == 224, "metadata rewritten")
        // synthetic image rows carry real PNGs → the real resize path ran
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
        assert(img != null && img.getWidth == 224 && img.getHeight == 224,
          "resized image content must be a decodable 224x224 PNG")
      }
    }
  }

  // A real 32×16 PNG: left half pure red, right half pure blue.
  private def testPng(w: Int = 32, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
      }
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG decode: pixel-statistic features reflect actual image content") {
    val png = testPng()
    val df = Seq((100L, png, "image")).toDF("media_id", "content", "k")
      .select(col("media_id"), col("content"),
        struct(col("k").as("kind"), lit(32).as("width"), lit(16).as("height"),
          lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("duration_ms")).as("meta"))
    val feats = Multimodal.decodeFeatures(df, "content")
      .select("features").collect()(0).getSeq[Float](0)
    assert(feats.length == Multimodal.FeatureDim)
    // [w/4096, h/4096, aspect, meanR, meanG, meanB, luma, contrast]
    assert(math.abs(feats(0) - 32 / 4096.0f) < 1e-6)
    assert(math.abs(feats(1) - 16 / 4096.0f) < 1e-6)
    assert(math.abs(feats(2) - 2.0f) < 1e-6, "aspect ratio 32/16")
    assert(math.abs(feats(3) - 0.5f) < 0.05, s"half-red image → meanR≈0.5, got ${feats(3)}")
    assert(feats(4) < 0.05, s"no green, got ${feats(4)}")
    assert(math.abs(feats(5) - 0.5f) < 0.05, s"half-blue image → meanB≈0.5, got ${feats(5)}")
    assert(feats(7) > 0.05, "red/blue split has nonzero contrast")
  }

  test("real PNG resize: output decodes to the target dimensions with preserved colors") {
    val png = testPng()
    val df = Seq((100L, png, "image")).toDF("media_id", "content", "k")
      .select(col("media_id"), col("content"),
        struct(col("k").as("kind"), lit(32).as("width"), lit(16).as("height"),
          lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("duration_ms")).as("meta"))
    val out = Multimodal.resizeImages(df, 8, 8).collect()(0)
    val m = out.getStruct(out.fieldIndex("meta"))
    assert(m.getInt(1) == 8 && m.getInt(2) == 8)
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]]("content")))
    assert(resized != null, "resized content must be a decodable PNG")
    assert(resized.getWidth == 8 && resized.getHeight == 8)
    val leftPx = resized.getRGB(1, 4)
    val rightPx = resized.getRGB(6, 4)
    assert(((leftPx >> 16) & 0xff) > 200, "left stays red after resize")
    assert((rightPx & 0xff) > 200, "right stays blue after resize")
  }

  test("sampleFrames explodes videos into n frames, skips other kinds") {
    val frames = Multimodal.sampleFrames(media, 4)
    val got = frames.collect().map(r => (r.getLong(0), r.getInt(1)))
    // id 2 is a video with EMPTY content (no frames); id 5 is the real one
    assert(got.map(_._1).toSet == Set(5L), s"only non-empty videos produce frames: ${got.toSeq}")
    assert(got.map(_._2).sorted.sameElements(0 until 4), "4 evenly-indexed frames")
  }

  test("real WAV decode: waveform statistics match the signal's physics") {
    // 440 Hz sine, 200 ms, 16 kHz, amplitude 0.5
    val wav = Multimodal.sineWav(440.0, 200, 16000, amplitude = 0.5)
    val f = new Multimodal.AudioCodec().features(wav)
    assert(f != null && f.length == Multimodal.FeatureDim)
    assert(math.abs(f(0) - 16000.0 / 48000) < 1e-4, s"rate feature: ${f(0)}")
    assert(f(1) == 0.5f, "mono → channels/2 = 0.5")
    assert(math.abs(f(2) - 0.2 / 60) < 1e-3, s"duration feature: ${f(2)}")
    assert(math.abs(f(3) - 0.5 / math.sqrt(2)) < 0.01, s"rms of A*sin ≈ A/sqrt2: ${f(3)}")
    assert(math.abs(f(4) - 0.5) < 0.01, s"peak ≈ amplitude: ${f(4)}")
    // sine crosses zero twice per period → rate ≈ 2*440/16000
    assert(math.abs(f(5) - 2 * 440.0 / 16000) < 0.005, s"zero-cross rate: ${f(5)}")
    assert(math.abs(f(6)) < 0.01, s"dc offset ≈ 0: ${f(6)}")
  }

  test("PngResizer (reused raster/writer) == one-shot resizePng, " +
      "byte-identical across consecutive different images") {
    val codec = new Multimodal.ImageCodec()
    val resizer = new Multimodal.PngResizer(224, 224)
    // consecutive DIFFERENT images through the same reused raster: any
    // pixel leak between rows or writer-state carryover breaks equality
    val imgs = Seq(0x102030 -> 0x405060, 0xFFFFFF -> 0x000000,
      0x7f0000 -> 0x007f00, 0x123456 -> 0x654321).map { case (c1, c2) =>
      Multimodal.bandImage(48, 32, c1, c2)
    }
    imgs.zipWithIndex.foreach { case (img, i) =>
      val viaReuse = resizer.resize(img)
      val oneShot = codec.resizePng(img, 224, 224)
      assert(java.util.Arrays.equals(viaReuse, oneShot),
        s"image $i: reused-state PNG differs from one-shot PNG")
    }
  }

  test("PngResizer: ARGB source with transparent pixels, drawn AFTER a " +
      "different image, is byte-identical to the one-shot path") {
    val codec = new Multimodal.ImageCodec()
    val resizer = new Multimodal.PngResizer(224, 224)
    // prime the reused raster with a bright opaque image — without the
    // per-draw clear, the transparent half of the NEXT source would
    // SRC_OVER-blend with these pixels instead of the fresh-raster black
    resizer.resize(Multimodal.bandImage(48, 32, 0xFFFFFF, 0xFF00FF))
    val argb = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 32; x <- 0 until 48)
      argb.setRGB(x, y, if (x < 24) 0x00000000 else 0x80FF0000)
    val viaReuse = resizer.resize(argb)
    val oneShot = codec.resizePng(argb, 224, 224)
    assert(java.util.Arrays.equals(viaReuse, oneShot),
      "ARGB blend must read fresh-raster black, not the previous image")
  }

  test("direct RIFF parser == javax.sound reference: stats bit-equal on " +
      "canonical WAVs, same rejects on malformed/unsupported bytes") {
    val codec = new Multimodal.AudioCodec()
    // canonical mono PCM16 WAVs across rates/durations/frequencies,
    // including rates above the 48 kHz clamp
    val wavs = for {
      rate <- Seq(8000, 16000, 44100, 96000)
      durMs <- Seq(1, 37, 250)
      freq <- Seq(55.0, 440.0, 1234.5)
    } yield Multimodal.sineWav(freq, durMs, rate)
    // a stereo PCM16 WAV via the JDK writer (sineWav is mono-only)
    val stereo = {
      val n = 800
      val pcm = new Array[Byte](n * 4)
      var i = 0
      while (i < n) {
        val l = (0.4 * math.sin(2 * math.Pi * 300 * i / 8000.0) * 32767).toInt
        val r = (0.2 * math.sin(2 * math.Pi * 700 * i / 8000.0) * 32767).toInt
        pcm(4 * i) = (l & 0xff).toByte; pcm(4 * i + 1) = ((l >> 8) & 0xff).toByte
        pcm(4 * i + 2) = (r & 0xff).toByte; pcm(4 * i + 3) = ((r >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    // an 8-bit WAV: well-formed container, unsupported sample width —
    // BOTH tiers must reject it
    val eightBit = {
      val pcm = Array.tabulate[Byte](400)(i => (128 + 60 *
        math.sin(2 * math.Pi * 200 * i / 8000.0)).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    // hostile: a chunk DECLARING a size near Int.MaxValue — the int
    // chunk walk overflowed `body + sz` to a negative offset that passed
    // the bounds guard and threw ArrayIndexOutOfBounds instead of
    // returning null; the Long walk must end it like a truncated chunk
    val hugeChunk = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(56); b.put("WAVE".getBytes)
      b.put("JUNK".getBytes); b.putInt(Int.MaxValue - 7)
      b.put(new Array[Byte](40))
      b.array()
    }
    val rejects = Seq(
      Array.empty[Byte], "not audio at all".getBytes,
      "RIFFxxxxWAVE".getBytes,                           // header, no chunks
      Multimodal.sineWav(440.0, 100, 16000).take(40),    // truncated mid-header
      eightBit, hugeChunk)
    for ((w, i) <- (wavs ++ Seq(stereo)).zipWithIndex) {
      val fast = codec.features(w)
      val ref = codec.featuresViaJavaxSound(w)
      assert(fast != null && ref != null, s"wav $i decoded by both tiers")
      assert(fast.toSeq == ref.toSeq, s"wav $i: $i parser != javax reference")
    }
    for ((b, i) <- rejects.zipWithIndex) {
      assert(codec.features(b) == null, s"reject $i: parser must return null")
      assert(codec.featuresViaJavaxSound(b) == null,
        s"reject $i: javax reference must return null")
    }
  }

  test("AudioCodec rejects non-WAV bytes; decodeFeatures routes audio rows to it") {
    assert(new Multimodal.AudioCodec().features("not audio".getBytes) == null)
    assert(new Multimodal.AudioCodec().features(Array.empty[Byte]) == null)
    // in the synthetic table, audio rows carry real WAVs: their decoded
    // peak/rms features must show the 0.5-amplitude tone, not stub hashes
    val feats = Multimodal.decodeFeatures(media, "content")
    val audioRows = feats.where(col("meta.kind") === "audio")
      .select("features").collect()
    assert(audioRows.nonEmpty)
    audioRows.foreach { r =>
      val f = r.getSeq[Float](0)
      assert(math.abs(f(4) - 0.5) < 0.01, s"audio row peak: ${f(4)}")
      assert(math.abs(f(3) - 0.5 / math.sqrt(2)) < 0.01, s"audio row rms: ${f(3)}")
    }
  }

  test("MP4 container header: round-trip through build + parse") {
    val payload = "media data payload".getBytes
    val bytes = Multimodal.mp4Bytes(1280, 720, durationMs = 90000,
      timescale = 1000, payload = payload)
    val hdr = new Multimodal.VideoCodec().parse(bytes)
    assert(hdr != null, "well-formed MP4 must parse")
    assert(hdr.brand == "isom")
    assert(hdr.widthPx == 1280 && hdr.heightPx == 720, s"dims: $hdr")
    assert(hdr.timescale == 1000 && hdr.durationMs == 90000, s"duration: $hdr")
    // the mdat slice is exactly the payload
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, hdr.mdatOffset, hdr.mdatOffset + hdr.mdatLength),
      payload))
  }

  test("MP4 parser rejects malformed bytes instead of throwing") {
    val codec = new Multimodal.VideoCodec()
    assert(codec.parse(null) == null)
    assert(codec.parse(Array.empty[Byte]) == null)
    assert(codec.parse("definitely not an mp4 container here".getBytes) == null)
    // truncated container: valid ftyp, then a box whose size overruns
    val good = Multimodal.mp4Bytes(640, 360, 1000, 1000, "x".getBytes)
    assert(codec.parse(java.util.Arrays.copyOfRange(good, 0, 60)) == null)
  }

  test("MP4 parser: first nonzero-dims trak wins; size-0 mdat extends to EOF") {
    def box(typ: String, content: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + content.length)
      bb.putInt(8 + content.length)
      bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(content)
      bb.array()
    }
    def tkhdTrak(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(84) // version-0 tkhd content
      bb.position(76)
      bb.putInt(w << 16); bb.putInt(h << 16)
      box("trak", box("tkhd", bb.array()))
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.position(12); bb.putInt(1000); bb.putInt(5000) // timescale, duration
      box("mvhd", bb.array())
    }
    val ftyp = box("ftyp", "isomxxxxisommp41".getBytes)
    val codec = new Multimodal.VideoCodec()
    // a real MP4 shape: video trak first, then the audio trak whose tkhd
    // dims are 0 — the parser must not let it overwrite the video dims
    val videoThenAudio = ftyp ++ box("moov", mvhd ++ tkhdTrak(1920, 1080) ++ tkhdTrak(0, 0)) ++
      box("mdat", "payload".getBytes)
    val h1 = codec.parse(videoThenAudio)
    assert(h1 != null && h1.widthPx == 1920 && h1.heightPx == 1080, s"$h1")
    // audio trak first: dims come from the later video trak
    val audioThenVideo = ftyp ++ box("moov", mvhd ++ tkhdTrak(0, 0) ++ tkhdTrak(1280, 720)) ++
      box("mdat", "payload".getBytes)
    val h2 = codec.parse(audioThenVideo)
    assert(h2 != null && h2.widthPx == 1280 && h2.heightPx == 720, s"$h2")
    // live-muxed trailing mdat with size 0 (box extends to EOF)
    val sizeZero = videoThenAudio.clone()
    val mdatStart = h1.mdatOffset - 8
    java.nio.ByteBuffer.wrap(sizeZero, mdatStart, 4).putInt(0)
    val h3 = codec.parse(sizeZero)
    assert(h3 != null, "size-0 mdat must parse")
    assert(h3.mdatLength == sizeZero.length - h3.mdatOffset, s"$h3")
    assert(new String(sizeZero, h3.mdatOffset, 7) == "payload")
    // size-1 (64-bit largesize) moov: content must be read AFTER the
    // 16-byte extended header, not at offset 8
    def box64(typ: String, content: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + content.length)
      bb.putInt(1)
      bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putLong(16L + content.length)
      bb.put(content)
      bb.array()
    }
    val moovContent = mvhd ++ tkhdTrak(1920, 1080)
    val large = ftyp ++ box64("moov", moovContent) ++ box("mdat", "payload".getBytes)
    val h4 = codec.parse(large)
    assert(h4 != null, "size-1 moov must parse")
    assert(h4.widthPx == 1920 && h4.heightPx == 1080 && h4.brand == "isom", s"$h4")
    // fragmented file with two mdats: the FIRST one is the payload
    // sampleFrames slices — last-wins would point at the second
    val twoMdat = ftyp ++ box("moov", mvhd ++ tkhdTrak(640, 480)) ++
      box("mdat", "first".getBytes) ++ box("mdat", "second".getBytes)
    val h5 = codec.parse(twoMdat)
    assert(h5 != null && new String(twoMdat, h5.mdatOffset, h5.mdatLength) == "first", s"$h5")
    // an exotic nested box (size-1 convention INSIDE moov, unhandled
    // there) must not reject the file: parsing keeps what it already
    // read (mvhd) and stops walking that container
    val weirdNested = ftyp ++
      box("moov", mvhd ++ box64("free", new Array[Byte](4)) ++ tkhdTrak(1920, 1080)) ++
      box("mdat", "payload".getBytes)
    val h6 = codec.parse(weirdNested)
    assert(h6 != null && h6.timescale == 1000 && h6.durationMs == 5000, s"$h6")
    assert(new String(weirdNested, h6.mdatOffset, h6.mdatLength) == "payload")
  }

  test("video rows carry real MP4s: header features and mdat-sliced frames") {
    // synthetic video rows must parse, and their features must reflect
    // the SEEDED header values, not byte-hash stub output
    val vids = Multimodal.decodeFeatures(media, "content")
      .where(col("meta.kind") === "video")
      .select("media_id", "meta.width", "meta.duration_ms", "features").collect()
    assert(vids.nonEmpty)
    vids.foreach { r =>
      val w = r.getInt(1); val durMs = r.getInt(2)
      val f = r.getSeq[Float](3)
      assert(math.abs(f(0) - (w / 4096.0f).min(1f)) < 1e-6, s"width feature: $r")
      assert(math.abs(f(3) - (durMs / 60000.0).min(1.0)) < 1e-6, s"duration feature: $r")
      assert(math.abs(f(2) - 16f / 9f) < 1e-3, s"synthetic aspect is 16:9: $r")
    }
    // frames for id 5 are ACTUAL MJPEG samples located through the stbl
    // frame index — each one a standalone JPEG at the coded dims
    // (display/10), never header bytes or arbitrary slices
    val frames = Multimodal.sampleFrames(media, 4)
      .where(col("media_id") === 5L).orderBy(col("frame_idx")).collect()
    assert(frames.length == 4)
    val codec = new Multimodal.ImageCodec
    frames.foreach { r =>
      val img = codec.decode(r.getAs[Array[Byte]]("frame"))
      assert(img != null, "every sampled frame must decode as a JPEG")
      // id 5: display 640x360 (5%4=1 → 960x540? see vidW formula) —
      // just pin the spec-sanctioned display/10 relation via the header
      val hdr = new Multimodal.VideoCodec().parse(
        media.where(col("media_id") === 5L).select("content")
          .collect()(0).getAs[Array[Byte]](0))
      assert(img.getWidth == hdr.widthPx / 10 && img.getHeight == hdr.heightPx / 10,
        s"coded dims are display/10: ${img.getWidth}x${img.getHeight} vs ${hdr.widthPx}x${hdr.heightPx}")
    }
  }

  test("MJPEG mux → stbl parse → sample slice reproduces the frame bytes exactly") {
    val f1 = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(Multimodal.bandImage(64, 36, 0xff0000, 0x00ff00), "jpg", baos)
      baos.toByteArray
    }
    val f2 = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(Multimodal.bandImage(64, 36, 0x0000ff, 0xffffff), "jpg", baos)
      baos.toByteArray
    }
    val bytes = Multimodal.mjpegMp4Bytes(640, 360, durationMs = 2000,
      timescale = 1000, codedW = 64, codedH = 36, frames = Array(f1, f2))
    val hdr = new Multimodal.VideoCodec().parse(bytes)
    assert(hdr != null, "MJPEG container must parse")
    assert(hdr.codec == "jpeg", s"stsd fourcc: ${hdr.codec}")
    assert(hdr.sampleCount == 2)
    assert(hdr.sampleSizes.sameElements(Array(f1.length, f2.length)), "stsz sizes")
    assert(hdr.widthPx == 640 && hdr.heightPx == 360, "tkhd display dims")
    assert(hdr.durationMs == 2000)
    val (o1, l1) = hdr.sampleRange(0)
    val (o2, l2) = hdr.sampleRange(1)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, o1, o1 + l1), f1), "sample 0 bytes")
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, o2, o2 + l2), f2), "sample 1 bytes")
    // stco must point INSIDE mdat (after its header), samples contiguous
    assert(o1 == hdr.mdatOffset && o2 == o1 + l1)
  }

  test("decodeFrameFeatures: real per-frame JPEG decode matches the sidecar") {
    val rows = Multimodal.decodeFrameFeatures(media, 4).collect()
    // id 2 is an empty video (no samples); id 5 has 4 samples → 4 frames
    assert(rows.map(_.getLong(0)).toSet == Set(5L))
    assert(rows.length == 4)
    val expected = media.where(col("media_id") === 5L)
      .select("expected_frames").collect()(0)
      .getSeq[scala.collection.Seq[Float]](0)
    rows.foreach { r =>
      assert(r.getString(3) == "jpeg")
      val si = r.getInt(2)
      val feats = r.getSeq[Float](4)
      assert(feats.length == Multimodal.FeatureDim)
      // generation-time decode of the same bytes → bit-identical floats
      assert(feats == expected(si), s"frame $si features: $feats vs ${expected(si)}")
    }
  }

  test("batched execution: batch boundaries do not change results") {
    val big = Multimodal.syntheticMediaTable(
      (0 until 300).map(i => (i.toLong, s"content number $i")).toDF("doc_id", "text"))
    val one = Multimodal.decodeFeatures(big.repartition(1), "content")
      .select("media_id", "features").collect().map(_.toString).sorted
    val many = Multimodal.decodeFeatures(big.repartition(7), "content")
      .select("media_id", "features").collect().map(_.toString).sorted
    assert(one.sameElements(many))
  }
}
