package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, processed by batched partition
  * maps (the Scala analogue of `mapInPandas`-style vectorized UDFs).
  *
  * The IMAGE path is real: PNG/JPEG/GIF/BMP decode, pixel feature
  * extraction and resize run on `javax.imageio` + `BufferedImage`.
  * The AUDIO path is real too: WAV/PCM16 decode + waveform statistics on
  * `javax.sound.sampled` (both JDK built-ins, zero extra dependencies).
  * The VIDEO path parses the REAL ISO-BMFF (MP4) container — box-tree
  * walk over ftyp/moov/mvhd/trak/tkhd/mdat for dimensions, duration,
  * timescale, and payload layout, plus the mdia→minf→stbl SAMPLE TABLE
  * (stsd codec fourcc, stsz sample sizes, stco chunk offset) that
  * locates every frame's byte range ([[VideoCodec]]). Frame DECODE is
  * real for Motion-JPEG tracks ([[decodeFrameFeatures]] — each sample
  * is a standalone JPEG `javax.imageio` reads); other codecs (H.264,
  * VP9, …) have no JDK decoder and emit nothing — a deployment plugs
  * ffmpeg/JNI into the same batched partition map. Bytes no
  * parser reads fall back to [[DecodeStub]]/[[ResizeStub]],
  * deterministic byte-derived fakes, so synthetic fixtures and foreign
  * blobs flow through the same plumbing instead of killing the task. Everything
  * Spark-side is shared: the schema convention, the batched
  * mapPartitions execution (fixed batch shape, one codec init per
  * partition — the pattern that amortizes decoder setup at scale),
  * partition sizing, and the output feature schema.
  */
object Multimodal {

  /** Real JDK image codec; one instance per partition/task. */
  final class ImageCodec extends Serializable {
    // ImageIO's default ImageInputStream is DISK-cached: every decode
    // writes the stream to a temp file first. For in-memory byte arrays
    // that is pure overhead (and temp-dir churn across 32 concurrent
    // tasks); the in-memory stream cuts per-image decode cost ~2x.
    javax.imageio.ImageIO.setUseCache(false)
    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      if (bytes == null || bytes.length == 0) null
      else try {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      } catch { case _: java.io.IOException => null }
    }

    /** FeatureDim pixel statistics from up to a 64×64 sample grid:
      * [w/4096, h/4096, aspect, meanR, meanG, meanB, luma, rms-contrast]. */
    def features(img: java.awt.image.BufferedImage): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      val sx = math.max(1, w / 64)
      val sy = math.max(1, h / 64)
      var r = 0.0; var g = 0.0; var b = 0.0
      var luma = 0.0; var luma2 = 0.0
      var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          val pr = (px >> 16) & 0xff
          val pg = (px >> 8) & 0xff
          val pb = px & 0xff
          val l = 0.2126 * pr + 0.7152 * pg + 0.0722 * pb
          r += pr; g += pg; b += pb; luma += l; luma2 += l * l
          n += 1
          x += sx
        }
        y += sy
      }
      val inv = 1.0 / (255.0 * n)
      val ml = luma / n
      val contrast = math.sqrt(math.max(0.0, luma2 / n - ml * ml)) / 255.0
      Array((w / 4096.0f).min(1f), (h / 4096.0f).min(1f), (w.toFloat / h).min(8f),
        (r * inv).toFloat, (g * inv).toFloat, (b * inv).toFloat,
        (ml / 255.0).toFloat, contrast.toFloat)
    }

    /** Bilinear resize, re-encoded as PNG. */
    def resizePng(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = out.createGraphics()
      gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gfx.drawImage(img, 0, 0, w, h, null)
      gfx.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** Fixed-size PNG resizer with REUSED per-partition state: one
    * destination raster, one Graphics2D, one cached PNG ImageWriter, one
    * output buffer — `ImageIO.write` re-runs writer-SPI lookup and
    * allocates a fresh writer + 200 KB dest raster per call, pure
    * per-row machinery on a fixed-target resize scan. The deflate of the
    * encoded PNG is the inherent floor (the output must be a REAL PNG —
    * q_multimodal_pipeline checks the IHDR dims). Each draw first clears
    * the raster back to the fresh-raster state (see [[resize]]) so reuse
    * never leaks pixels between rows — even for ARGB sources, whose
    * SRC_OVER blend reads the destination; MultimodalSpec pins
    * byte-identical output vs the one-shot [[ImageCodec.resizePng]] path
    * including a transparent ARGB source drawn after another image. NOT
    * thread-safe — one instance per partition/task, like the codecs. */
  final class PngResizer(w: Int, h: Int) {
    private val dest = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    private val gfx = dest.createGraphics()
    gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val baos = new java.io.ByteArrayOutputStream(64 * 1024)

    def resize(img: java.awt.image.BufferedImage): Array[Byte] = {
      // Restore the fresh-raster state (all-zero = opaque black) before
      // drawing: PNGs with an alpha channel decode as ARGB and SRC_OVER
      // blends them with whatever the raster holds — without the clear,
      // a (semi-)transparent source blends with the PREVIOUS row's
      // pixels, making output row-order-dependent. With it, the blend is
      // over black exactly like the one-shot [[ImageCodec.resizePng]]'s
      // zeroed raster (MultimodalSpec pins byte-identity on an ARGB
      // source drawn after a different image). An opaque fillRect is a
      // plain raster write — trivial next to the PNG deflate.
      gfx.setColor(java.awt.Color.BLACK)
      gfx.fillRect(0, 0, w, h)
      gfx.drawImage(img, 0, 0, w, h, null)
      baos.reset()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(dest)
      ios.close()
      baos.toByteArray
    }
  }

  /** WAV/PCM16 audio codec; one instance per partition/task.
    *
    * The SCAN path parses the RIFF container directly and computes the
    * sample statistics in place over the binary column — zero copies,
    * zero stream wrappers, zero provider machinery.
    * `javax.sound.sampled` is NOT on the scan path anymore:
    * `AudioSystem.getAudioInputStream` walks the AudioFileReader SPI
    * list per call (each provider parses the header behind shared
    * registry state), and with 32 concurrent tasks that was ~10 ms and
    * two PCM-sized copies (`readAllBytes`) PER ROW — 54 s of
    * q_multimodal_decode's 59 s at the 100× fixture, all of it codec
    * bookkeeping, none of it sample math. The JDK decoder stays as the
    * parity reference: [[featuresViaJavaxSound]] is spec-pinned equal to
    * this parser on canonical WAVs and on rejection cases
    * (MultimodalSpec).
    *
    * Contract (same as the javax.sound tier it replaced): canonical
    * little-endian RIFF/WAVE with a PCM(1) 16-bit `fmt ` chunk → stats;
    * anything else (compressed, big-endian AIFF, WAVE_EXTENSIBLE,
    * truncated header, garbage) → null. */
  final class AudioCodec extends Serializable {

    @inline private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    @inline private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    @inline private def tag(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    /** Decodes WAV bytes to FeatureDim audio statistics:
      * [rate/48k, channels/2, dur_s/60, rms, peak, zero-cross rate,
      * dc-offset, mean-abs]. Returns null for non-WAV / non-PCM16 bytes. */
    def features(bytes: Array[Byte]): Array[Float] = {
      if (bytes == null || bytes.length < 44) return null
      if (tag(bytes, 0) != 0x52494646 /* RIFF */ ||
        tag(bytes, 8) != 0x57415645 /* WAVE */) return null
      // chunk walk: find fmt (PCM=1, 16-bit, little-endian by format) and data
      var off = 12
      var rate = 0; var channels = 0; var haveFmt = false
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= bytes.length && (dataOff < 0 || !haveFmt)) {
        val id = tag(bytes, off)
        val sz = le32(bytes, off + 4)
        if (sz < 0) return null // >2 GB chunk: not a WAV we trust
        val body = off + 8
        if (id == 0x666d7420 /* fmt  */ && body + 16 <= bytes.length) {
          val codec = le16(bytes, body)
          val bits = le16(bytes, body + 14)
          if (codec != 1 || bits != 16) return null // non-PCM16 (incl. WAVE_EXT)
          channels = le16(bytes, body + 2)
          rate = le32(bytes, body + 4)
          if (channels <= 0 || rate <= 0) return null
          haveFmt = true
        } else if (id == 0x64617461 /* data */) {
          dataOff = body
          dataLen = math.min(sz, bytes.length - body)
        }
        // chunks are word-aligned; advance in Long — a hostile chunk size
        // near Int.MaxValue overflows the int add to a negative offset
        // that passes the `off + 8 <= length` guard and then indexes out
        // of bounds. A next-offset past the buffer ends the walk exactly
        // like an honestly truncated trailing chunk.
        val next = body.toLong + sz + (sz & 1)
        off = if (next > bytes.length) bytes.length else next.toInt
      }
      if (!haveFmt || dataOff < 0) return null
      val n = dataLen / 2
      if (n == 0) return null
      var sum = 0.0; var sumAbs = 0.0; var sum2 = 0.0
      var peak = 0.0; var crossings = 0L
      var prev = 0.0
      var i = 0
      while (i < n) {
        val s = (((bytes(dataOff + 2 * i + 1) << 8) |
          (bytes(dataOff + 2 * i) & 0xff)).toShort) / 32768.0
        sum += s; sumAbs += math.abs(s); sum2 += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > 0 && (s > 0) != (prev > 0)) crossings += 1
        prev = s
        i += 1
      }
      // float intermediates mirror featuresViaJavaxSound bit-for-bit
      // (getSampleRate is a Float there), so the parity pin is exact
      val rateF = rate.toFloat
      val frames = n / channels
      val durS = frames / rateF
      Array((rateF / 48000.0f).min(1f), channels / 2.0f,
        (durS / 60.0).min(1.0).toFloat,
        math.sqrt(sum2 / n).toFloat, peak.toFloat,
        (crossings.toDouble / n).toFloat,
        (sum / n).toFloat, (sumAbs / n).toFloat)
    }

    /** The previous javax.sound.sampled implementation, kept as the
      * PARITY REFERENCE for the direct RIFF parser (MultimodalSpec pins
      * features == featuresViaJavaxSound on canonical WAVs and on
      * rejects). Not on any query path: per-call SPI discovery + two
      * PCM-size copies made it ~10 ms/row under 32 threads. */
    private[operators] def featuresViaJavaxSound(bytes: Array[Byte]): Array[Float] = {
      if (bytes == null || bytes.length == 0) return null
      var in: javax.sound.sampled.AudioInputStream = null
      try {
        in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          || fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return null
        val data = in.readAllBytes()
        val n = data.length / 2
        if (n == 0) return null
        var sum = 0.0; var sumAbs = 0.0; var sum2 = 0.0
        var peak = 0.0; var crossings = 0L
        var prev = 0.0
        var i = 0
        while (i < n) {
          val s = (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort) / 32768.0
          sum += s; sumAbs += math.abs(s); sum2 += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0 && (s > 0) != (prev > 0)) crossings += 1
          prev = s
          i += 1
        }
        val rate = fmt.getSampleRate
        val frames = n / fmt.getChannels
        val durS = frames / rate
        Array((rate / 48000.0f).min(1f), fmt.getChannels / 2.0f,
          (durS / 60.0).min(1.0).toFloat,
          math.sqrt(sum2 / n).toFloat, peak.toFloat,
          (crossings.toDouble / n).toFloat,
          (sum / n).toFloat, (sumAbs / n).toFloat)
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      } finally if (in != null) in.close()
    }
  }

  /** Renders a 16-bit mono PCM sine tone as WAV bytes (fixture helper —
    * also what [[syntheticMediaTable]] embeds in audio rows so the
    * registered queries exercise the real `javax.sound.sampled` path). */
  def sineWav(freqHz: Double, durMs: Int, sampleRate: Int = 16000,
      amplitude: Double = 0.5): Array[Byte] = {
    val n = math.max(1, (sampleRate.toLong * durMs / 1000).toInt)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Parsed MP4/ISO-BMFF container header: dimensions from `tkhd`,
    * duration/timescale from `mvhd`, payload location from `mdat`, and —
    * when the track carries a sample table (`stbl`) — the codec fourcc
    * from `stsd`, per-sample byte sizes from `stsz`, and the chunk
    * offset from `stco`, which together locate every FRAME's exact byte
    * range inside the file (the real ISO-BMFF frame index). */
  final case class Mp4Header(brand: String, widthPx: Int, heightPx: Int,
      timescale: Long, duration: Long, mdatOffset: Int, mdatLength: Int,
      codec: String = null, sampleSizes: Array[Int] = null,
      chunkOffset: Int = -1) {
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
    def sampleCount: Int = if (sampleSizes == null) 0 else sampleSizes.length
    /** Prefix-summed sample offsets in long arithmetic (entry i = start
      * of sample i; entry n = end of the last sample), computed once —
      * sampling n frames is O(1) per lookup instead of O(i), and the
      * sum can't overflow Int on adversarial stsz entries. */
    @transient private lazy val sampleOffsets: Array[Long] = {
      val n = sampleCount
      val off = new Array[Long](n + 1)
      off(0) = chunkOffset.toLong
      var j = 0
      while (j < n) { off(j + 1) = off(j) + sampleSizes(j); j += 1 }
      off
    }
    /** (offset, length) of sample `i` — consecutive samples in one chunk,
      * the layout `stsc` declares for the single-chunk files we mux.
      * Offsets fit in Int because [[VideoCodec.parse]] only keeps a
      * sample table whose full extent it validated against the file
      * length. */
    def sampleRange(i: Int): (Int, Int) = (sampleOffsets(i).toInt, sampleSizes(i))
  }

  /** Real ISO-BMFF (MP4) container-header codec: box-tree walking over
    * `ftyp`/`moov`/`mvhd`/`trak`/`tkhd`/`mdat`. This is how a media
    * pipeline PROBES video at scale — dimensions, duration, and payload
    * layout come from ~100 header bytes without touching a frame
    * decoder. FRAME decode stays out of scope (the JDK ships no video
    * codec; a deployment would plug ffmpeg/JNI into the same batched
    * partition map — see [[sampleFrames]]). */
  final class VideoCodec extends Serializable {
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walks the plain (size32 + type) child boxes of `[start, end)`,
      * invoking `f(tag, contentStart, contentEnd)`. Stops at the first
      * box using the size-0/size-1 conventions (only handled at top
      * level) — keeping what was already yielded, same policy as the
      * moov walk. */
    private def walkChildren(b: Array[Byte], start: Int, end: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var c = start
      var ok = true
      while (ok && c + 8 <= end) {
        val cs = u32(b, c)
        if (cs < 8 || c + cs > end) ok = false
        else {
          f(tag(b, c), c + 8, c + cs.toInt)
          c += cs.toInt
        }
      }
    }

    /** Walks the top-level (and moov-nested) box tree; returns null for
      * bytes that are not a well-formed MP4 header. Only version-0
      * (32-bit) mvhd/tkhd tables are handled — the synthetic fixtures
      * and the overwhelming share of real files. */
    def parse(bytes: Array[Byte]): Mp4Header = {
      if (bytes == null || bytes.length < 16) return null
      if (tag(bytes, 0) != "ftyp") return null
      var brand: String = null
      var w = 0; var h = 0
      var timescale = 0L; var duration = -1L
      var mdatOff = -1; var mdatLen = -1
      var codec: String = null
      var sampleSizes: Array[Int] = null
      var chunkOff = -1
      var o = 0
      try {
        while (o + 8 <= bytes.length) {
          val size32 = u32(bytes, o)
          // ISO-BMFF size conventions real muxers use: size 0 = box
          // extends to EOF (live-muxed trailing mdat), size 1 = 64-bit
          // largesize follows the type (files > 4 GB)
          val (size, hdrLen) =
            if (size32 == 0) ((bytes.length - o).toLong, 8)
            else if (size32 == 1) {
              if (o + 16 > bytes.length) return null
              ((u32(bytes, o + 8) << 32) | u32(bytes, o + 12), 16)
            } else (size32, 8)
          if (size < hdrLen || o + size > bytes.length) return null
          // content starts AFTER the (possibly extended) header for
          // every box type — reading at o+8 under a size-1 box would
          // consume the largesize field as content
          val content = o + hdrLen
          tag(bytes, o) match {
            case "ftyp" =>
              if (size < hdrLen + 4) return null
              brand = new String(bytes, content, 4,
                java.nio.charset.StandardCharsets.US_ASCII)
            case "mdat" if mdatOff < 0 =>
              // FIRST mdat wins: fragmented files carry several, and
              // [[sampleFrames]] slices a single payload — first matches
              // the track the synthetic muxer (and most progressive
              // files) lay down first
              mdatOff = content
              mdatLen = (size - hdrLen).toInt
            case "moov" =>
              var c = content
              val end = o + size.toInt
              var nestedOk = true
              while (nestedOk && c + 8 <= end) {
                val cs = u32(bytes, c)
                // nested boxes using the size-0 (to-EOF) / size-1
                // (64-bit largesize) conventions are only handled at top
                // level; inside moov, stop walking the REMAINDER of this
                // container but keep what top-level parsing already
                // yielded — rejecting the whole file over one exotic
                // nested box would silently degrade a real fragmented
                // file to the stub path
                if (cs < 8 || c + cs > end) { nestedOk = false }
                else tag(bytes, c) match {
                  case "mvhd" if bytes(c + 8) == 0 => // version 0
                    timescale = u32(bytes, c + 20)
                    duration = u32(bytes, c + 24)
                  case "trak" =>
                    walkChildren(bytes, c + 8, c + cs.toInt) { (tt, ts, te) =>
                      if (tt == "tkhd" && bytes(ts) == 0 && te - ts >= 84) {
                        // width/height are 16.16 fixed point at the tail.
                        // Keep the FIRST trak with nonzero dims: a real
                        // MP4 carries an audio trak after the video one,
                        // and its tkhd dims are 0 — last-wins would
                        // report a 0x0 video.
                        val tw = (u32(bytes, te - 8) >> 16).toInt
                        val th = (u32(bytes, te - 4) >> 16).toInt
                        if (w == 0 && h == 0 && (tw != 0 || th != 0)) {
                          w = tw; h = th
                        }
                      } else if (tt == "mdia" && sampleSizes == null) {
                        // descend mdia → minf → stbl for the FRAME INDEX:
                        // stsd carries the codec fourcc, stsz the
                        // per-sample byte sizes, stco the chunk offset —
                        // together they locate every frame without
                        // touching a decoder. First video trak wins
                        // (same policy as dims/mdat).
                        walkChildren(bytes, ts, te) { (mt, ms, me) =>
                          if (mt == "minf") walkChildren(bytes, ms, me) { (nt, ns, ne) =>
                            if (nt == "stbl") walkChildren(bytes, ns, ne) { (st, ss, se) =>
                              st match {
                                case "stsd" if se - ss >= 16 =>
                                  // entry_count then the first sample
                                  // entry; its TYPE is the codec fourcc
                                  if (u32(bytes, ss + 4) >= 1) codec = tag(bytes, ss + 8)
                                case "stsz" if se - ss >= 12 =>
                                  val fixed = u32(bytes, ss + 4)
                                  val n = u32(bytes, ss + 8).toInt
                                  if (n >= 0 && n < (1 << 20)) {
                                    val sz = new Array[Int](n)
                                    var i = 0
                                    var okSz = true
                                    while (i < n) {
                                      if (fixed != 0) sz(i) = fixed.toInt
                                      else if (ss + 12 + 4 * i + 4 <= se)
                                        sz(i) = u32(bytes, ss + 12 + 4 * i).toInt
                                      else okSz = false
                                      i += 1
                                    }
                                    if (okSz) sampleSizes = sz
                                  }
                                case "stco" if se - ss >= 12 =>
                                  if (u32(bytes, ss + 4) >= 1)
                                    chunkOff = u32(bytes, ss + 8).toInt
                                case _ =>
                              }
                            }
                          }
                        }
                      }
                    }
                  case _ =>
                }
                c += cs.toInt
              }
            case _ =>
          }
          o += size.toInt
        }
      } catch { case _: IndexOutOfBoundsException => return null }
      // Validate the sample table against the FILE before trusting it:
      // a truncated or malformed file (moov intact, mdat short, garbage
      // stsz entries) must flow through the bounds-safe mdat-slice
      // fallback, not kill the task slicing past the array. Long
      // arithmetic so hostile sizes can't wrap the check itself.
      if (sampleSizes != null) {
        var ok = chunkOff >= 0
        var ext = chunkOff.toLong
        var i = 0
        while (ok && i < sampleSizes.length) {
          if (sampleSizes(i) < 0) ok = false else ext += sampleSizes(i)
          i += 1
        }
        if (!ok || ext > bytes.length) { sampleSizes = null; chunkOff = -1 }
      }
      if (brand == null || duration < 0) null
      else Mp4Header(brand, w, h, timescale, duration, mdatOff, mdatLen,
        codec, sampleSizes, chunkOff)
    }

    /** FeatureDim statistics from the parsed header:
      * [w/4096, h/4096, aspect, dur_s/60, timescale/90k, mdat-fraction,
      * log10(container bytes)/8, brand-hash/65536]. */
    def features(hdr: Mp4Header, totalBytes: Int): Array[Float] = {
      val aspect = if (hdr.heightPx > 0) hdr.widthPx.toFloat / hdr.heightPx else 0f
      var bh = 0
      var i = 0
      while (i < hdr.brand.length) { bh = bh * 31 + hdr.brand.charAt(i); i += 1 }
      Array((hdr.widthPx / 4096.0f).min(1f), (hdr.heightPx / 4096.0f).min(1f),
        aspect.min(8f), (hdr.durationMs / 60000.0).min(1.0).toFloat,
        (hdr.timescale / 90000.0f).min(1f),
        if (totalBytes > 0 && hdr.mdatLength > 0) hdr.mdatLength.toFloat / totalBytes else 0f,
        (math.log10(math.max(totalBytes, 1)) / 8.0).toFloat,
        ((bh & 0xffff) / 65536.0f))
    }
  }

  /** Builds a minimal valid MP4: `ftyp` + `moov`(`mvhd`+`trak`(`tkhd`)) +
    * `mdat` carrying `payload`. Fixture helper — what
    * [[syntheticMediaTable]] embeds in video rows, so the registered
    * queries exercise the REAL container-header path. */
  def mp4Bytes(widthPx: Int, heightPx: Int, durationMs: Int,
      timescale: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 + 8 + 108 + 8 + 92 + 8 +
      (if (payload == null) 0 else payload.length))
    def box(size: Int, typ: String): Unit = {
      bb.putInt(size)
      bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    box(24, "ftyp")
    bb.put("isom".getBytes); bb.putInt(0); bb.put("isom".getBytes); bb.put("mp41".getBytes)
    val duration = (durationMs.toLong * timescale / 1000L).toInt
    box(8 + 108 + 8 + 92, "moov")
    box(108, "mvhd")
    bb.putInt(0)               // version 0 + flags
    bb.putInt(0); bb.putInt(0) // ctime, mtime
    bb.putInt(timescale); bb.putInt(duration)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)  // rate, volume
    bb.putInt(0); bb.putInt(0) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    (1 to 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(2)               // next track id
    box(8 + 92, "trak")
    box(92, "tkhd")
    bb.putInt(0)               // version 0 + flags
    bb.putInt(0); bb.putInt(0) // ctime, mtime
    bb.putInt(1)               // track id
    bb.putInt(0)               // reserved
    bb.putInt(duration)
    bb.putInt(0); bb.putInt(0) // reserved
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0) // layer/group/volume/rsvd
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    bb.putInt(widthPx << 16); bb.putInt(heightPx << 16) // 16.16 fixed
    val n = if (payload == null) 0 else payload.length
    box(8 + n, "mdat")
    if (n > 0) bb.put(payload)
    bb.array()
  }

  /** Builds a Motion-JPEG MP4 with a REAL sample table: `ftyp` +
    * `moov`(`mvhd` + `trak`(`tkhd` + `mdia`(`mdhd` + `hdlr` +
    * `minf`(`vmhd` + `dinf`/`dref` + `stbl`(`stsd`('jpeg') + `stts` +
    * `stsc` + `stsz` + `stco`))))) + `mdat` holding the concatenated
    * JPEG frames as one chunk. MJPEG is the one video codec the JDK can
    * actually decode (each sample is a standalone JPEG — `javax.imageio`
    * reads it), so this container makes the END-TO-END frame path real:
    * mux → stbl parse → sample slice → frame decode → pixels.
    *
    * `widthPx`/`heightPx` are the tkhd DISPLAY dims; `codedW`/`codedH`
    * are the stsd coded dims — the spec-sanctioned split (tkhd carries
    * the presentation matrix target, the sample entry the pixel
    * buffer). */
  def mjpegMp4Bytes(widthPx: Int, heightPx: Int, durationMs: Int,
      timescale: Int, codedW: Int, codedH: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    val nS = frames.length
    val mdatLen = frames.map(_.length).sum
    val stsdSz = 8 + 8 + 86        // vf + entry_count + VisualSampleEntry
    val sttsSz = 8 + 8 + 8
    val stscSz = 8 + 8 + 12
    val stszSz = 8 + 12 + 4 * nS
    val stcoSz = 8 + 12
    val stblSz = 8 + stsdSz + sttsSz + stscSz + stszSz + stcoSz
    val vmhdSz = 8 + 12
    val drefSz = 8 + 8 + 12        // vf + entry_count + self-contained url
    val dinfSz = 8 + drefSz
    val minfSz = 8 + vmhdSz + dinfSz + stblSz
    val mdhdSz = 8 + 24
    val hdlrSz = 8 + 25
    val mdiaSz = 8 + mdhdSz + hdlrSz + minfSz
    val trakSz = 8 + 92 + mdiaSz
    val moovSz = 8 + 108 + trakSz
    val chunkOff = 24 + moovSz + 8 // ftyp + moov + mdat header
    val bb = java.nio.ByteBuffer.allocate(24 + moovSz + 8 + mdatLen)
    def box(size: Int, typ: String): Unit = {
      bb.putInt(size)
      bb.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    val duration = (durationMs.toLong * timescale / 1000L).toInt
    box(24, "ftyp")
    bb.put("isom".getBytes); bb.putInt(0); bb.put("isom".getBytes); bb.put("mp41".getBytes)
    box(moovSz, "moov")
    box(108, "mvhd")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(timescale); bb.putInt(duration)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
    bb.putInt(0); bb.putInt(0)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    (1 to 6).foreach(_ => bb.putInt(0))
    bb.putInt(2)
    box(trakSz, "trak")
    box(92, "tkhd")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(1); bb.putInt(0); bb.putInt(duration)
    bb.putInt(0); bb.putInt(0)
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    bb.putInt(widthPx << 16); bb.putInt(heightPx << 16)
    box(mdiaSz, "mdia")
    box(mdhdSz, "mdhd")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(timescale); bb.putInt(duration)
    bb.putShort(0x55c4.toShort); bb.putShort(0) // language "und", pre_defined
    box(hdlrSz, "hdlr")
    bb.putInt(0); bb.putInt(0)
    bb.put("vide".getBytes)
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.put(0.toByte)                            // empty name
    box(minfSz, "minf")
    box(vmhdSz, "vmhd")
    bb.putInt(1)                                // version 0, flags 1 (spec)
    bb.putShort(0)                              // graphicsmode
    bb.putShort(0); bb.putShort(0); bb.putShort(0) // opcolor r/g/b
    box(dinfSz, "dinf")
    box(drefSz, "dref")
    bb.putInt(0); bb.putInt(1)
    box(12, "url "); bb.putInt(1)               // flag 1: media in this file
    box(stblSz, "stbl")
    box(stsdSz, "stsd")
    bb.putInt(0); bb.putInt(1)
    box(86, "jpeg")                             // VisualSampleEntry
    bb.putInt(0); bb.putShort(0); bb.putShort(1)        // reserved + data_ref_index
    bb.putShort(0); bb.putShort(0)                       // pre_defined + reserved
    bb.putInt(0); bb.putInt(0); bb.putInt(0)             // pre_defined[3]
    bb.putShort(codedW.toShort); bb.putShort(codedH.toShort)
    bb.putInt(0x00480000); bb.putInt(0x00480000)         // 72 dpi
    bb.putInt(0)
    bb.putShort(1)                                       // frame_count
    bb.put(new Array[Byte](32))                          // compressorname
    bb.putShort(24); bb.putShort(0xffff.toShort)         // depth, pre_defined
    box(sttsSz, "stts")
    bb.putInt(0); bb.putInt(1)
    bb.putInt(nS); bb.putInt(if (nS == 0) 0 else duration / math.max(nS, 1))
    box(stscSz, "stsc")
    bb.putInt(0); bb.putInt(1)
    bb.putInt(1); bb.putInt(math.max(nS, 1)); bb.putInt(1)
    box(stszSz, "stsz")
    bb.putInt(0); bb.putInt(0); bb.putInt(nS)
    frames.foreach(f => bb.putInt(f.length))
    box(stcoSz, "stco")
    bb.putInt(0); bb.putInt(1); bb.putInt(chunkOff)
    box(8 + mdatLen, "mdat")
    frames.foreach(bb.put)
    bb.array()
  }

  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),        // "image" | "audio" | "video"
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType)))

  val BatchSize = 64
  val FeatureDim = 8

  /** Fallback decode for bytes [[ImageCodec]] cannot read (audio/video —
    * no JDK codec — and synthetic fixtures): a deterministic
    * FeatureDim-float vector derived from the content bytes, keeping the
    * pipeline total and testable on any input. */
  final class DecodeStub extends Serializable {
    def decodeBatch(contents: Array[Array[Byte]]): Array[Array[Float]] =
      contents.map { bytes =>
        val out = new Array[Float](FeatureDim)
        if (bytes != null) {
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < bytes.length) {
            h ^= (bytes(i) & 0xffL)
            h *= 0x100000001b3L
            out(i % FeatureDim) += ((h >>> 40).toInt & 0xffff) / 65536.0f
            i += 1
          }
        }
        out
      }
  }

  /** Attaches a `features array<float>` column by decoding the binary
    * column in fixed-size batches per partition. Real images get pixel
    * statistics from [[ImageCodec]]; everything else falls back to the
    * byte-derived stub. Schema change via mapPartitions + explicit
    * RowEncoder (the S7 pattern). */
  def decodeFeatures(df: DataFrame, contentCol: String): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType), nullable = false))
    val contentIdx = df.schema.fieldIndex(contentCol)
    // Only take the typed fast path when the "meta" column really is a
    // struct with a StringType "kind" field (looked up by name, not
    // ordinal): a caller DataFrame with an unrelated column that merely
    // shares the name must fall through to the cascade, not CCE.
    val (metaIdx, kindIdx) = {
      val mi = df.schema.fieldNames.indexOf("meta")
      if (mi < 0) (-1, -1)
      else df.schema(mi).dataType match {
        case st: StructType =>
          val ki = st.fieldNames.indexOf("kind")
          if (ki >= 0 && st(ki).dataType == StringType) (mi, ki) else (-1, -1)
        case _ => (-1, -1)
      }
    }
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val codec = new ImageCodec // one init per partition/task
      val audio = new AudioCodec
      val video = new VideoCodec
      val fallback = new DecodeStub
      // full try-cascade for rows without a typed kind: image reader
      // DISCOVERY runs over every candidate format before failing, so
      // paying it on rows the metadata already types was measurable
      // (~1/3 of decode cost at the 20x probe)
      def cascade(bytes: Array[Byte]): Array[Float] = {
        val img = codec.decode(bytes)
        if (img != null) codec.features(img)
        else {
          val af = audio.features(bytes)
          if (af != null) af
          else {
            val hdr = video.parse(bytes)
            if (hdr != null) video.features(hdr, bytes.length)
            else fallback.decodeBatch(Array(bytes))(0)
          }
        }
      }
      rows.grouped(BatchSize).flatMap { batch =>
        val feats = batch.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val kind =
            if (metaIdx < 0) null
            else { val m = r.getStruct(metaIdx); if (m == null) null else m.getString(kindIdx) }
          kind match {
            case "image" =>
              val img = codec.decode(bytes)
              if (img != null) codec.features(img) else cascade(bytes)
            case "audio" =>
              val af = audio.features(bytes)
              if (af != null) af else cascade(bytes)
            case "video" =>
              val hdr = video.parse(bytes)
              if (hdr != null) video.features(hdr, if (bytes == null) 0 else bytes.length)
              else cascade(bytes)
            case _ => cascade(bytes)
          }
        }.toArray
        batch.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ (feats(i).toIndexedSeq: Seq[Float]))
        }
      }
    }
  }

  /** Fallback resize for image rows whose bytes don't decode (synthetic
    * fixtures): derives a (targetW × targetH)-shaped byte payload
    * deterministically. Decodable images take the real
    * [[ImageCodec.resizePng]] path instead. */
  final class ResizeStub(targetW: Int, targetH: Int) extends Serializable {
    def resizeBatch(contents: Array[Array[Byte]]): Array[Array[Byte]] =
      contents.map { bytes =>
        val out = new Array[Byte](math.max(1, targetW * targetH / 1024))
        if (bytes != null && bytes.length > 0) {
          var i = 0
          while (i < out.length) {
            out(i) = bytes(((i.toLong * bytes.length) / out.length).toInt)
            i += 1
          }
        }
        out
      }
  }

  /** Resizes image rows to (targetW, targetH); audio/video pass through
    * untouched. Decodable images are rescaled bilinearly and re-encoded
    * as PNG; undecodable image bytes fall back to the deterministic stub.
    * Batched partition map, one codec init per task. */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val schema = df.schema
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { rows =>
      val codec = new ImageCodec
      val stub = new ResizeStub(targetW, targetH)
      // reused raster/graphics/writer/buffer: byte-identical to the
      // one-shot resizePng (spec-pinned), minus the per-row SPI lookup,
      // 200 KB dest raster, and writer allocation
      val resizer = new PngResizer(targetW, targetH)
      rows.grouped(BatchSize).flatMap { batch =>
        val (images, rest) = batch.partition { r =>
          val m = r.getStruct(metaIdx)
          m != null && m.getString(0) == "image"
        }
        val resized = images.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val img = codec.decode(bytes)
          if (img != null) resizer.resize(img)
          else stub.resizeBatch(Array(bytes))(0)
        }
        images.iterator.zipWithIndex.map { case (r, i) =>
          val vals = r.toSeq.toArray
          vals(contentIdx) = resized(i)
          val m = r.getStruct(metaIdx)
          vals(metaIdx) = Row("image", targetW, targetH, m.get(3), m.get(4))
          Row.fromSeq(vals.toIndexedSeq)
        } ++ rest.iterator
      }
    }
  }

  /** Samples `n` evenly-spaced frames from each video row. The
    * container is REALLY parsed ([[VideoCodec]]): when the track
    * carries a sample table, each emitted row is an ACTUAL codec
    * sample's exact byte range (a standalone JPEG for MJPEG tracks —
    * decode it with [[decodeFrameFeatures]]); tracks without a sample
    * table fall back to evenly-spaced `mdat` byte slices, and non-MP4
    * bytes to whole-content slices. Output contract either way: one
    * row per sampled frame, frame index + frame bytes; non-video rows
    * produce no frames. */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(Seq(
      StructField("media_id", schema("media_id").dataType),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val idIdx = schema.fieldIndex("media_id")
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val video = new VideoCodec
      rows.flatMap { r =>
        val m = r.getStruct(metaIdx)
        if (m == null || m.getString(0) != "video") Iterator.empty
        else {
          val all = r.getAs[Array[Byte]](contentIdx)
          val hdr = if (all == null) null else video.parse(all)
          // a parsed container with no media data has no frames — the
          // mdat payload, not the byte count, decides (a header-only MP4
          // is non-empty but frameless)
          if (all == null || all.isEmpty ||
            (hdr != null && hdr.mdatLength <= 0)) Iterator.empty
          else if (hdr != null && hdr.sampleCount > 0) {
            // REAL frames: the stbl sample table locates every sample's
            // byte range, so each emitted row is an actual codec frame
            // (a standalone JPEG for the 'jpeg' tracks we mux) — n
            // evenly-spaced samples, repeating when the track is shorter
            // than n (keeps the n-rows-per-video output contract)
            (0 until n).iterator.map { f =>
              val si = ((f.toLong * hdr.sampleCount) / n).toInt
              val (start, len) = hdr.sampleRange(si)
              Row(r.get(idIdx), f,
                java.util.Arrays.copyOfRange(all, start, start + len))
            }
          } else {
            val (off, len) =
              if (hdr != null) (hdr.mdatOffset, hdr.mdatLength)
              else (0, all.length)
            (0 until n).iterator.map { f =>
              val start = off + ((f.toLong * len) / n).toInt
              val end = off + (((f + 1).toLong * len) / n).toInt
              Row(r.get(idIdx), f,
                java.util.Arrays.copyOfRange(all, start, math.max(end, start + 1)))
            }
          }
        }
      }
    }
  }

  /** REAL video frame decode: for each video row, locate `n`
    * evenly-spaced samples through the parsed stbl frame index, slice
    * each sample's exact byte range, decode it with `javax.imageio`
    * (MJPEG samples are standalone JPEGs — the one video codec the JDK
    * ships), and emit per-frame pixel features ([[ImageCodec.features]]
    * — same 8-dim contract as still images). Output: one row per
    * sampled frame `(media_id, frame_idx, sample_idx, codec,
    * features)`. Rows without a sample table, with an empty track, or
    * with samples ImageIO cannot read (H.264 etc. — no JDK codec;
    * a deployment plugs ffmpeg/JNI into this same loop) emit nothing:
    * a silent stub feature here would defeat the driver check.
    * Batched per-partition execution, one codec init per task. */
  def decodeFrameFeatures(df: DataFrame, n: Int): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(Seq(
      StructField("media_id", schema("media_id").dataType),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("codec", StringType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = schema.fieldIndex("media_id")
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    implicit val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val video = new VideoCodec
      val images = new ImageCodec
      rows.flatMap { r =>
        val m = r.getStruct(metaIdx)
        if (m == null || m.getString(0) != "video") Iterator.empty
        else {
          val all = r.getAs[Array[Byte]](contentIdx)
          val hdr = if (all == null) null else video.parse(all)
          if (hdr == null || hdr.sampleCount <= 0) Iterator.empty
          else (0 until n).iterator.flatMap { f =>
            val si = ((f.toLong * hdr.sampleCount) / n).toInt
            val (start, len) = hdr.sampleRange(si)
            val img = images.decode(java.util.Arrays.copyOfRange(all, start, start + len))
            if (img == null) Iterator.empty
            else Iterator.single(Row(r.get(idIdx), f, si, hdr.codec,
              images.features(img).toIndexedSeq: Seq[Float]))
          }
        }
      }
    }
  }

  val SynthImageW = 48
  val SynthImageH = 32

  /** Vertical two-band test pattern: left half `c1`, right half `c2` —
    * the deterministic render both the still-image fixtures and the
    * MJPEG video frames are built from. */
  private[operators] def bandImage(w: Int, h: Int, c1: Int,
      c2: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(math.max(w, 1), math.max(h, 1),
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        img.setRGB(x, y, if (x < img.getWidth / 2) c1 else c2)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Sidecar EXPECTED features, computed at fixture-generation time from
    * the generation PARAMETERS — closed-form pixel statistics for the
    * two-band image, a direct stats pass over the synthesized pre-
    * container PCM for audio, header arithmetic for video. These are
    * independent derivations, not calls into the decoders, so
    * `decoded == expected` genuinely exercises the full encode →
    * container → decode → featurize loop (and turns the decode queries
    * from rows-only into driver-hash-checked). */
  private[operators] def imageExpected(c1: Int, c2: Int): Array[Float] = {
    // closed form of [[ImageCodec.features]] for the half-c1/half-c2
    // band image: SynthImageW/H are both <= 64, so the 64x64 sampling
    // grid degenerates to every pixel and each mean is (c1+c2)/2
    require(SynthImageW <= 64 && SynthImageH <= 64, "closed form needs full sampling")
    def ch(c: Int, s: Int) = (c >> s) & 0xff
    def luma(c: Int) = 0.2126 * ch(c, 16) + 0.7152 * ch(c, 8) + 0.0722 * ch(c, 0)
    val mr = (ch(c1, 16) + ch(c2, 16)) / 2.0
    val mg = (ch(c1, 8) + ch(c2, 8)) / 2.0
    val mb = (ch(c1, 0) + ch(c2, 0)) / 2.0
    val l1 = luma(c1); val l2 = luma(c2)
    val ml = (l1 + l2) / 2
    val contrast = math.sqrt(math.max(0.0, (l1 * l1 + l2 * l2) / 2 - ml * ml)) / 255.0
    Array((SynthImageW / 4096.0f).min(1f), (SynthImageH / 4096.0f).min(1f),
      (SynthImageW.toFloat / SynthImageH).min(8f),
      (mr / 255.0).toFloat, (mg / 255.0).toFloat, (mb / 255.0).toFloat,
      (ml / 255.0).toFloat, contrast.toFloat)
  }

  private[operators] def audioExpected(freqHz: Double, durMs: Int,
      sampleRate: Int, amplitude: Double = 0.5): Array[Float] = {
    // the same statistics [[AudioCodec.features]] derives from the WAV
    // bytes, computed directly over the QUANTIZED samples [[sineWav]]
    // synthesizes — validating the PCM16 encode/decode round trip
    val n = math.max(1, (sampleRate.toLong * durMs / 1000).toInt)
    var sum = 0.0; var sumAbs = 0.0; var sum2 = 0.0
    var peak = 0.0; var crossings = 0L; var prev = 0.0
    var i = 0
    while (i < n) {
      val q = (amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate) * 32767).toInt
      val s = q / 32768.0
      sum += s; sumAbs += math.abs(s); sum2 += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (s > 0) != (prev > 0)) crossings += 1
      prev = s
      i += 1
    }
    val rate = sampleRate.toFloat
    val durS = n / rate // mono: frames = samples
    Array((rate / 48000.0f).min(1f), 1 / 2.0f, (durS / 60.0).min(1.0).toFloat,
      math.sqrt(sum2 / n).toFloat, peak.toFloat,
      (crossings.toDouble / n).toFloat, (sum / n).toFloat, (sumAbs / n).toFloat)
  }

  private[operators] def videoExpected(w: Int, h: Int, durMs: Int,
      mdatLen: Int, totalBytes: Int): Array[Float] = {
    // header arithmetic of [[VideoCodec.features]]: dims/duration from
    // the generation parameters, byte layout from the muxed container
    // (the caller measures the actual bytes it just laid down)
    val aspect = if (h > 0) w.toFloat / h else 0f
    var bh = 0
    "isom".foreach(c => bh = bh * 31 + c)
    Array((w / 4096.0f).min(1f), (h / 4096.0f).min(1f), aspect.min(8f),
      (durMs / 60000.0).min(1.0).toFloat, (1000 / 90000.0f).min(1f),
      if (mdatLen > 0) mdatLen.toFloat / totalBytes else 0f,
      (math.log10(math.max(totalBytes, 1)) / 8.0).toFloat, (bh & 0xffff) / 65536.0f)
  }

  /** Disk-cached media table per source dir: media content is INPUT data —
    * synthesizing PNGs/WAVs per query run would bill fixture generation to
    * the decode operators (it tripled the bench numbers). Content is
    * deterministic, so synthesize-once-and-read is exact. */
  /** Bump when [[syntheticMediaTable]]'s generation rule changes — the
    * version is part of the cache path, so stale renders are never
    * served after a logic change. */
  val MediaGenVersion = 6

  def mediaTableCached(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, sfDir: String): DataFrame = {
    // the media table is DERIVED from documents, so the cache key
    // carries the documents file's fingerprint (graft.Fixtures.key) —
    // a fixture regenerated in place must invalidate it, same hazard as
    // a streaming checkpoint over a rewritten source file
    val key = graft.Fixtures.key(sfDir, "documents.parquet")
    val path = s"${graft.Staging.dir("media")}/v$MediaGenVersion/$key"
    // Write PRE-PARTITIONED to core count: media bytes compress far
    // below maxPartitionBytes (13 MB at sf0.1 → ONE scan partition),
    // so an unsplit cache would serialize the CPU-heavy decode/resize
    // mapPartitions onto a single core. Paying the split once at
    // write time gives every downstream decode full parallelism with
    // no per-query shuffle — the same reason a 100 TB media lake is
    // laid out in decode-sized files rather than scan-sized ones.
    graft.Staging.publishParquet(spark, path) {
      syntheticMediaTable(docs)
        .repartition(spark.sparkContext.defaultParallelism)
    }
  }

  /** Builds a multimodal table from the documents table. IMAGE rows carry
    * a REAL rendered PNG (a deterministic two-band pattern seeded by
    * media_id and text hash) so the registered multimodal queries
    * exercise the actual `javax.imageio` decode path; AUDIO rows carry a
    * real sine-tone WAV; VIDEO rows carry a minimal valid MP4 container
    * (ftyp + moov/mvhd/trak/tkhd + mdat payload = the text bytes) so the
    * container-header parse path is real too. */
  def syntheticMediaTable(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val vidW = (pmod(col("doc_id"), lit(4)) * 320 + 640).cast("int")  // 640..1600
    val vidH = (pmod(col("doc_id"), lit(4)) * 180 + 360).cast("int")  // 360..900
    val base = docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        kind.as("kind"),
        when(kind === "image", lit(SynthImageW))
          .when(kind === "video", vidW).otherwise(lit(null).cast("int")).as("width"),
        when(kind === "image", lit(SynthImageH))
          .when(kind === "video", vidH).otherwise(lit(null).cast("int")).as("height"),
        when(kind === "audio", lit(16000)).otherwise(lit(null).cast("int")).as("sample_rate"),
        when(kind === "audio", // capped: 16 kHz PCM16 is 32 bytes/ms per row
          least(greatest(length(col("text")) * 10, lit(10)), lit(250)).cast("int"))
          .when(kind === "video", (length(col("text")) * 10).cast("int"))
          .otherwise(lit(null).cast("int")).as("duration_ms")).as("meta"))
    val schema = base.schema
    val outSchema = schema
      .add(StructField("expected", ArrayType(FloatType)))
      .add(StructField("expected_frames", ArrayType(ArrayType(FloatType))))
    val contentIdx = schema.fieldIndex("content")
    val metaIdx = schema.fieldIndex("meta")
    implicit val enc = Encoders.row(outSchema)
    def withExpected(vals: Array[Any], exp: Array[Float],
        frames: Array[Array[Float]] = null): Row = {
      val e: Any = if (exp == null) null else (exp.toIndexedSeq: Seq[Float])
      val fr: Any = if (frames == null) null
        else (frames.map(f => (f.toIndexedSeq: Seq[Float])).toIndexedSeq: Seq[Seq[Float]])
      Row.fromSeq(vals.toIndexedSeq :+ e :+ fr)
    }
    base.mapPartitions { rows =>
      rows.map { r =>
        val m = r.getStruct(metaIdx)
        if (m == null) withExpected(r.toSeq.toArray, null)
        else if (m.getString(0) == "audio") {
          // real WAV content (tone seeded by id + text hash) so the decode
          // queries exercise the actual javax.sound.sampled path
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](contentIdx)
          var h = 0xcbf29ce484222325L ^ id
          if (bytes != null) { var i = 0; while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 } }
          val freq = 200.0 + java.lang.Long.remainderUnsigned(h, 2000L)
          val vals = r.toSeq.toArray
          vals(contentIdx) = sineWav(freq, m.getInt(4), m.getInt(3))
          withExpected(vals, audioExpected(freq, m.getInt(4), m.getInt(3)))
        } else if (m.getString(0) == "video") {
          // real Motion-JPEG MP4: tkhd carries the display dims, the
          // stsd entry the coded dims (display/10 — spec-sanctioned
          // split), and mdat holds S standalone JPEG frames indexed by
          // a real stbl sample table. S = 2 + id%3 for non-empty docs,
          // 0 for empty ones (keeps the pipeline query's tl>0 frame
          // contract). expected_frames pins the GENERATION-TIME decode
          // of each frame's exact bytes: unlike the closed-form image/
          // audio sidecars this shares the JPEG codec with the query
          // path, so what it checks is the byte-exact container round
          // trip — mux → parquet → stbl parse → sample slice must
          // reproduce the muxed frame bytes bit-for-bit (any offset
          // error yields garbage pixels or a failed decode).
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](contentIdx)
          var hh = 0xcbf29ce484222325L ^ id
          if (bytes != null) { var i = 0; while (i < bytes.length) { hh ^= bytes(i) & 0xffL; hh *= 0x100000001b3L; i += 1 } }
          val w = m.getInt(1); val h = m.getInt(2); val durMs = m.getInt(4)
          val nFrames = if (bytes == null || bytes.isEmpty) 0 else (2 + (id % 3)).toInt
          val codec = new ImageCodec
          val jpegs = Array.tabulate(nFrames) { f =>
            val fh = hh ^ (0x9e3779b97f4a7c15L * (f + 1))
            val img = bandImage(w / 10, h / 10,
              (fh & 0xffffff).toInt, ((fh >>> 24) & 0xffffff).toInt)
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", baos)
            baos.toByteArray
          }
          val container = mjpegMp4Bytes(w, h, durMs, timescale = 1000,
            codedW = w / 10, codedH = h / 10, frames = jpegs)
          val expFrames = jpegs.map(j => codec.features(codec.decode(j)))
          val vals = r.toSeq.toArray
          vals(contentIdx) = container
          withExpected(vals, videoExpected(w, h, durMs,
            jpegs.map(_.length).sum, container.length), expFrames)
        } else if (m.getString(0) != "image") withExpected(r.toSeq.toArray, null)
        else {
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](contentIdx)
          var h = 0xcbf29ce484222325L ^ id
          if (bytes != null) { var i = 0; while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 } }
          val img = bandImage(SynthImageW, SynthImageH,
            (h & 0xffffff).toInt, ((h >>> 24) & 0xffffff).toInt)
          val c1 = (h & 0xffffff).toInt
          val c2 = ((h >>> 24) & 0xffffff).toInt
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          val vals = r.toSeq.toArray
          vals(contentIdx) = baos.toByteArray
          withExpected(vals, imageExpected(c1, c2))
        }
      }
    }
  }
}
