package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads with typed metadata, processed in
  * partition-sized batches.
  *
  * The Spark-side machinery — schema, partitioning, batch shape, the
  * mapPartitions pipeline — is real and tested, and so is the decode for
  * the formats the JDK itself can handle: PNG/JPEG/GIF/BMP pixels via
  * `javax.imageio` (part of `java.desktop` — no external library), WAV
  * PCM samples via plain byte math. Payloads those paths cannot decode
  * (header-only fixtures, exotic formats, video frames — no H.264
  * codec ships with the JDK) fall back to a documented deterministic
  * byte-derived feature stub, so the pipeline always yields a row. Swap
  * [[MediaDecoder.decode]]'s fallback for a richer codec (JavaCV /
  * pandas-UDF sidecar) without touching the pipeline.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("digest", StringType))))))

  final case class Asset(asset_id: Long, mime: String, payload: Array[Byte],
      n_bytes: Long, digest: String)

  final case class MediaFeatures(asset_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, n_channels: Int, bit_depth: Int,
      brightness: Double, embedding: Array[Float])

  object MediaDecoder {

    /** Parsed container metadata: width, height, channels, bit depth. */
    final case class Dims(width: Int, height: Int, channels: Int, bitDepth: Int)

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def be64(b: Array[Byte], o: Int): Long =
      ((be32(b, o).toLong & 0xffffffffL) << 32) |
        (be32(b, o + 4).toLong & 0xffffffffL)

    /** The ONE ISO-BMFF box walk shared by [[mp4Meta]] and
      * [[mp4Frames]] — size==1/largesize handling, unsigned 32-bit
      * sizes advanced in Long so corrupt values cannot wrap the offset,
      * child ends clamped to the parent. Yields (type, bodyStart,
      * bodyEnd). */
    private def bmffBoxes(b: Array[Byte], lo: Int, hi: Int)
        : Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var o = lo
        def hasNext: Boolean = o + 8 <= hi
        def next(): (String, Int, Int) = {
          // size is an unsigned 32-bit field: advance in Long so a
          // corrupt value cannot wrap the offset negative
          val size = be32(b, o).toLong & 0xffffffffL
          val tpe = fourcc(b, o + 4)
          if (size == 1L && o + 16 <= hi) {
            // size==1: 64-bit largesize follows the type (ISO BMFF
            // §4.2) — common on >4 GB mdat; must not end the walk
            val large = be64(b, o + 8)
            val end =
              if (large < 16L) hi
              else math.min(hi.toLong, o.toLong + large).toInt
            val cur = o
            o = if (large < 16L) hi else end
            (tpe, cur + 16, end)
          } else {
            val body = o + 8
            val end =
              if (size <= 0) hi
              else math.min(hi.toLong, o.toLong + size).toInt
            o = if (size <= 8) hi else end
            (tpe, body, end)
          }
        }
      }

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** PNG IHDR: the 8-byte signature, then the IHDR chunk (always first):
      * 4-byte length, "IHDR", width/height as big-endian u32 at offsets
      * 16/20, bit depth at 24, color type at 25 (PNG spec §11.2.2). */
    def pngDims(b: Array[Byte]): Option[Dims] = {
      if (b.length < 26 || !b.take(8).sameElements(PngSig)) return None
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return None
      val channels = b(25).toInt match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      val w = be32(b, 16)
      val h = be32(b, 20)
      // zero or >= 2^31 (negative via signed be32) dims are corrupt —
      // fall through to the hash-derived stub like GIF/BMP do instead
      // of reporting them as authoritative header metadata
      if (w <= 0 || h <= 0) None
      else Some(Dims(w, h, channels, b(24) & 0xff))
    }

    /** JPEG SOF scan: walk marker segments from SOI until a start-of-frame
      * (FFC0-FFCF minus the DHT/JPG/DAC pseudo-markers C4/C8/CC); the frame
      * header is precision(1), height(2 BE), width(2 BE), components(1)
      * (ITU T.81 §B.2.2). Standalone markers (TEM, RSTn) carry no length. */
    def jpegDims(b: Array[Byte]): Option[Dims] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var o = 2
      while (o + 4 <= b.length) {
        if ((b(o) & 0xff) != 0xff) return None
        // T.81 §B.1.1.2: markers may be preceded by any number of 0xFF
        // fill bytes — skip them rather than reading 0xFF as a marker id
        while (o + 4 <= b.length && (b(o + 1) & 0xff) == 0xff) o += 1
        if (o + 4 > b.length) return None
        val marker = b(o + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (o + 10 > b.length) return None
          val w = be16(b, o + 7)
          val h = be16(b, o + 5)
          // height 0 is legal in T.81 (deferred via DNL) but is not an
          // authoritative dimension; width 0 is simply corrupt
          return if (w <= 0 || h <= 0) None
          else Some(Dims(w, h, b(o + 9) & 0xff, b(o + 4) & 0xff))
        } else if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
          o += 2 // standalone marker, no segment length
        } else if (marker == 0xd9) {
          return None // EOI before any SOF
        } else {
          o += 2 + be16(b, o + 2)
        }
      }
      None
    }

    /** GIF logical screen descriptor: "GIF87a"/"GIF89a", then width and
      * height as little-endian u16 (GIF89a spec §18). Channels reported
      * as 3 (palette RGB), depth 8 — the decoded representation. */
    def gifDims(b: Array[Byte]): Option[Dims] = {
      if (b.length < 10) return None
      val sig = new String(b, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      val w = le16(b, 6)
      val h = le16(b, 8)
      // a zeroed logical screen descriptor must fall through to the
      // hash-derived dims, not report an authoritative 0x0
      if (w <= 0 || h <= 0) None else Some(Dims(w, h, 3, 8))
    }

    /** BMP BITMAPINFOHEADER: "BM", then signed LE i32 width at 18 and
      * height at 22 (negative height = top-down rows — dims are the
      * magnitude); bit count at 28 maps to channels. The DIB header
      * size at offset 14 must be >= 40 (BITMAPINFOHEADER or later) —
      * the legacy 12-byte BITMAPCOREHEADER lays out u16 dims at
      * different offsets, so reading it at INFOHEADER offsets would
      * yield garbage reported as authoritative. */
    def bmpDims(b: Array[Byte]): Option[Dims] = {
      if (b.length < 30 || b(0) != 'B' || b(1) != 'M') return None
      if (le32(b, 14) < 40L) return None
      val w = le32(b, 18).toInt
      // math.abs(Int.MinValue) is still negative — the <= 0 guard below
      // must see the result, not assume abs() made it positive
      val h = math.abs(le32(b, 22).toInt)
      val bpp = le16(b, 28)
      val channels = bpp match {
        case 1 | 4 | 8 => 1
        case 16 | 24 => 3
        case 32 => 4
        case _ => return None
      }
      if (w <= 0 || h <= 0) None else Some(Dims(w, h, channels, 8))
    }

    /** Parsed audio container metadata. */
    final case class AudioMeta(sampleRate: Int, channels: Int,
        bitsPerSample: Int, nFrames: Long)

    /** Parsed video container metadata; width/height from the first
      * video track header, duration in the mvhd timescale → ms. */
    final case class VideoMeta(durationMs: Long, width: Int, height: Int)

    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** The full RIFF walk behind [[wavMeta]] and
      * [[wavPcmFeatures]] — ONE definition of the word-aligned,
      * corrupt-size-hardened chunk stepping, yielding the fmt fields
      * (incl. the audioFormat tag) and the data chunk's location. */
    private final case class WavChunks(audioFormat: Int, channels: Int,
        sampleRate: Int, blockAlign: Int, bitsPerSample: Int,
        dataOffset: Int, dataSize: Long)
    private def wavChunks(b: Array[Byte]): Option[WavChunks] = {
      if (b.length < 36 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
        return None
      var o = 12
      var fmt: Option[(Int, Int, Int, Int, Int)] = None
      var dataOff = -1
      var dataSize = -1L
      while (o + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
        val id = fourcc(b, o)
        val size = le32(b, o + 4)
        if (id == "fmt " && size >= 16 && o + 24 <= b.length) {
          val af = le16(b, o + 8)
          val ch = le16(b, o + 10)
          val rate = le32(b, o + 12).toInt
          val align = le16(b, o + 20)
          val bits = le16(b, o + 22)
          if (ch <= 0 || rate <= 0 || bits <= 0) return None
          fmt = Some((af, ch, rate, align, bits))
        } else if (id == "data") {
          dataOff = o + 8
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte; sizes
        // are unsigned, so advance in Long and stop on any step that
        // fails to move forward (corrupt size) instead of looping
        val step = 8L + size + (size & 1L)
        if (step <= 0 || o + step > Int.MaxValue) o = b.length
        else o += step.toInt
      }
      fmt.map { case (af, ch, rate, align, bits) =>
        WavChunks(af, ch, rate, align, bits, dataOff, dataSize)
      }
    }

    /** WAV RIFF header: "RIFF" size "WAVE", then chunks; "fmt " carries
      * (LE) audioFormat u16, channels u16, sampleRate u32, byteRate u32,
      * blockAlign u16, bitsPerSample u16; frame count is the declared
      * "data" chunk size over blockAlign (the declared size is trusted
      * even when the sample bytes are truncated away — header-only
      * payloads are the pipeline's fixture shape). */
    def wavMeta(b: Array[Byte]): Option[AudioMeta] =
      wavChunks(b).map { c =>
        val align =
          if (c.blockAlign > 0) c.blockAlign
          else c.channels * (c.bitsPerSample / 8)
        val frames =
          if (c.dataSize < 0 || align <= 0) 0L else c.dataSize / align
        AudioMeta(c.sampleRate, c.channels, c.bitsPerSample, frames)
      }

    /** Minimal ISO BMFF (MP4) walk: top-level boxes to `moov`, then
      * `mvhd` (v0: timescale u32 + duration u32 after the 4-byte
      * fullbox header and two 4-byte times; v1: u64 variants) for
      * duration, and the first `trak`/`tkhd` for width/height (16.16
      * fixed point at the box tail). */
    def mp4Meta(b: Array[Byte]): Option[VideoMeta] = {
      def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
        bmffBoxes(b, lo, hi)
      if (b.length < 16) return None
      if (!boxes(0, b.length).exists(_._1 == "ftyp")) return None
      val moov = boxes(0, b.length).find(_._1 == "moov").getOrElse {
        return None
      }
      var durationMs = 0L
      var width = 0
      var height = 0
      boxes(moov._2, moov._3).foreach {
        case ("mvhd", body, end) if body + 4 <= end =>
          val v = b(body) & 0xff
          if (v == 1 && body + 32 <= end) {
            val ts = be32(b, body + 20).toLong & 0xffffffffL
            val dur = ((be32(b, body + 24).toLong & 0xffffffffL) << 32) |
              (be32(b, body + 28).toLong & 0xffffffffL)
            // hostile 64-bit durations: a sign-bit value reads negative
            // and dur * 1000 wraps above ~2^53 — the same guard the
            // frame-sampling path applies to ptsUnits, or garbage
            // negative duration_ms would surface as real metadata
            if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000)
              durationMs = dur * 1000 / ts
          } else if (v == 0 && body + 20 <= end) {
            val ts = be32(b, body + 12).toLong & 0xffffffffL
            val dur = be32(b, body + 16).toLong & 0xffffffffL
            if (ts > 0) durationMs = dur * 1000 / ts
          }
        case ("trak", tbody, tend) if width == 0 =>
          boxes(tbody, tend).foreach {
            case ("tkhd", body, end) =>
              // width/height are the LAST two 16.16 words of a
              // FULL-LENGTH box: fixed spec offsets (v0 body 84, v1
              // body 96) with the box end agreeing. End-relative reads
              // alone would decode arbitrary tail bytes of a TRUNCATED
              // tkhd (bmffBoxes clamps end to the payload) as
              // authoritative dims.
              if (body + 4 <= end && width == 0) {
                val tv = b(body) & 0xff
                val expect = if (tv == 1) body + 96 else body + 84
                if (end == expect && end - 8 >= body) {
                  width = be32(b, end - 8) >>> 16
                  height = be32(b, end - 4) >>> 16
                }
              }
            case _ => ()
          }
        case _ => ()
      }
      Some(VideoMeta(durationMs, width, height))
    }

    /** One-time ImageIO setup: headless (no display needed for decode)
      * and NO disk cache — the default spills every decode through a
      * temp file, which on a 1000-executor cluster is per-row filesystem
      * churn for zero benefit at training-asset sizes. */
    private lazy val imageIoReady: Boolean = {
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      true
    }

    /** Pixel cap for real decode: a corrupt or hostile header declaring
      * billboard dims must not make an executor allocate the buffer,
      * and the feature kernels' `getRGB` bulk read costs 4 bytes/pixel
      * ON TOP of the decoded raster — at 16 MP that is a 64 MB spike
      * per concurrent task, the right ceiling for 4–8 GB executors
      * running tens of tasks (training images are far smaller).
      * Oversized images fall back to the stub features. */
    private val MaxPixels = 16L * 1024 * 1024

    /** REAL pixel decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/
      * BMP readers ship in `java.desktop`; newer JDKs add TIFF/WBMP).
      * None for header-only, truncated, oversized, or non-image
      * payloads — decode failures degrade to the stub, never fail the
      * task. The [[MaxPixels]] cap is enforced through the ImageReader
      * header API (`getWidth`/`getHeight` parse only the header), so it
      * holds for EVERY installed reader — a format without a hand-
      * rolled dims parser (e.g. TIFF) cannot smuggle a billboard
      * allocation past the cap the way a plain `ImageIO.read` would. */
    def pixelDecode(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try {
        if (!imageIoReady || b.length < 16) None
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(b))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) None
            else {
              val r = readers.next()
              try {
                r.setInput(iis, true, true)
                val w = r.getWidth(0)
                val h = r.getHeight(0)
                if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
                else Option(r.read(0))
                  .filter(img => img.getWidth > 0 && img.getHeight > 0 &&
                    img.getWidth.toLong * img.getHeight <= MaxPixels)
              } finally r.dispose()
            }
          } finally if (iis != null) iis.close()
        }
      } catch { case _: Throwable => None }

    /** Area-mean luminance thumbnail: the image resized to `gw`×`gh` by
      * averaging each cell's pixels, values in [0,1], row-major. Cell
      * edges are `floor(i·extent/grid)`; an image smaller than the grid
      * repeats its pixels (every cell reads ≥ 1 pixel). Luminance is the
      * unweighted (r+g+b)/3 channel mean — chosen over perceptual
      * weights so an engine-independent oracle can reproduce the value
      * exactly. The single fused division keeps the result the
      * correctly-rounded double of the exact rational, so an oracle
      * computing the same rational differently still matches bit-wise. */
    def thumbnail(img: java.awt.image.BufferedImage, gw: Int, gh: Int)
        : Array[Float] =
      thumbnailOf(img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0,
        img.getWidth), img.getWidth, img.getHeight, gw, gh)

    private def thumbnailOf(px: Array[Int], w: Int, h: Int, gw: Int,
        gh: Int): Array[Float] = {
      val out = new Array[Float](gw * gh)
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw) {
          // LONG cell-edge math: gx * w wraps Int for extreme-aspect
          // images inside the 16M-pixel cap (e.g. 16M x 1 at grid 200),
          // and a wrapped-negative x0 would index out of bounds and
          // fail the task instead of degrading
          val x0 = (gx.toLong * w / gw).toInt
          val x1 = math.max(((gx + 1).toLong * w / gw).toInt, x0 + 1)
          val y0 = (gy.toLong * h / gh).toInt
          val y1 = math.max(((gy + 1).toLong * h / gh).toInt, y0 + 1)
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = px(y * w + x)
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            y += 1
          }
          val n = (x1 - x0).toLong * (y1 - y0)
          out(gy * gw + gx) = (sum / (3.0 * 255.0 * n)).toFloat
          gx += 1
        }
        gy += 1
      }
      out
    }

    /** Mean luminance over ALL pixels in [0,1]; same exactness contract
      * as [[thumbnail]] (one fused division of exact integer sums). */
    def meanLuminance(img: java.awt.image.BufferedImage): Double = {
      val w = img.getWidth
      val h = img.getHeight
      meanLuminanceOf(img.getRGB(0, 0, w, h, null, 0, w), w, h)
    }

    private def meanLuminanceOf(px: Array[Int], w: Int, h: Int): Double = {
      var sum = 0L
      var i = 0
      while (i < px.length) {
        val p = px(i)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        i += 1
      }
      sum / (3.0 * 255.0 * w * h)
    }

    /** Perceptual difference hash (dHash) over the REAL decoded
      * pixels: a 9×8 area-mean luminance grid, one bit per horizontally
      * adjacent cell pair (`cell > right neighbor`), row-major MSB
      * first — 64 bits that survive re-encoding, resizing and small
      * brightness shifts, the standard cheap image near-dup signature.
      * Ties compare as 0 so the hash is deterministic on flat regions. */
    def dHash64(img: java.awt.image.BufferedImage): Long =
      dHashOf(thumbnail(img, 9, 8))

    /** The bit-packing shared by [[dHash64]] and [[hashFeatures]] —
      * one definition so the two paths can never diverge. */
    private def dHashOf(cells: Array[Float]): Long = {
      var h = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          h <<= 1
          if (cells(r * 9 + c) > cells(r * 9 + c + 1)) h |= 1L
          c += 1
        }
        r += 1
      }
      h
    }

    /** [[meanLuminance]] + the 4×2 [[thumbnail]] from ONE shared bulk
      * pixel read — the per-asset `getRGB` copy is the dominant
      * allocation at the pixel cap, so the feature pipeline must not
      * pay it twice. Values are identical to the public one-shot
      * kernels (same sums, same fused divisions). */
    private[operators] def pixelFeatures(img: java.awt.image.BufferedImage)
        : (Double, Array[Float]) = {
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      (meanLuminanceOf(px, w, h), thumbnailOf(px, w, h, 4, 2))
    }

    /** [[dHash64]] + [[meanLuminance]] from one shared bulk pixel read
      * (same single-copy contract as [[pixelFeatures]]); values are
      * identical to the public one-shot kernels. */
    private[operators] def hashFeatures(img: java.awt.image.BufferedImage)
        : (Long, Double) = {
      val w = img.getWidth
      val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      (dHashOf(thumbnailOf(px, w, h, 9, 8)), meanLuminanceOf(px, w, h))
    }

    /** REAL PCM sample features from a WAV payload that carries its data
      * chunk: (rms, peak) of the normalized samples — 8-bit unsigned
      * (`(v-128)/128`) and 16-bit signed LE (`v/32768`) PCM. Multi-channel
      * interleaved PCM is treated as one flat sample stream: rms/peak are
      * computed over ALL interleaved channel samples, not per-channel
      * (rms is then the quadratic mean across channels — the usual
      * "energy of the interleaved stream" convention). None when
      * the fmt is non-PCM, the bit depth is unhandled, or the sample
      * bytes are absent/truncated (the header-only fixture shape).
      * Normalizers are powers of two and per-sample squares are exact
      * dyadic rationals, so sum/avg/sqrt are correctly-rounded doubles
      * of the exact rational — an oracle computing the same formula
      * matches bit-wise. */
    def wavPcmFeatures(b: Array[Byte]): Option[(Double, Double)] = {
      val meta = wavChunks(b).getOrElse(return None)
      // audioFormat 1 = integer PCM. A-law/mu-law (6/7) are ALSO 8 bits
      // per sample — decoding their companded bytes as unsigned PCM
      // would emit confident garbage rms/peak, so the tag check is
      // load-bearing, not pedantry
      if (meta.audioFormat != 1) return None
      if (meta.bitsPerSample != 8 && meta.bitsPerSample != 16) return None
      // the shared walk located the data chunk; require the declared
      // bytes to actually be present
      val dataOff = meta.dataOffset
      val dataLen = meta.dataSize
      if (dataOff < 0 || dataLen <= 0 || dataOff + dataLen > b.length)
        return None
      val n = dataLen.toInt / (meta.bitsPerSample / 8)
      if (n == 0) return None
      var sumSq = 0.0
      var peak = 0.0
      var i = 0
      while (i < n) {
        val x =
          if (meta.bitsPerSample == 8) ((b(dataOff + i) & 0xff) - 128) / 128.0
          else {
            val v = (b(dataOff + 2 * i) & 0xff) |
              (b(dataOff + 2 * i + 1) << 8) // sign-extends the high byte
            v / 32768.0
          }
        sumSq += x * x
        if (math.abs(x) > peak) peak = math.abs(x)
        i += 1
      }
      Some((math.sqrt(sumSq / n), peak))
    }

    /** One frame's location inside an MP4 payload, derived from the
      * sample tables: byte offset/size of the sample and its decode
      * timestamp in the media timescale. */
    final case class FrameLoc(index: Int, offset: Long, size: Long,
        ptsUnits: Long)

    /** REAL MP4 sample-table demux: walks `moov/trak/mdia` to the first
      * track whose `stbl` carries the four mandatory tables and maps
      * every sample to its absolute byte range and timestamp —
      * `stts` (decode deltas, run-length), `stsz` (sizes, uniform or
      * tabled), `stsc` (samples-per-chunk runs), `stco`/`co64` (chunk
      * offsets) — the same composition every demuxer performs. Returns
      * (timescale, frames) or None when any table is absent/corrupt.
      * This is frame SAMPLING, not decoding: the JDK has no H.264
      * codec, but locating frame byte ranges needs none. */
    def mp4Frames(b: Array[Byte]): Option[(Long, Seq[FrameLoc])] = {
      def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
        bmffBoxes(b, lo, hi)
      def find(lo: Int, hi: Int, tpe: String): Option[(Int, Int)] =
        boxes(lo, hi).collectFirst { case (`tpe`, b0, b1) => (b0, b1) }
      try {
        if (b.length < 16 || !boxes(0, b.length).exists(_._1 == "ftyp"))
          return None
        val (moov0, moov1) = find(0, b.length, "moov").getOrElse(return None)
        // first trak with a complete sample table wins
        boxes(moov0, moov1).collect { case ("trak", t0, t1) => (t0, t1) }
          .flatMap { case (t0, t1) =>
            for {
              (md0, md1) <- find(t0, t1, "mdia")
              (mh0, mh1) <- find(md0, md1, "mdhd")
              (mi0, mi1) <- find(md0, md1, "minf")
              (st0, st1) <- find(mi0, mi1, "stbl")
              (tt0, tt1) <- find(st0, st1, "stts")
              (sz0, sz1) <- find(st0, st1, "stsz")
              (sc0, sc1) <- find(st0, st1, "stsc")
              // bind the stco lookup once: each find() is a full box
              // walk over stbl, and the co64 flag needs the same answer
              stco = find(st0, st1, "stco")
              (co0, co1) <- stco.orElse(find(st0, st1, "co64"))
              co64 = stco.isEmpty
              frames <- composeFrames(b, mh0, mh1, tt0, tt1, sz0, sz1,
                sc0, sc1, co0, co1, co64)
            } yield frames
          }.nextOption()
      } catch { case _: Throwable => None }
    }

    /** The table-composition step of [[mp4Frames]], separated so each
      * refusal path (truncated table, zero counts, absurd cardinality)
      * is a plain return. */
    private def composeFrames(b: Array[Byte], mh0: Int, mh1: Int,
        tt0: Int, tt1: Int, sz0: Int, sz1: Int, sc0: Int, sc1: Int,
        co0: Int, co1: Int, co64: Boolean): Option[(Long, Seq[FrameLoc])] = {
      val MaxSamples = 1 << 20 // refuse absurd declared cardinalities
      // mdhd v0: fullbox(4) ctime(4) mtime(4) timescale(4); v1: 64-bit times
      if (mh0 + 4 > mh1) return None
      val timescale = (b(mh0) & 0xff) match {
        case 0 if mh0 + 16 <= mh1 => be32(b, mh0 + 12).toLong & 0xffffffffL
        case 1 if mh0 + 24 <= mh1 => be32(b, mh0 + 20).toLong & 0xffffffffL
        case _ => return None
      }
      if (timescale <= 0) return None
      // stts: entry_count x (sample_count, sample_delta)
      if (tt0 + 8 > tt1) return None
      val nTts = be32(b, tt0 + 4)
      if (nTts < 0 || nTts > MaxSamples || tt0 + 8 + 8L * nTts > tt1)
        return None
      // first pass: total sample count; second: Array-backed pts (a
      // linked Seq here would make the sample walk below O(n^2) via
      // positional lookups at the 2^20 cap)
      var ti = 0
      var total = 0L
      while (ti < nTts) {
        val cnt = be32(b, tt0 + 8 + 8 * ti)
        if (cnt < 0 || total + cnt > MaxSamples) return None
        total += cnt
        ti += 1
      }
      val nSamples = total.toInt
      if (nSamples == 0) return None
      val ptsArr = new Array[Long](nSamples)
      var pts = 0L
      var si = 0
      ti = 0
      while (ti < nTts) {
        val cnt = be32(b, tt0 + 8 + 8 * ti)
        val delta = be32(b, tt0 + 12 + 8 * ti).toLong & 0xffffffffL
        var c = 0
        while (c < cnt) { ptsArr(si) = pts; pts += delta; si += 1; c += 1 }
        ti += 1
      }
      // stsz: uniform sample_size, or 0 + per-sample table
      if (sz0 + 12 > sz1) return None
      val uniform = be32(b, sz0 + 4).toLong & 0xffffffffL
      val szCount = be32(b, sz0 + 8)
      if (szCount != nSamples) return None
      val sizeOf: Int => Long =
        if (uniform != 0) _ => uniform
        else {
          if (sz0 + 12 + 4L * nSamples > sz1) return None
          i => be32(b, sz0 + 12 + 4 * i).toLong & 0xffffffffL
        }
      // stsc: runs of (first_chunk, samples_per_chunk, desc_index)
      if (sc0 + 8 > sc1) return None
      val nScs = be32(b, sc0 + 4)
      if (nScs <= 0 || nScs > MaxSamples || sc0 + 8 + 12L * nScs > sc1)
        return None
      // stco/co64: chunk_count offsets
      if (co0 + 8 > co1) return None
      val nChunks = be32(b, co0 + 4)
      val entryW = if (co64) 8 else 4
      if (nChunks <= 0 || nChunks > MaxSamples ||
          co0 + 8 + entryW.toLong * nChunks > co1) return None
      def chunkOff(i: Int): Long =
        if (co64) be64(b, co0 + 8 + 8 * i)
        else be32(b, co0 + 8 + 4 * i).toLong & 0xffffffffL
      val out = Seq.newBuilder[FrameLoc]
      var sample = 0
      var chunk = 0
      // stsc runs are sorted by first_chunk: advance a single cursor
      // instead of rescanning the run table per chunk (a hostile table
      // could otherwise cost chunks x runs). first_chunk is unsigned —
      // a signed read would compare a corrupt 2^31 run as negative and
      // silently consume it, mislocating every frame after it
      var run = 0
      var spcCur = 0
      while (sample < nSamples && chunk < nChunks) {
        while (run < nScs &&
            (be32(b, sc0 + 8 + 12 * run).toLong & 0xffffffffL) <=
              chunk + 1L) {
          spcCur = be32(b, sc0 + 12 + 12 * run)
          run += 1
        }
        val spc = spcCur
        if (spc <= 0) return None
        var off = chunkOff(chunk)
        var s = 0
        while (s < spc && sample < nSamples) {
          val sz = sizeOf(sample)
          out += FrameLoc(sample, off, sz, ptsArr(sample))
          off += sz
          s += 1
          sample += 1
        }
        chunk += 1
      }
      if (sample < nSamples) None else Some((timescale, out.result()))
    }

    /** Header metadata is REAL (PNG IHDR / JPEG SOF / GIF LSD / BMP
      * info / WAV RIFF / MP4 box parsing); pixel features are REAL
      * whenever the JDK can
      * decode the payload ([[pixelDecode]]): brightness is the mean
      * luminance ([[meanLuminance]]) and the embedding a 4×2 area-mean
      * luminance [[thumbnail]] mapped to [-1,1]. Payloads the JDK cannot
      * decode (header-only fixtures, truncated streams, video) keep the
      * documented deterministic byte-derived STUB features, so every
      * asset still yields a row; payloads that neither header-parse nor
      * pixel-decode fall back to hash-derived dims, while a payload the
      * JDK decodes without a hand parser (e.g. TIFF) reports the
      * decoded image's REAL dims. Header dims stay authoritative when
      * both parse (a BufferedImage forgets palette/bit-depth layout). */
    def decode(payload: Array[Byte], mime: String): (Int, Int, Int, Int, Double, Array[Float]) = {
      // lazy: the happy path (header parses, pixels decode) must not
      // pay an O(n_bytes) full-payload hash it never uses
      lazy val h = java.util.Arrays.hashCode(payload)
      val hdr = pngDims(payload).orElse(jpegDims(payload))
        .orElse(gifDims(payload)).orElse(bmpDims(payload))
      pixelDecode(payload) match {
        case Some(img) =>
          // header dims stay authoritative when both parse (a
          // BufferedImage forgets palette/bit-depth layout); when no
          // hand parser recognizes the format but the JDK decodes it
          // (e.g. TIFF), the decoded image's REAL dims beat a
          // hash-derived fake
          val dims = hdr.getOrElse(Dims(img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, 8))
          val (lum, th) = pixelFeatures(img)
          val emb = th.map(v => (v * 2 - 1).toFloat)
          (dims.width, dims.height, dims.channels, dims.bitDepth,
            lum, emb)
        case None =>
          val dims = hdr.getOrElse {
            Dims(16 + math.abs(h % 64), 16 + math.abs((h / 64) % 64),
              if (mime.startsWith("image")) 3 else 1, 8)
          }
          val brightness =
            if (payload.isEmpty) 0.0
            else {
              // primitive loop like meanLuminanceOf: this fallback runs
              // for EVERY payload the JDK cannot decode (i.e. all real
              // video), and a boxed iterator sum would allocate a
              // Double per byte of a multi-MB blob per row
              var s = 0L
              var i = 0
              while (i < payload.length) { s += (payload(i) & 0xff); i += 1 }
              s.toDouble / payload.length / 255.0
            }
          val emb = Array.tabulate(8)(i =>
            (((h >>> (i * 4)) & 0xf).toFloat / 15f) * 2f - 1f)
          (dims.width, dims.height, dims.channels, dims.bitDepth,
            brightness, emb)
      }
    }
  }

  /** Executor-side lossless test-asset generator for the pixel-decode
    * gate: a truecolor PNG via the JDK's PNG writer whose left half is
    * gray `leftGray` and right half gray `rightGray` — decode must
    * recover both values exactly AND in the right spatial order (a
    * transposed or mirrored unfilter flips the thumbnail cells). */
  def encodeTwoTonePng(w: Int, h: Int, leftGray: Int, rightGray: Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val l = (leftGray & 0xff) * 0x010101
    val r = (rightGray & 0xff) * 0x010101
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) l else r)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Executor-side lossless PNG writer for arbitrary per-pixel RGB
    * (gate/test generator): `pixelRgb(x, y)` supplies the 0xRRGGBB
    * value. The q59 gate uses id-derived patterns so distinct image
    * classes get distinct [[MediaDecoder.dHash64]] values. */
  def encodePatternPng(w: Int, h: Int, pixelRgb: (Int, Int) => Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixelRgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Planted NEAR-duplicate image generator (q60 gate / spec): a 9×8
    * grayscale PNG whose pixels map 1:1 onto [[MediaDecoder.dHash64]]'s
    * 9×8 thumbnail cells, so the hash bits are directly controllable.
    *
    * The base pattern (`variant = 0`) fills every cell with an
    * id-derived gray in [1,253] (splitmix avalanche — cells look
    * independent, so 50 class hashes are pairwise far apart; the range
    * excludes 0/255 so a forced extreme always wins/loses its
    * comparison strictly). Variants perturb ONLY column-0 pixels:
    * cell (r,0) feeds exactly one hash bit — `cell(r,0) > cell(r,1)`,
    * bit 63-8r — and no other (there is no column to its left), so
    * forcing it to the opposite extreme of its base comparison flips
    * EXACTLY that bit. Variant 1 flips row 0 (Hamming 1 from base);
    * variant 2 flips rows {0,2,5} (Hamming 3 from base, 2 from
    * variant 1). Every within-class pair is thus at distance ≤ 3 —
    * inside the 4×16-bit banding's pigeonhole recall guarantee — while
    * inter-class distances stay large (asserted in PipelineOpsSpec over
    * all 150 planted hashes). Deterministic and SF-independent: the
    * pattern depends only on (cls, variant). */
  def plantedNearDupPng(cls: Long, variant: Int): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 * 0x9e3779b97f4a7c15L
      z ^= z >>> 32; z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 29
      z
    }
    def base(x: Int, y: Int): Int =
      1 + java.lang.Math.floorMod(mix(cls * 1000003L + x * 1009L + y), 253L)
        .toInt
    val flipRows: Set[Int] = variant % 3 match {
      case 0 => Set.empty
      case 1 => Set(0)
      case _ => Set(0, 2, 5)
    }
    encodePatternPng(9, 8, (x, y) => {
      val v =
        if (x == 0 && flipRows.contains(y)) {
          // force the opposite of the base comparison for bit (y, 0)
          if (base(0, y) > base(1, y)) 0 else 255
        } else base(x, y)
      v * 0x010101
    })
  }

  /** Executor-side PCM WAV writer (gate/test generator): 8-bit unsigned
    * or 16-bit signed LE samples behind the standard RIFF/fmt/data
    * layout [[MediaDecoder.wavPcmFeatures]] parses. `samples` is the
    * FLAT INTERLEAVED stream (frame-major: L0 R0 L1 R1 … for stereo);
    * blockAlign = channels * bytesPerSample, so the parser's frame
    * count is `samples.length / channels`. */
  def encodePcmWav(sampleRate: Int, bits: Int, samples: Array[Int],
      channels: Int = 1): Array[Byte] = {
    require(bits == 8 || bits == 16, s"unsupported PCM depth $bits")
    require(channels > 0 && samples.length % channels == 0,
      s"interleaved sample count ${samples.length} not a multiple of " +
        s"$channels channels")
    val bytesPer = bits / 8
    val block = bytesPer * channels
    val dataSize = samples.length * bytesPer
    val bo = new java.io.ByteArrayOutputStream(44 + dataSize)
    def s4(s: String): Unit = bo.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bo.write(((v >> (8 * i)) & 0xff).toInt))
    def u16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    s4("RIFF"); u32(36L + dataSize); s4("WAVE")
    s4("fmt "); u32(16)
    u16(1); u16(channels); u32(sampleRate)
    u32(sampleRate.toLong * block)
    u16(block); u16(bits)
    s4("data"); u32(dataSize)
    samples.foreach { v =>
      if (bits == 8) bo.write(v & 0xff)
      else { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    }
    if ((dataSize & 1) == 1) bo.write(0) // RIFF word alignment
    bo.toByteArray
  }

  /** Executor-side MP4 writer WITH a real sample table (gate/test
    * generator): ftyp, moov(mvhd, trak(tkhd, mdia(mdhd, minf(stbl(stts
    * run-length from `deltas`, stsz table from `sizes`, one-chunk stsc,
    * absolute-offset stco))))), then an mdat whose frame `i` is
    * `sizes(i)` copies of `frameFill(i)` — so [[MediaDecoder.mp4Frames]]
    * must locate every frame's bytes exactly for a byte-sum check to
    * pass. Two-pass build: the moov is laid out once to learn the mdat
    * offset the stco entry must carry, then rebuilt with it. */
  def encodeMp4Frames(width: Int, height: Int, timescale: Long,
      deltas: Array[Long], sizes: Array[Long],
      frameFill: Int => Byte, useCo64: Boolean = false): Array[Byte] =
    encodeMp4FrameBytes(width, height, timescale, deltas,
      sizes.zipWithIndex.map { case (sz, i) =>
        Array.fill[Byte](sz.toInt)(frameFill(i))
      }, useCo64)

  /** [[encodeMp4Frames]] with ARBITRARY per-frame byte payloads — the
    * MJPEG-in-MP4 fixture shape: each frame is a complete JPEG stream
    * and the sample table carries the real encoded sizes, so a demuxed
    * frame's byte range IS a decodable image ([[decodeFrames]]). */
  def encodeMp4FrameBytes(width: Int, height: Int, timescale: Long,
      deltas: Array[Long], frames: Array[Array[Byte]],
      useCo64: Boolean = false): Array[Byte] = {
    val sizes = frames.map(_.length.toLong)
    require(deltas.length == sizes.length && deltas.nonEmpty)
    def be32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(tpe: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8 + body.map(_.length).sum
      be32(len) ++ tpe.getBytes("US-ASCII") ++ body.flatten
    }
    val zero4 = Array.fill[Byte](4)(0)
    val matrix = be32(0x00010000L) ++ Array.fill[Byte](12)(0) ++
      be32(0x00010000L) ++ Array.fill[Byte](12)(0) ++ be32(0x40000000L)
    val duration = deltas.sum
    val ftyp = box("ftyp", "isom".getBytes, zero4, "isom".getBytes)
    val mvhd = box("mvhd", zero4, zero4, zero4, be32(timescale),
      be32(duration), be32(0x00010000L), Array.fill[Byte](12)(0), matrix,
      Array.fill[Byte](24)(0), be32(2))
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7), zero4, zero4,
      be32(1), zero4, be32(duration), Array.fill[Byte](16)(0), matrix,
      be32(width.toLong << 16), be32(height.toLong << 16))
    val mdhd = box("mdhd", zero4, zero4, zero4, be32(timescale),
      be32(duration), Array[Byte](0x55, (0xc4 - 256).toByte, 0, 0))
    // stts run-length: consecutive equal deltas collapse to one entry
    val runs = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    deltas.foreach { d =>
      if (runs.nonEmpty && runs.last._2 == d)
        runs(runs.length - 1) = (runs.last._1 + 1, d)
      else runs += ((1, d))
    }
    val stts = box("stts", zero4, be32(runs.length),
      runs.toArray.flatMap { case (c, d) => be32(c) ++ be32(d) })
    val stsz = box("stsz", zero4, be32(0), be32(sizes.length),
      sizes.flatMap(be32))
    val stsc = box("stsc", zero4, be32(1), be32(1), be32(sizes.length),
      be32(1))
    def moovWith(chunkOff: Long): Array[Byte] = {
      val stco =
        if (useCo64) box("co64", zero4, be32(1), be64(chunkOff))
        else box("stco", zero4, be32(1), be32(chunkOff))
      val stbl = box("stbl", stts, stsz, stsc, stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }
    val headerLen = ftyp.length + moovWith(0L).length
    val moov = moovWith(headerLen + 8L) // mdat payload starts after its header
    val mdat = box("mdat", frames.flatten)
    ftyp ++ moov ++ mdat
  }

  /** Executor-side uniform-gray JPEG (gate/test generator): every pixel
    * is gray `g`. The JDK JPEG codec round-trips a uniform image
    * EXACTLY for all 256 gray values (only the DC coefficient is
    * nonzero, and its quantization is lossless for a constant block —
    * verified exhaustively in PipelineOpsSpec), which is what lets the
    * q62 video-frame gate pin decoded luminance in closed form through
    * a LOSSY codec. */
  def encodeUniformJpeg(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g & 0xff) * 0x010101
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** 4-byte / 2-byte big-endian binary from an integral column, via
    * codegen'd built-ins (hex → lpad → unhex). Masked to the field
    * width first: lpad TRUNCATES THE TAIL of an oversized hex string,
    * which would keep the HIGH-order digits — a negative or oversized
    * value must keep its conventional low bits (same pmod as [[leN]]). */
  private def beN(c: Column, bytes: Int): Column =
    unhex(lpad(hex(pmod(c.cast("long"), lit(1L << (bytes * 8)))),
      bytes * 2, "0"))
  private def be32(c: Column): Column = beN(c, 4)
  private def be16(c: Column): Column = beN(c, 2)

  /** Little-endian counterparts: the big-endian hex string re-assembled
    * byte-reversed — still pure codegen'd built-ins. */
  private def leN(c: Column, bytes: Int): Column = {
    // keep the conventional LOW bits: lpad would truncate away the
    // low-order nibbles of an oversized (or negative) value
    val masked = pmod(c.cast("long"), lit(1L << (bytes * 8)))
    val hx = lpad(hex(masked), bytes * 2, "0")
    concat((0 until bytes).map(i =>
      unhex(substring(hx, (bytes - 1 - i) * 2 + 1, 2))): _*)
  }
  private def le32(c: Column): Column = leN(c, 4)
  private def le16(c: Column): Column = leN(c, 2)

  /** Build a structurally valid truecolor 8-bit PNG (signature, IHDR with
    * the given dims + live crc32, fixed IDAT/IEND) entirely from Spark
    * built-in functions — no UDF, SQL-mirrorable. The IDAT payload is a
    * constant zlib stream, so pixel content does not match the declared
    * dims (header-level validity is what the media pipeline consumes). */
  def pngPayload(width: Column, height: Column): Column = {
    val sig = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdrType = lit("IHDR".getBytes("US-ASCII"))
    val ihdrData = concat(be32(width), be32(height),
      lit(Array[Byte](8, 2, 0, 0, 0)))
    val ihdr = concat(be32(lit(13)), ihdrType, ihdrData,
      be32(crc32(concat(ihdrType, ihdrData))))
    // constant IDAT (zlib of one zero byte) + IEND, CRCs precomputed
    val idatType = lit("IDAT".getBytes("US-ASCII"))
    val idatData = lit(Array[Byte](0x78, 0x9c.toByte, 0x63, 0x00, 0x00,
      0x00, 0x02, 0x00, 0x01))
    val idat = concat(be32(lit(9)), idatType, idatData,
      be32(crc32(concat(idatType, idatData))))
    val iend = concat(be32(lit(0)), lit("IEND".getBytes("US-ASCII")),
      be32(crc32(lit("IEND".getBytes("US-ASCII")))))
    concat(sig, ihdr, idat, iend)
  }

  /** Build a structurally valid single-component (grayscale) baseline JPEG
    * header stream: SOI, APP0/JFIF, SOF0 with the given dims, EOI — again
    * pure built-ins. */
  def jpegPayload(width: Column, height: Column): Column = {
    val soi = lit(Array[Byte](0xff.toByte, 0xd8.toByte))
    val app0 = lit(Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x10) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00))
    val sof0 = concat(
      lit(Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x0b, 0x08)),
      be16(height), be16(width),
      lit(Array[Byte](0x01, 0x01, 0x11, 0x00)))
    val eoi = lit(Array[Byte](0xff.toByte, 0xd9.toByte))
    concat(soi, app0, sof0, eoi)
  }

  /** Build a header-only WAV payload (RIFF + fmt + data chunk header,
    * sample bytes omitted — the declared data size carries the frame
    * count, which [[MediaDecoder.wavMeta]] trusts) from Spark
    * built-ins; PCM format 1. */
  def wavPayload(sampleRate: Column, channels: Column, bits: Column,
      nFrames: Column): Column = {
    val blockAlign = (channels * (bits / lit(8))).cast("long")
    val dataSize = (nFrames * blockAlign).cast("long")
    val byteRate = (sampleRate * blockAlign).cast("long")
    val fmt = concat(
      lit("fmt ".getBytes("US-ASCII")), le32(lit(16)),
      le16(lit(1)), le16(channels), le32(sampleRate), le32(byteRate),
      le16(blockAlign), le16(bits))
    val dataHdr = concat(lit("data".getBytes("US-ASCII")), le32(dataSize))
    concat(
      lit("RIFF".getBytes("US-ASCII")), le32(dataSize + lit(36)),
      lit("WAVE".getBytes("US-ASCII")), fmt, dataHdr)
  }

  /** Build a minimal MP4 (ftyp + moov(mvhd v0 + trak(tkhd v0))) with
    * the given dims and duration in ms (timescale 1000) from Spark
    * built-ins. */
  def mp4Payload(width: Column, height: Column, durationMs: Column): Column = {
    val zeros = (n: Int) => lit(Array.fill[Byte](n)(0))
    // identity transformation matrix (0x00010000, 0, 0, 0, 0x00010000,
    // 0, 0, 0, 0x40000000)
    val matrix = lit(Array[Byte](0, 1, 0, 0) ++ Array.fill[Byte](12)(0) ++
      Array[Byte](0, 1, 0, 0) ++ Array.fill[Byte](12)(0) ++
      Array[Byte](0x40, 0, 0, 0))
    val ftyp = concat(be32(lit(20)), lit("ftypisom".getBytes("US-ASCII")),
      be32(lit(0)), lit("isom".getBytes("US-ASCII")))
    // mvhd v0: fullbox(4) ctime(4) mtime(4) timescale(4) duration(4)
    // rate(4) volume(2) reserved(10) matrix(36) predefined(24) next(4)
    val mvhd = concat(be32(lit(108)), lit("mvhd".getBytes("US-ASCII")),
      zeros(4), zeros(8), be32(lit(1000)), be32(durationMs),
      lit(Array[Byte](0, 1, 0, 0)), zeros(12), matrix, zeros(24),
      be32(lit(2)))
    // tkhd v0: fullbox(4) ctime(4) mtime(4) track(4) reserved(4)
    // duration(4) reserved(8) layer(2) alt(2) volume(2) reserved(2)
    // matrix(36) width(4, 16.16) height(4, 16.16)
    val tkhd = concat(be32(lit(92)), lit("tkhd".getBytes("US-ASCII")),
      lit(Array[Byte](0, 0, 0, 7)), zeros(8), be32(lit(1)), zeros(4),
      be32(durationMs), zeros(8), zeros(8), matrix,
      be16(width), be16(lit(0)), be16(height), be16(lit(0)))
    val trak = concat(be32(lit(100)), lit("trak".getBytes("US-ASCII")), tkhd)
    val moov = concat(be32(lit(216)), lit("moov".getBytes("US-ASCII")),
      mvhd, trak)
    concat(ftyp, moov)
  }

  /** Audio/video header metadata extracted per partition (same
    * decoder-per-partition batch shape as [[extractFeatures]]); WAV and
    * MP4 payloads are parsed for real. Null/unparseable payloads get
    * kind "unknown" with NULL metadata fields — a schema consumer can
    * distinguish "WAV with 0 frames" (audio, `Some(0)`) from "not
    * parseable" (unknown, null). Within a parsed kind, fields the
    * format does not carry stay 0 (an audio row's width, a video row's
    * sample_rate): the parse succeeded, the format just has no such
    * dimension. */
  final case class AvMeta(asset_id: Long, mime: String, kind: String,
      sample_rate: Option[Long], channels: Option[Long], bits: Option[Long],
      n_frames: Option[Long], duration_ms: Option[Long], width: Option[Long],
      height: Option[Long])

  def extractAvMeta(spark: SparkSession, assets: DataFrame): Dataset[AvMeta] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, payload) =>
          val unknown = AvMeta(id, mime, "unknown", None, None, None,
            None, None, None, None)
          if (payload == null) unknown
          else MediaDecoder.wavMeta(payload) match {
            case Some(a) =>
              AvMeta(id, mime, "audio", Some(a.sampleRate.toLong),
                Some(a.channels.toLong), Some(a.bitsPerSample.toLong),
                Some(a.nFrames), Some(0L), Some(0L), Some(0L))
            case None => MediaDecoder.mp4Meta(payload) match {
              case Some(vm) =>
                AvMeta(id, mime, "video", Some(0L), Some(0L), Some(0L),
                  Some(0L), Some(vm.durationMs), Some(vm.width.toLong),
                  Some(vm.height.toLong))
              case None => unknown
            }
          }
        }
      }
  }

  /** Wrap raw binary rows (`id`, `mime`, `payload`) into the typed asset
    * shape with byte counts and digests. */
  def toAssets(df: DataFrame, idCol: String, mimeCol: String,
      payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      col(mimeCol).as("mime"),
      col(payloadCol).as("payload"),
      struct(
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        md5(col(payloadCol)).as("digest")).as("meta"))

  /** Header-only image metadata: real dims or nothing, no pixel work. */
  final case class MediaDims(asset_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, n_channels: Int, bit_depth: Int,
      parsed: Boolean)

  /** METADATA-ONLY dims extractor: the pure header parsers
    * ([[MediaDecoder.pngDims]]/[[MediaDecoder.jpegDims]]/
    * [[MediaDecoder.gifDims]]/[[MediaDecoder.bmpDims]]) with NO ImageIO
    * reader probe — [[extractFeatures]] pays that probe per asset to
    * get pixels, which a dims-only pipeline (sharding by resolution,
    * filtering thumbnails, schema discovery) never needs. Payloads no
    * header parser recognizes yield `parsed = false` with zero dims —
    * honest metadata, not the hash-derived stand-ins the feature path
    * keeps for its total-pipeline contract. Narrow per-partition parse
    * of a few leading bytes; scales as a pure map. */
  def extractDims(spark: SparkSession, assets: DataFrame)
      : Dataset[MediaDims] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("mime"), col("payload"),
        coalesce(col("meta.n_bytes"), lit(0L)).as("n_bytes"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        it.map { case (id, mime, payload, nBytes) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          val m = if (mime == null) "" else mime
          MediaDecoder.pngDims(p).orElse(MediaDecoder.jpegDims(p))
            .orElse(MediaDecoder.gifDims(p))
            .orElse(MediaDecoder.bmpDims(p)) match {
            case Some(d) => MediaDims(id, m, nBytes, d.width, d.height,
              d.channels, d.bitDepth, parsed = true)
            case None => MediaDims(id, m, nBytes, 0, 0, 0, 0,
              parsed = false)
          }
        }
      }
  }

  /** Feature extraction over partition-sized batches: one decoder
    * instance per partition (the expensive-init pattern real codecs
    * need), rows streamed through it — the Scala analogue of
    * `mapInPandas`. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("mime"), col("payload"),
        // a null payload has a null octet_length; the typed Long must
        // not see it (and the decoder gets an empty array, mirroring
        // extractAvMeta's null fallback instead of failing the task)
        coalesce(col("meta.n_bytes"), lit(0L)).as("n_bytes"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition decoder init goes here (real codecs: open context)
        it.map { case (id, mime, payload, nBytes) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          val m = if (mime == null) "" else mime
          val (w, h, c, bd, bright, emb) = MediaDecoder.decode(p, m)
          MediaFeatures(id, m, nBytes, w, h, c, bd, bright, emb)
        }
      }
  }

  /** REAL audio sample features per asset: RMS and peak of the PCM data
    * chunk ([[MediaDecoder.wavPcmFeatures]]). `decoded=false` (features
    * zero) for payloads without decodable samples — header-only WAV,
    * non-PCM, anything not a WAV — so the pipeline is total. */
  final case class AudioFeatures(asset_id: Long, mime: String,
      decoded: Boolean, rms: Double, peak: Double)

  def extractAudioFeatures(spark: SparkSession, assets: DataFrame)
      : Dataset[AudioFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, payload) =>
          val m = if (mime == null) "" else mime
          val feats = Option(payload).flatMap(MediaDecoder.wavPcmFeatures)
          feats match {
            case Some((rms, peak)) => AudioFeatures(id, m, true, rms, peak)
            case None => AudioFeatures(id, m, false, 0.0, 0.0)
          }
        }
      }
  }

  /** One asset's perceptual hash and mean luminance; `decoded=false`
    * (hash 0, brightness 0) when the payload has no decodable pixels.
    * Brightness rides along because dHash is brightness-blind (a
    * gradient fingerprint — every uniform image hashes to 0), and
    * [[imageDedupClusters]]' optional `brightnessTol` needs it to
    * separate flat images. */
  final case class ImageHash(asset_id: Long, dhash: Long,
      decoded: Boolean, brightness: Double)

  /** Per-asset [[MediaDecoder.dHash64]] + mean luminance over the
    * decoded pixels (one shared pixel read) — the image-modality
    * fingerprint feeding [[imageDedupClusters]]. */
  def imageHashes(spark: SparkSession, assets: DataFrame)
      : Dataset[ImageHash] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          MediaDecoder.pixelDecode(p) match {
            case Some(img) =>
              val (h, b) = MediaDecoder.hashFeatures(img)
              ImageHash(id, h, true, b)
            case None => ImageHash(id, 0L, false, 0.0)
          }
        }
      }
  }

  /** IMAGE near-duplicate clustering — the visual-modality sibling of
    * the text SimHash path, in two stages whose split IS the scale
    * design:
    *
    *  1. EXACT collapse: group by the 64-bit [[imageHashes]] dHash and
    *     keep the min asset id as the representative. Identical images
    *     (re-uploads, mirrored shards — the dominant duplicate shape in
    *     a crawl) never reach the pair join; without this, a class of
    *     s identical copies costs C(s,2) candidate pairs in the band
    *     join — quadratic in copy count, the all-pairs blowup the
    *     banding exists to avoid.
    *  2. NEAR on representatives only: the hash split into
    *     `maxHamming + 1` bands (two hashes within the radius have
    *     fewer differing bits than bands, so one band is intact —
    *     pigeonhole, for EVERY accepted radius), candidate pairs from
    *     a band equi-join, verified with codegen'd
    *     `bit_count(xor) <= maxHamming` on candidates only, then the
    *     shared O(log n) star contraction
    *     ([[TextOps.dedupClustersStar]]).
    *
    * Labels map back through the hash groups: a component's label is
    * its min rep id = the min asset id across all merged copies. Every
    * DECODED asset gets a label; undecodable payloads label themselves
    * (no pixels, no visual identity) and never enter the hash join —
    * a crawl with many undecodable payloads would otherwise pile them
    * all onto one hot join key. `maxHamming = 0` degenerates to
    * pure exact-duplicate dedup with no join at all surviving the
    * Hamming filter.
    *
    * dHash LIMITATION and the `brightnessTol` knob: gradient ties hash
    * to 0 bits, so every uniform image (all-white, all-black, any solid
    * fill) has dHash 0 — inherent to difference hashing (flat images
    * are indistinguishable to a gradient fingerprint). By default
    * (`brightnessTol = ∞`) flat images therefore cluster together.
    * A finite `brightnessTol` separates them: reps collapse on
    * (dhash, exact brightness), candidate pairs additionally require a
    * shared brightness bucket, and the verify adds
    * `|brightness_a − brightness_b| ≤ tol`. Bucketing emits each rep
    * into buckets `⌊b/tol⌋` and `⌊b/tol⌋+1`, so any pair within tol
    * shares a bucket (floors differ by ≤ 1 — no boundary misses), while
    * flat images of genuinely different brightness get DIFFERENT band
    * keys — the dhash-0 crowd no longer lands on one hot join key, it
    * spreads across brightness buckets. Cost when enabled: 2× band
    * rows. */
  def imageDedupClusters(spark: SparkSession, assets: DataFrame,
      maxHamming: Int = 0,
      brightnessTol: Double = Double.PositiveInfinity,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 16,
      "maxHamming outside [0,16]: wider radii explode the candidate " +
        "rate (17+ bands of <4 bits each collide on most pairs)")
    require(brightnessTol > 0, "brightnessTol must be positive")
    val useB = !brightnessTol.isPosInfinity
    // banding is DERIVED from the radius so the pigeonhole recall
    // guarantee holds for every accepted maxHamming, not just <= 3:
    // with (maxHamming + 1) bands, a pair within the radius has more
    // bands than differing bits, so at least one band is intact and
    // the pair becomes a candidate. (A fixed 4x16 layout silently
    // dropped true pairs at distance 4+ — bits can spread 2+1+1+1
    // across four bands and share none.)
    val nBands = maxHamming + 1
    val bandW = 64 / nBands
    // one decode pass, not one per consumer: the hash frame feeds the
    // rep groupBy, the label join, and the undecoded self-label branch,
    // and each branch of the final DAG would re-run the (expensive)
    // pixel decode. A round-robin-free repartition on the unique
    // asset_id puts ONE Exchange directly above the decode; every
    // consumer references the identical subtree, so ReuseExchange
    // materializes the tiny (asset_id, dhash, decoded) rows once and
    // the decode never re-executes. Keyed by asset_id, not dhash —
    // undecoded rows all carry dhash 0 and would skew a dhash shuffle.
    val hashes = imageHashes(spark, assets).toDF()
      .repartition(col("asset_id"))
    val decoded = hashes.where(col("decoded"))
      .select(col("asset_id"), col("dhash"), col("brightness"))
    // exact collapse key: identical copies share brightness exactly, so
    // including it never splits a true exact-duplicate class
    val repKey = if (useB) Seq("dhash", "brightness") else Seq("dhash")
    val reps0 = decoded.groupBy(repKey.map(col): _*)
      .agg(min(col("asset_id")).as("rep_id"))
    val reps = if (useB) reps0 else reps0.withColumn("brightness", lit(0.0))
    val bucketed =
      if (useB) {
        val bk = floor(col("brightness") / brightnessTol).cast("long")
        reps.withColumn("bkey", explode(array(bk, bk + 1)))
      } else reps.withColumn("bkey", lit(0L))
    val banded = bucketed.select(col("rep_id"), col("dhash"),
      col("brightness"), col("bkey"),
      posexplode(array((0 until nBands).map { i =>
        // band i covers bits [i*bandW, ...); the last band absorbs the
        // remainder so all 64 bits are covered
        val width = if (i == nBands - 1) 64 - i * bandW else bandW
        val mask = if (width >= 64) -1L else (1L << width) - 1
        shiftrightunsigned(col("dhash"), i * bandW)
          .bitwiseAND(lit(mask))
      }: _*)).as(Seq("band", "key")))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.rep_id") < col("b.rep_id"))
      .select(col("a.rep_id").as("id_a"), col("b.rep_id").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"),
        col("a.brightness").as("ba"), col("b.brightness").as("bb"))
      .distinct()
      .where(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming &&
        abs(col("ba") - col("bb")) <= brightnessTol)
      .select(col("id_a"), col("id_b"))
    val repLabels = TextOps.dedupClustersStar(pairs, maxIter = maxIter,
        checkpointDir = checkpointDir)
      .withColumnRenamed("doc_id", "rep_id")
    val byHash = reps.join(repLabels, Seq("rep_id"), "left")
      .select(repKey.map(col) :+
        coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"): _*)
    // only decoded rows join byHash: undecoded rows all carry dhash=0
    // and would funnel onto that one key before being discarded anyway
    val labeledDecoded = decoded
      .join(byHash, repKey)
      .select(col("asset_id"), col("cluster_id"))
    val selfLabeled = hashes.where(!col("decoded"))
      .select(col("asset_id"), col("asset_id").as("cluster_id"))
    labeledDecoded.unionByName(selfLabeled)
  }

  /** The RESIZE operator: per-asset `gw`×`gh` area-mean luminance
    * thumbnails ([[MediaDecoder.thumbnail]], values in [0,1] row-major).
    * `decoded=false` with an empty cell array when the JDK cannot
    * decode the payload's pixels. Same per-partition batch shape as
    * [[extractFeatures]]. */
  final case class Thumbnail(asset_id: Long, width: Int, height: Int,
      decoded: Boolean, cells: Array[Float])

  /** One sampled video frame: its byte range inside the payload, its
    * presentation time, and the unsigned byte sum of the frame's actual
    * bytes — the cheap content witness that proves the sample-table
    * offsets point at the right data (a demux that mislocates a frame
    * by even one byte changes the sum). */
  final case class FrameSample(asset_id: Long, frame_idx: Long,
      size_bytes: Long, pts_ms: Long, byte_sum: Long)

  /** The ONE hostile-input frame-admission predicate, shared by
    * [[sampleFrames]] and [[decodeFrames]] so a hardening fix can never
    * land on one site and silently leave the other admitting the same
    * frame. Overflow-safe bounds: `offset + size <= length` wraps
    * negative for a hostile co64 offset near Long.MaxValue and would
    * admit the frame — compare subtractively. Overflow-safe pts too: a
    * hostile stts whose cumulative deltas exceed Long.MaxValue/1000
    * would wrap `* 1000` negative and emit garbage pts as real
    * metadata. */
  private def frameOk(p: Array[Byte], stride: Int)(
      f: MediaDecoder.FrameLoc): Boolean =
    f.index % stride == 0 &&
      f.offset >= 0 && f.size >= 0 && f.size <= p.length &&
      f.offset <= p.length - f.size &&
      f.ptsUnits >= 0 && f.ptsUnits <= Long.MaxValue / 1000

  /** The FRAME-SAMPLE operator: every `stride`-th frame of each MP4
    * payload located via the REAL sample-table demux
    * ([[MediaDecoder.mp4Frames]] — stts/stsz/stsc/stco composition, no
    * video codec involved) with its byte range read back out of the
    * payload. Non-MP4 / corrupt payloads contribute no rows (a training
    * pipeline samples frames only from things that demux). Frames whose
    * declared range exceeds the payload are skipped likewise. */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
      stride: Int): Dataset[FrameSample] = {
    require(stride >= 1, "stride must be >= 1")
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          MediaDecoder.mp4Frames(p).toSeq.flatMap {
            case (timescale, frames) =>
              frames.iterator
                .filter(frameOk(p, stride))
                .map { f =>
                  var sum = 0L
                  var i = f.offset.toInt
                  val end = (f.offset + f.size).toInt
                  while (i < end) { sum += (p(i) & 0xff); i += 1 }
                  FrameSample(id, f.index.toLong, f.size,
                    f.ptsUnits * 1000 / timescale, sum)
                }
          }
        }
      }
  }

  /** One sampled video frame DECODED to pixels: dims and mean luminance
    * of the frame image, `decoded=false` (zero dims/luminance) when the
    * frame bytes aren't a JDK-decodable image. */
  final case class FramePixels(asset_id: Long, frame_idx: Long,
      pts_ms: Long, width: Int, height: Int, decoded: Boolean,
      luminance: Double)

  /** VIDEO FRAME PIXELS end-to-end: [[sampleFrames]]' sample-table
    * demux composed with [[MediaDecoder.pixelDecode]] — for MJPEG-style
    * payloads whose frames are complete JPEG (or any ImageIO-decodable)
    * streams, every `stride`-th frame comes back as REAL pixels with
    * zero new codec work. Frames the JDK cannot decode (H.264 etc.)
    * yield `decoded=false` rows — the demux half (byte location, pts)
    * is still real and q58-verified; only pixel access needs a JDK-
    * known codec. Same per-partition batch shape and overflow-safe
    * bounds as [[sampleFrames]]; narrow map, no shuffle — scales. */
  def decodeFrames(spark: SparkSession, assets: DataFrame,
      stride: Int): Dataset[FramePixels] = {
    require(stride >= 1, "stride must be >= 1")
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          MediaDecoder.mp4Frames(p).toSeq.flatMap {
            case (timescale, frames) =>
              frames.iterator
                .filter(frameOk(p, stride))
                .map { f =>
                  val bytes = java.util.Arrays.copyOfRange(p,
                    f.offset.toInt, (f.offset + f.size).toInt)
                  val ptsMs = f.ptsUnits * 1000 / timescale
                  MediaDecoder.pixelDecode(bytes) match {
                    case Some(img) => FramePixels(id, f.index.toLong,
                      ptsMs, img.getWidth, img.getHeight, true,
                      MediaDecoder.meanLuminance(img))
                    case None => FramePixels(id, f.index.toLong,
                      ptsMs, 0, 0, false, 0.0)
                  }
                }
          }
        }
      }
  }

  def extractThumbnails(spark: SparkSession, assets: DataFrame,
      gridW: Int, gridH: Int): Dataset[Thumbnail] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          MediaDecoder.pixelDecode(p) match {
            case Some(img) => Thumbnail(id, img.getWidth, img.getHeight,
              true, MediaDecoder.thumbnail(img, gridW, gridH))
            case None => Thumbnail(id, 0, 0, false, Array.emptyFloatArray)
          }
        }
      }
  }
}
