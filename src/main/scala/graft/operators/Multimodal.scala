package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads with typed metadata, processed in
  * partition-sized batches.
  *
  * The Spark-side machinery — schema, partitioning, batch shape, the
  * mapPartitions pipeline — is real and tested. The actual media codec is
  * NOT: this container has no image/audio libraries, so `decodeStub`
  * derives deterministic fake features from the payload bytes. Swap
  * [[MediaDecoder.decode]] for a real codec (JavaCV / TwelveMonkeys /
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
      Some(Dims(be32(b, 16), be32(b, 20), channels, b(24) & 0xff))
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
          return Some(Dims(be16(b, o + 7), be16(b, o + 5),
            b(o + 9) & 0xff, b(o + 4) & 0xff))
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

    /** WAV RIFF header: "RIFF" size "WAVE", then chunks; "fmt " carries
      * (LE) audioFormat u16, channels u16, sampleRate u32, byteRate u32,
      * blockAlign u16, bitsPerSample u16; frame count is the declared
      * "data" chunk size over blockAlign (the declared size is trusted
      * even when the sample bytes are truncated away — header-only
      * payloads are the pipeline's fixture shape). */
    def wavMeta(b: Array[Byte]): Option[AudioMeta] = {
      if (b.length < 36 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
        return None
      var o = 12
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      var blockAlign = 0
      var dataSize = -1L
      while (o + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
        val id = fourcc(b, o)
        val size = le32(b, o + 4)
        if (id == "fmt " && size >= 16 && o + 24 <= b.length) {
          val ch = le16(b, o + 10)
          val rate = le32(b, o + 12).toInt
          blockAlign = le16(b, o + 20)
          val bits = le16(b, o + 22)
          if (ch <= 0 || rate <= 0 || bits <= 0) return None
          fmt = Some((ch, rate, bits))
        } else if (id == "data") {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte; sizes
        // are unsigned, so advance in Long and stop on any step that
        // fails to move forward (corrupt size) instead of looping
        val step = 8L + size + (size & 1L)
        if (step <= 0 || o + step > Int.MaxValue) o = b.length
        else o += step.toInt
      }
      fmt.map { case (ch, rate, bits) =>
        val align = if (blockAlign > 0) blockAlign else ch * (bits / 8)
        val frames =
          if (dataSize < 0 || align <= 0) 0L else dataSize / align
        AudioMeta(rate, ch, bits, frames)
      }
    }

    /** Minimal ISO BMFF (MP4) walk: top-level boxes to `moov`, then
      * `mvhd` (v0: timescale u32 + duration u32 after the 4-byte
      * fullbox header and two 4-byte times; v1: u64 variants) for
      * duration, and the first `trak`/`tkhd` for width/height (16.16
      * fixed point at the box tail). */
    def mp4Meta(b: Array[Byte]): Option[VideoMeta] = {
      def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
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
            if (ts > 0) durationMs = dur * 1000 / ts
          } else if (v == 0 && body + 20 <= end) {
            val ts = be32(b, body + 12).toLong & 0xffffffffL
            val dur = be32(b, body + 16).toLong & 0xffffffffL
            if (ts > 0) durationMs = dur * 1000 / ts
          }
        case ("trak", tbody, tend) if width == 0 =>
          boxes(tbody, tend).foreach {
            case ("tkhd", body, end) =>
              // width/height are the final two 16.16 words of the box
              if (end - 8 >= body && width == 0) {
                width = be32(b, end - 8) >>> 16
                height = be32(b, end - 4) >>> 16
              }
            case _ => ()
          }
        case _ => ()
      }
      Some(VideoMeta(durationMs, width, height))
    }

    /** Header metadata is REAL (PNG IHDR / JPEG SOF / WAV RIFF / MP4 box
      * byte parsing, no media library needed); pixel-level features are a
      * documented deterministic
      * STUB — this container has no codec to inflate pixel data, so
      * brightness/embedding are pure functions of the payload bytes. Swap
      * the feature branch for a real codec without touching the pipeline.
      * Unrecognized payloads fall back to fully-fake dims (hash-derived). */
    def decode(payload: Array[Byte], mime: String): (Int, Int, Int, Int, Double, Array[Float]) = {
      val h = java.util.Arrays.hashCode(payload)
      val dims = pngDims(payload).orElse(jpegDims(payload)).getOrElse {
        Dims(16 + math.abs(h % 64), 16 + math.abs((h / 64) % 64),
          if (mime.startsWith("image")) 3 else 1, 8)
      }
      val brightness =
        if (payload.isEmpty) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / payload.length / 255.0
      val emb = Array.tabulate(8)(i =>
        (((h >>> (i * 4)) & 0xf).toFloat / 15f) * 2f - 1f)
      (dims.width, dims.height, dims.channels, dims.bitDepth, brightness, emb)
    }
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
    * MP4 payloads are parsed for real, anything else yields nulls-as-
    * zeros with kind "unknown". */
  final case class AvMeta(asset_id: Long, mime: String, kind: String,
      sample_rate: Long, channels: Long, bits: Long, n_frames: Long,
      duration_ms: Long, width: Long, height: Long)

  def extractAvMeta(spark: SparkSession, assets: DataFrame): Dataset[AvMeta] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mime, payload) =>
          if (payload == null)
            AvMeta(id, mime, "unknown", 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          else MediaDecoder.wavMeta(payload) match {
            case Some(a) =>
              AvMeta(id, mime, "audio", a.sampleRate.toLong,
                a.channels.toLong, a.bitsPerSample.toLong, a.nFrames,
                0L, 0L, 0L)
            case None => MediaDecoder.mp4Meta(payload) match {
              case Some(vm) =>
                AvMeta(id, mime, "video", 0L, 0L, 0L, 0L,
                  vm.durationMs, vm.width.toLong, vm.height.toLong)
              case None =>
                AvMeta(id, mime, "unknown", 0L, 0L, 0L, 0L, 0L, 0L, 0L)
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
}
