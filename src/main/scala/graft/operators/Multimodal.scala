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

    /** Header metadata is REAL (PNG IHDR / JPEG SOF byte parsing, no media
      * library needed); pixel-level features are a documented deterministic
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
    * codegen'd built-ins (hex → lpad → unhex). */
  private def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  private def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))

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
        col("meta.n_bytes").as("n_bytes"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition decoder init goes here (real codecs: open context)
        it.map { case (id, mime, payload, nBytes) =>
          val (w, h, c, bd, bright, emb) = MediaDecoder.decode(payload, mime)
          MediaFeatures(id, mime, nBytes, w, h, c, bd, bright, emb)
        }
      }
  }
}
