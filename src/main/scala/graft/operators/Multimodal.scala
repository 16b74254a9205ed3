package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
      width: Int, height: Int, n_channels: Int, brightness: Double,
      embedding: Array[Float])

  object MediaDecoder {
    /** STUB — deterministic fake decode standing in for a real media
      * codec (??? in spirit: no real pixels are produced). Features are
      * pure functions of the payload bytes so tests are reproducible and
      * the distributed plumbing (batching, shuffle, schema) is exercised
      * honestly. */
    def decode(payload: Array[Byte], mime: String): (Int, Int, Int, Double, Array[Float]) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 16 + math.abs(h % 64)
      val height = 16 + math.abs((h / 64) % 64)
      val channels = if (mime.startsWith("image")) 3 else 1
      val brightness =
        if (payload.isEmpty) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / payload.length / 255.0
      val emb = Array.tabulate(8)(i =>
        (((h >>> (i * 4)) & 0xf).toFloat / 15f) * 2f - 1f)
      (width, height, channels, brightness, emb)
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
        col("meta.n_bytes").as("n_bytes"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { it =>
        // per-partition decoder init goes here (real codecs: open context)
        it.map { case (id, mime, payload, nBytes) =>
          val (w, h, c, bright, emb) = MediaDecoder.decode(payload, mime)
          MediaFeatures(id, mime, nBytes, w, h, c, bright, emb)
        }
      }
  }
}
