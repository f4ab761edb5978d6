package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.zip.CRC32

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * transforms (the Scala analog of `mapInPandas` batches — one JVM call
  * per batch of rows, no shuffle, arbitrary native libs callable inside).
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * DETERMINISTIC STUBS (clearly marked below): they derive fake
  * dimensions/features from the payload bytes. Everything AROUND the stub
  * — schema, null handling, batch iteration, partitioning, explode shape —
  * is real and tested; swapping in a JPEG/PCM decoder changes only the
  * function body.
  */
object Multimodal {

  /** Metadata carried beside every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("source_id", StringType),
    StructField("n_bytes", LongType)))

  /** Typed record for the partition-local kernels. */
  final case class MediaRow(id: Long, payload: Array[Byte],
                            mediaType: String)
  final case class DecodedRow(id: Long, width: Int, height: Int,
                              channels: Int, checksum: Long)

  /** Attach a payload + metadata to any table (here: the text bytes stand
    * in for an encoded image — the container ships no image corpus). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(lit("image/fake").as("media_type"),
        col(idCol).cast("string").as("source_id"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  private def crc(bytes: Array[Byte]): Long = {
    val c = new CRC32()
    c.update(bytes)
    c.getValue
  }

  /** ==== STUB ==== a real implementation would decode the image header;
    * this derives deterministic fake dimensions from the payload bytes. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = crc(payload)
    (64 + (h % 512).toInt, 64 + ((h >> 16) % 512).toInt, 3)
  }

  /** Partition-local decode: one pass per partition, rows streamed —
    * the `mapInPandas`-shaped entry point. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c) = decodeStub(r.payload)
        DecodedRow(r.id, w, h, c, crc(r.payload))
      }
    }(Encoders.product[DecodedRow])

  /** ==== STUB ==== fake feature vector: windowed byte sums, normalized —
    * stands in for a vision-model embedding; shape (dim) and batch
    * behavior are the real contract. */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  final case class FeatureRow(id: Long, feature: Array[Float])

  def features(media: Dataset[MediaRow], dim: Int = 16): Dataset[FeatureRow] =
    media.mapPartitions { rows =>
      rows.map(r => FeatureRow(r.id, featureStub(r.payload, dim)))
    }(Encoders.product[FeatureRow])

  /** Frame sampling: split the payload into fixed-size windows ("frames")
    * and explode one row per frame — the video-pipeline shape (decode
    * would replace the byte slice with real frame extraction). */
  def sampleFrames(df: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes > 0)
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes)
      .cast("int")
    // ceil(n_bytes/frameBytes) frames: a zero-byte payload yields ZERO
    // rows, not one empty frame — explode(null) drops the row (a null
    // payload likewise samples nothing)
    df.withColumn("frame_idx",
        explode(when(nFrames >= 1, sequence(lit(0), nFrames - 1))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
  }

  /** ==== STUB ==== "resize": truncate/zero-pad the payload to `n` bytes
    * (a real kernel would rescale pixels; the column contract is what is
    * under test). */
  def resizeStub(df: DataFrame, n: Int): DataFrame =
    df.withColumn("payload_resized",
      expr(s"rpad(substring(payload, 1, $n), $n, x'00')"))
}
