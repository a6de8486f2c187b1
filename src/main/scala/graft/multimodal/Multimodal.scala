package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — SURVEY.md §2.12: image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct;
  * decode/feature-extract runs partition-wise so each task amortizes
  * decoder setup over a batch of rows (the Scala analog of a pandas
  * batch UDF over `mapInPandas`).
  *
  * The decode step itself is a STUB — this container ships no image or
  * audio codecs — replaced by a deterministic fake so the Spark-side
  * plumbing (schema, binary handling, partitioning, batch shape) is real
  * and tested end-to-end. Swapping `decodeStub` for a real JNI/FFI
  * decoder changes nothing upstream or downstream of it.
  *
  * Scale stance (100 TB): payloads dominate row size, so ops that don't
  * need bytes must prune the binary column (Catalyst column pruning does
  * this when metadata is a separate column — verified in the spec);
  * decode is a narrow map (no shuffle), parallel in the number of input
  * partitions; `maxPartitionBytes` bounds per-task memory.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. n_bytes/checksum are
    * nullable because they derive from the (nullable) source column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = true),
    StructField("checksum", StringType, nullable = true)))

  /** Feature row produced by the (stubbed) decoder. */
  val featuresType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** Attach a binary payload + metadata struct to the documents table —
    * the fixture has no real media, so the payload is the UTF-8 text
    * bytes; in production this column IS the image/audio blob. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(encode(col("text"), "UTF-8")).cast("long")
          .as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** Frame sampling: slice the payload into fixed-size "frames" and
    * keep every `stride`-th one — the video-keyframe access pattern
    * (seek + slice, never materializing the full decode) expressed as a
    * codegen'd projection. Real media swaps byte-offset slicing for
    * container-index seeks; the schema (array<binary> frames + count)
    * and the pruning-friendly layout are the production shape. */
  def sampleFrames(withPayloadDf: DataFrame, frameBytes: Int,
                   stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    withPayloadDf.select(
      col("doc_id"),
      expr(s"""transform(
           filter(sequence(0, int(octet_length(payload) / $frameBytes)),
                  i -> i % $stride = 0 AND i * $frameBytes <
                       octet_length(payload)),
           i -> substring(payload, i * $frameBytes + 1, $frameBytes))""")
        .as("frames"))
      .withColumn("n_frames", size(col("frames")))
  }

  /** Output row of the (stubbed) resizer. */
  val resizedType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("orig_bytes", LongType, nullable = false),
    StructField("res_bytes", LongType, nullable = false),
    StructField("res_checksum", StringType, nullable = false)))

  /** Partition-wise RESIZE — the downsample step of an image/audio
    * pipeline, as a deterministic fake over the raw payload: keep
    * every `stride`-th byte (a real resizer decodes, scales, and
    * re-encodes here — same batch shape, same schema). Emits the
    * original and resized byte counts plus the md5 of the resized
    * payload so the transformation is content-addressable downstream.
    * Narrow map; payload bytes never shuffle. */
  def resizeStub(spark: SparkSession, withPayloadDf: DataFrame,
                 stride: Int = 4): DataFrame = {
    require(stride > 0)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizedType)
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val resized = Array.range(0, bytes.length, stride)
            .map(bytes(_))
          md.reset()
          val hex = md.digest(resized).map(b => f"$b%02x").mkString
          Row(id, bytes.length.toLong, resized.length.toLong, hex)
        }
      }(enc)
  }

  /** Partition-wise decode + feature extraction. Deterministic fake:
    * "dimensions" derive from the payload length, "mean_byte" from the
    * real bytes — stable across runs and engines.
    *
    * ??? -- a real implementation would decode `payload` here (JPEG →
    * pixels, WAV → samples) once per batch, e.g. via a JNI codec held in
    * a per-partition lazy handle; the deterministic fake below keeps the
    * exact batch shape and schema without the codec. */
  def decodeStub(spark: SparkSession, withPayloadDf: DataFrame)
      : DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featuresType)
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition "decoder" setup happens once, here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val fakeW = 16 + (bytes.length % 16)
          val fakeH = 16 + ((bytes.length / 16) % 16)
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble /
              bytes.length
          Row(id, fakeW, fakeH, mean)
        }
      }(enc)
  }
}
