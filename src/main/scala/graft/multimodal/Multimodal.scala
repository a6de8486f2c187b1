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
  * Decode comes in two tiers. The REAL tier ([[imageDecode]],
  * [[imageResize]], [[wavDecode]], [[pngDecode]]) runs actual format
  * parsers from [[Codecs]] — BMP header+pixel walk, WAV RIFF chunk
  * walk, PNG zlib-inflate + five-filter reconstruction — over format
  * bytes synthesized deterministically per doc (the container ships no
  * media files; the closed-form pixel/sample functions are what the
  * SQL oracle replays). The payload-column tier (`decodeStub`,
  * `resizeStub`) treats the text-as-bytes payload as opaque and keeps
  * a deterministic fake at the decode seam — swapping in a JNI/FFI
  * codec for formats beyond the JDK (JPEG, H.264) changes nothing
  * upstream or downstream of it.
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
          // a NULL payload (the metadata schema's nullable-source
          // case — encode(NULL) is NULL) rides through as the empty
          // payload instead of NPE-ing the task: every input row
          // stays accounted, with a content-true 0-byte checksum
          val raw = r.getAs[Array[Byte]](1)
          val bytes = if (raw == null) Array.emptyByteArray else raw
          val resized = Array.range(0, bytes.length, stride)
            .map(bytes(_))
          md.reset()
          val hex = md.digest(resized).map(b => f"$b%02x").mkString
          Row(id, bytes.length.toLong, resized.length.toLong, hex)
        }
      }(enc)
  }

  // ------------------------------------------------------------------
  // REAL codec paths (graft.multimodal.Codecs): BMP / WAV-PCM16 / PNG
  // bytes are synthesized deterministically per doc (no media ships
  // with the container), then decoded by the REAL parsers — header
  // walk, pixel/sample extraction, zlib inflate + unfiltering — so the
  // features below only match their closed-form DuckDB oracles if the
  // full encode→bytes→decode loop is byte-correct.

  /** Decoded-image feature row (exact integer channel sums — oracle-
    * replayable without float drift). */
  val imageFeaturesType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** The deterministic per-doc test pattern: dims and channel values
    * are pure functions of (doc_id, x, y) — the closed form a SQL
    * oracle can replay while the Spark side goes through real bytes. */
  def bmpDims(docId: Long): (Int, Int) =
    ((8 + docId % 9).toInt, (8 + (docId * 3) % 7).toInt)
  def bmpPixel(docId: Long)(x: Int, y: Int): (Int, Int, Int) =
    (((docId + 7L * x + 13L * y) % 256).toInt,
      ((3L * docId + 5L * x + y) % 256).toInt,
      ((5L * docId + x + 11L * y) % 256).toInt)

  /** Partition-wise REAL image decode: synthesize the doc's BMP bytes,
    * parse them back with the full header+pixel-walk decoder, reduce
    * the decoded pixels to per-channel sums. Narrow map, no shuffle;
    * decoder state (none needed for BMP) would be amortized per
    * partition exactly here. */
  def imageDecode(docIds: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imageFeaturesType)
    docIds.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = bmpDims(id)
        val img = Codecs.decodeBmp(Codecs.encodeBmp(w, h, bmpPixel(id)))
        var sr = 0L; var sg = 0L; var sb = 0L
        img.pixels.foreach(_.foreach { case (pr, pg, pb) =>
          sr += pr; sg += pg; sb += pb
        })
        Row(id, img.width, img.height, sr, sg, sb)
      }
    }(enc)
  }

  /** REAL resize: decode the BMP, nearest-neighbor downscale ×2, then
    * RE-ENCODE the small image and decode it AGAIN before summing —
    * the feature answer passes through two full byte round-trips, so
    * a padding/stride/offset bug anywhere in the codec shows up as an
    * oracle mismatch. Output sums are over the resized grid: pixel
    * (x,y) of the result is source pixel (2x, 2y), the closed form
    * the oracle replays. */
  def imageResize(docIds: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imageFeaturesType)
    docIds.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = bmpDims(id)
        val img = Codecs.decodeBmp(Codecs.encodeBmp(w, h, bmpPixel(id)))
        val rw = (img.width + 1) / 2; val rh = (img.height + 1) / 2
        val small = Codecs.decodeBmp(Codecs.encodeBmp(rw, rh,
          (x, y) => img.pixels(2 * y)(2 * x)))
        var sr = 0L; var sg = 0L; var sb = 0L
        small.pixels.foreach(_.foreach { case (pr, pg, pb) =>
          sr += pr; sg += pg; sb += pb
        })
        Row(id, small.width, small.height, sr, sg, sb)
      }
    }(enc)
  }

  val imagePhashType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("phash", StringType, nullable = false)))

  /** Perceptual average-hash over the REAL decode path: synthesize the
    * doc's BMP, parse it back with the full codec, nearest-neighbor
    * sample an 8×8 grid (sx = x·w div 8 — the resize kernel
    * [[imageResize]] certifies), and threshold each sample's channel
    * sum against the grid mean. The bit test is `64·gray > total` —
    * the mean comparison cleared of division, so the hash is a pure
    * integer function of the pixels and the oracle replays it
    * bit-for-bit. Emitted as a 64-char '0'/'1' string (row-major);
    * at scale the same bits pack into one long and ride the
    * dd_simhash Hamming machinery.
    *
    * This is the image analog of the text fingerprint family: content
    * addressing that survives re-encoding (any codec that reproduces
    * the pixels reproduces the hash), where a byte checksum breaks on
    * a single header difference. Narrow map, no shuffle. */
  def imagePhash(docIds: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imagePhashType)
    docIds.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = bmpDims(id)
        val img = Codecs.decodeBmp(Codecs.encodeBmp(w, h, bmpPixel(id)))
        val grays = new Array[Long](64)
        var i = 0
        while (i < 64) {
          val (pr, pg, pb) = img.pixels((i / 8) * h / 8)((i % 8) * w / 8)
          grays(i) = pr.toLong + pg + pb
          i += 1
        }
        val total = grays.sum
        Row(id, grays.map(g => if (64L * g > total) '1' else '0').mkString)
      }
    }(enc)
  }

  val audioFeaturesType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  def wavSampleCount(docId: Long): Int = (64 + docId % 64).toInt
  def wavSampleRate(docId: Long): Int = (8000 + (docId % 4) * 4000).toInt
  def wavSample(docId: Long)(j: Int): Int =
    (((docId * 31 + 17L * j) % 65536) - 32768).toInt

  /** Partition-wise REAL audio decode: synthesize PCM16 samples,
    * container them as WAV, walk the RIFF chunks back out, and reduce
    * to the exact integer energy (Σ s² ≤ 128·32768² < 2⁴⁸ — no
    * overflow, no floats). */
  def wavDecode(docIds: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioFeaturesType)
    docIds.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(wavSampleCount(id))(wavSample(id))
        val audio = Codecs.decodeWavPcm16(
          Codecs.encodeWavPcm16(wavSampleRate(id), 1, samples))
        var e = 0L
        audio.samples.foreach(s => e += s.toLong * s)
        Row(id, audio.sampleRate, audio.samples.length, e)
      }
    }(enc)
  }

  val grayFeaturesType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false)))

  def pngDims(docId: Long): (Int, Int) =
    ((5 + docId % 12).toInt, (6 + docId % 11).toInt)
  def pngPixel(docId: Long)(x: Int, y: Int): Int =
    ((7L * docId + 3L * x + 5L * y) % 256).toInt

  /** Partition-wise REAL PNG decode: the bytes go through actual zlib
    * DEFLATE on encode and the decoder must chunk-walk, CRC-check,
    * INFLATE, and undo all five PNG row filters (the encoder cycles
    * them by row) to reconstruct the pixels the oracle's closed form
    * predicts. */
  def pngDecode(docIds: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(grayFeaturesType)
    docIds.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = pngDims(id)
        val img = Codecs.decodePng(Codecs.encodePng(w, h, pngPixel(id)))
        var s = 0L
        img.pixels.foreach(_.foreach(s += _))
        Row(id, img.width, img.height, s)
      }
    }(enc)
  }

  def jpegDims(docId: Long): (Int, Int) =
    ((9 + docId % 14).toInt, (10 + docId % 13).toInt)

  /** Block-constant pixel field: every 8x8 JPEG block carries one
    * value. Constant blocks are DC-only, so at quant 1 the lossy
    * format round-trips them EXACTLY (MultimodalSpec proves it) —
    * which is what lets a closed-form DuckDB oracle hash-match a
    * genuinely lossy codec. */
  def jpegBlockPixel(docId: Long)(x: Int, y: Int): Int =
    ((11L * docId + 13L * (x / 8) + 29L * (y / 8)) % 256).toInt

  /** Partition-wise REAL JPEG decode: the bytes go through actual
    * baseline-DCT JFIF encoding (Huffman entropy coding, byte
    * stuffing, zigzag, quantization, FDCT) and the decoder must
    * marker-walk, Huffman-decode, dequantize, IDCT, and crop to
    * reconstruct the pixels the oracle's closed form predicts. Narrow
    * mapPartitions like the other codec faces — raw-format byte work
    * has no Catalyst expression form. */
  def jpegDecode(docIds: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(grayFeaturesType)
    docIds.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = jpegDims(id)
        val img = Codecs.decodeJpegGray(Codecs.encodeJpegGray(
          w, h, jpegBlockPixel(id), Codecs.JpegFlatQuant))
        var s = 0L
        img.pixels.foreach(_.foreach(s += _))
        Row(id, img.width, img.height, s)
      }
    }(enc)
  }

  /** Per-row decode status for the quarantine seam. */
  val quarantineRowType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("status", StringType, nullable = false)))

  /** Dead-letter quarantine over the REAL PNG decode path: every 13th
    * payload is corrupted in flight (one flipped byte in the trailing
    * chunk CRC — the crawl-corpus reality of truncated/bit-rotted
    * blobs), and [[Codecs.tryDecode]] routes each row to 'ok' or
    * 'quarantined' instead of failing the task. VALIDATED parse
    * failures quarantine; unknown exceptions still kill the job —
    * silently eating a broken code path is worse than failing.
    *
    * Scale (100 TB): narrow map like every codec face — the
    * corrupt-row fraction never costs a retry storm because the
    * failure is caught at the row, not the task. */
  def quarantineReport(docIds: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(quarantineRowType)
    docIds.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = pngDims(id)
        val bytes = Codecs.encodePng(w, h, pngPixel(id))
        if (id % 13 == 0)
          bytes(bytes.length - 1) =
            (bytes(bytes.length - 1) ^ 0x5a).toByte
        val status = Codecs.tryDecode(Codecs.decodePng(bytes)) match {
          case Right(_) => "ok"
          case Left(_)  => "quarantined"
        }
        Row(id, status)
      }
    }(enc)
  }

  /** Partition-wise decode + feature extraction over the PAYLOAD
    * column. Deterministic fake: "dimensions" derive from the payload
    * length, "mean_byte" from the real bytes — stable across runs and
    * engines. This face treats the payload as opaque (the
    * text-as-bytes fixture is not a real image); the REAL decoder
    * paths above ([[imageDecode]], [[wavDecode]], [[pngDecode]]) run
    * actual format parsers at the same seam. */
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
          // NULL payload → empty payload (see resizeStub): total on
          // the nullable-source rows the metadata schema anticipates
          val raw = r.getAs[Array[Byte]](1)
          val bytes = if (raw == null) Array.emptyByteArray else raw
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
