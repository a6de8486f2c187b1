package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Oracle-visible face of the multimodal column layer (SURVEY.md §2.12;
  * plumbing in graft.multimodal.Multimodal). `mm_binary_stats` proves
  * the binary payload + typed-metadata schema against DuckDB;
  * `mm_decode_features` drives the partition-wise decode path (stubbed
  * decoder, real batch shape) — and because the stub is a pure
  * function of the payload bytes, DuckDB replays it exactly: the
  * fixture text is ASCII, so per-char `ord` equals per-byte value and
  * the mean is one exact-integer double division in both engines. */
object MultimodalQueries extends QueryModule {

  val binaryStats: Q = Q(
    "mm_binary_stats",
    (s, dir) =>
      Multimodal.withPayload(Tables(s, dir, "documents"))
        .select(
          col("doc_id"),
          col("meta.media_type").as("media_type"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.checksum").as("checksum"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             'text/plain' AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS checksum
      FROM documents ORDER BY doc_id""")
  )

  val decodeFeatures: Q = Q(
    "mm_decode_features",
    (s, dir) =>
      Multimodal.decodeStub(s,
        Multimodal.withPayload(Tables(s, dir, "documents")))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(16 + (octet_length(encode(text)) % 16) AS INTEGER)
               AS width,
             CAST(16 + ((octet_length(encode(text)) // 16) % 16)
               AS INTEGER) AS height,
             CAST(list_aggregate(
                    list_transform(string_split(text, ''), x -> ord(x)),
                    'sum') AS DOUBLE)
               / octet_length(encode(text)) AS mean_byte
      FROM documents ORDER BY doc_id""")
  )

  /** The resize/downsample path — every 4th payload byte kept, output
    * content-addressed by md5 of the resized bytes. ASCII fixture ⇒
    * DuckDB replays the byte selection as a character selection and
    * the checksum matches bit-for-bit. */
  val resize: Q = Q(
    "mm_resize",
    (s, dir) =>
      Multimodal.resizeStub(s,
        Multimodal.withPayload(Tables(s, dir, "documents")), stride = 4)
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(orig AS BIGINT) AS orig_bytes,
             CAST(len(r) AS BIGINT) AS res_bytes,
             md5(r) AS res_checksum
      FROM (SELECT doc_id,
                   octet_length(encode(text)) AS orig,
                   array_to_string(list_transform(
                     range(1, len(text) + 1, 4),
                     i -> substr(text, CAST(i AS INT), 1)), '') AS r
            FROM documents)
      ORDER BY doc_id""")
  )

  /** The video-keyframe access pattern — fixed 32-byte "frames", every
    * 2nd kept (Multimodal.sampleFrames), certified content-addressed:
    * frame count, sampled byte total, and md5 over the concatenated
    * kept frames. ASCII fixture ⇒ DuckDB replays byte slicing as
    * character slicing (the mm_resize convention); the trailing
    * partial frame is kept truncated by both engines. */
  val frameSample: Q = Q(
    "mm_frame_sample",
    (s, dir) =>
      Multimodal.sampleFrames(
          Multimodal.withPayload(Tables(s, dir, "documents")),
          frameBytes = 32, stride = 2)
        .select(
          col("doc_id"),
          col("n_frames"),
          md5(expr(
            "aggregate(frames, CAST('' AS BINARY), (a, f) -> concat(a, f))"))
            .as("frames_checksum"),
          expr("aggregate(frames, CAST(0 AS BIGINT), " +
            "(a, f) -> a + octet_length(f))").as("sampled_bytes"))
        .orderBy("doc_id"),
    Some("""
      WITH f AS (
        SELECT doc_id, text,
               list_filter(
                 range(0, octet_length(encode(text)) // 32 + 1),
                 i -> i % 2 = 0 AND
                      i * 32 < octet_length(encode(text))) AS keep
        FROM documents),
      s AS (
        SELECT doc_id,
               CAST(len(keep) AS INT) AS n_frames,
               array_to_string(list_transform(keep,
                 i -> substr(text, CAST(i * 32 + 1 AS INT), 32)), '')
                 AS sampled
        FROM f)
      SELECT doc_id, n_frames, md5(sampled) AS frames_checksum,
             CAST(length(sampled) AS BIGINT) AS sampled_bytes
      FROM s ORDER BY doc_id""")
  )

  /** AUDIO windowed energy — the signal-level feature pass an audio
    * corpus runs before silence trimming or loudness filtering: the
    * payload interpreted as big-endian 16-bit PCM, cut into fixed
    * 64-sample windows, each reduced to its RMS. The "decode" is the
    * documented stub stance (byte pairs ARE the samples — a real
    * codec swaps in at the same seam); the windowing, the per-window
    * integer reduction, and the schema are the production shape.
    *
    * Scale shape: one scan, a bounded explode (windows per doc =
    * bytes/128), and a per-window fold over 64 integers — narrow
    * end-to-end, no shuffle before the verify sort. Exactness: sample
    * extraction is hex-slice + integer parse, the energy sum is exact
    * BIGINT (≤ 64·32768² < 2⁴¹), and the only float ops are one
    * divide + one sqrt — both IEEE correctly-rounded, so DuckDB
    * replays the doubles bit-for-bit. */
  val audioEnergy: Q = Q(
    "mm_audio_energy",
    (s, dir) => {
      val W = 64 // samples per window; 2 bytes per sample
      Multimodal.withPayload(Tables(s, dir, "documents"))
        .withColumn("h", hex(col("payload")))
        .withColumn("n_win",
          (octet_length(col("payload")) / 2 / W).cast("int"))
        .filter(col("n_win") > 0)
        .select(col("doc_id"), col("h"),
          explode(sequence(lit(0), col("n_win") - 1)).as("win"))
        .withColumn("ss", expr(s"""
          aggregate(
            transform(sequence(0, ${W - 1}),
              j -> CAST(conv(substr(h, (win*$W + j)*4 + 1, 4), 16, 10)
                   AS BIGINT) - 32768),
            CAST(0 AS BIGINT),
            (acc, v) -> acc + v * v)"""))
        .select(col("doc_id"), col("win"),
          sqrt(col("ss").cast("double") / lit(W.toDouble)).as("rms"))
        .orderBy("doc_id", "win")
    },
    Some("""
      WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               CAST(octet_length(encode(text)) // 2 // 64 AS INTEGER)
                 AS n_win
        FROM documents),
      w AS (
        SELECT doc_id, h, unnest(range(n_win)) AS win
        FROM p WHERE n_win > 0),
      e AS (
        SELECT doc_id, win,
               list_aggregate(list_transform(range(64),
                 j -> (CAST('0x' || substr(h, (win*64 + j)*4 + 1, 4)
                        AS BIGINT) - 32768)
                      * (CAST('0x' || substr(h, (win*64 + j)*4 + 1, 4)
                         AS BIGINT) - 32768)),
                 'sum') AS ss
        FROM w)
      SELECT doc_id, CAST(win AS INTEGER) AS win,
             sqrt(CAST(ss AS DOUBLE) / 64.0) AS rms
      FROM e ORDER BY doc_id, win""")
  )

  def all: Seq[Q] =
    Seq(binaryStats, decodeFeatures, resize, frameSample, audioEnergy)
}
