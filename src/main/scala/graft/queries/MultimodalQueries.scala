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
    * Scale shape: one scan, one native per-row kernel
    * ([[graft.functions.Pcm16WindowSs]] — the hex-conv lambda form
    * allocated twice per SAMPLE and cost 2.4 s at sf0.1 under full
    * materialization; the byte-walk kernel is spec-pinned equal), a
    * bounded posexplode — narrow end-to-end, no shuffle before the
    * verify sort. Exactness: the energy sum is exact BIGINT
    * (≤ 64·32768² < 2⁴¹), and the only float ops are one divide +
    * one sqrt — both IEEE correctly-rounded, so DuckDB replays the
    * doubles bit-for-bit. */
  val audioEnergy: Q = Q(
    "mm_audio_energy",
    (s, dir) => {
      graft.GraftExtensions.ensure(s)
      val W = 64 // samples per window; 2 bytes per sample
      Multimodal.withPayload(Tables(s, dir, "documents"))
        .withColumn("sss", expr(s"pcm16_window_ss(payload, $W)"))
        .select(col("doc_id"),
          posexplode(col("sss")).as(Seq("win", "ss")))
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

  // ------------------------------------------------------------------
  // REAL-codec faces (graft.multimodal.Codecs): the Spark side routes
  // every feature through ACTUAL format bytes — BMP header+pixel walk,
  // WAV RIFF chunk walk, PNG zlib inflate + five-filter reconstruction
  // — while the oracle replays the closed-form pixel/sample functions
  // the fixtures are synthesized from. The hashes can only match if
  // the byte-level encode→decode loop is exactly correct.

  /** REAL image decode (BMP): full header parse, bottom-up padded
    * pixel walk, per-channel integer sums. Dims vary per doc (8..16 ×
    * 8..14) so row padding (width % 4 ≠ 0) is exercised. */
  val imageDecode: Q = Q(
    "mm_image_decode",
    (s, dir) =>
      Multimodal.imageDecode(Tables(s, dir, "documents"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(8 + doc_id % 9 AS INTEGER) AS width,
             CAST(8 + (doc_id * 3) % 7 AS INTEGER) AS height,
             CAST(list_aggregate(flatten(list_transform(
                    range(8 + (doc_id * 3) % 7), y -> list_transform(
                      range(8 + doc_id % 9),
                      x -> (doc_id + 7 * x + 13 * y) % 256))),
                  'sum') AS BIGINT) AS sum_r,
             CAST(list_aggregate(flatten(list_transform(
                    range(8 + (doc_id * 3) % 7), y -> list_transform(
                      range(8 + doc_id % 9),
                      x -> (3 * doc_id + 5 * x + y) % 256))),
                  'sum') AS BIGINT) AS sum_g,
             CAST(list_aggregate(flatten(list_transform(
                    range(8 + (doc_id * 3) % 7), y -> list_transform(
                      range(8 + doc_id % 9),
                      x -> (5 * doc_id + x + 11 * y) % 256))),
                  'sum') AS BIGINT) AS sum_b
      FROM documents ORDER BY doc_id""")
  )

  /** REAL resize: decode → nearest-neighbor ×2 downscale → re-encode →
    * decode again → sums. Two full byte round-trips per row; resized
    * pixel (x,y) = source pixel (2x,2y) is the closed form. */
  val imageResize: Q = Q(
    "mm_image_resize",
    (s, dir) =>
      Multimodal.imageResize(Tables(s, dir, "documents"))
        .orderBy("doc_id"),
    Some("""
      WITH d AS (
        SELECT doc_id,
               (8 + doc_id % 9 + 1) // 2 AS rw,
               (8 + (doc_id * 3) % 7 + 1) // 2 AS rh
        FROM documents)
      SELECT doc_id,
             CAST(rw AS INTEGER) AS width,
             CAST(rh AS INTEGER) AS height,
             CAST(list_aggregate(flatten(list_transform(range(rh),
                    y -> list_transform(range(rw),
                      x -> (doc_id + 14 * x + 26 * y) % 256))),
                  'sum') AS BIGINT) AS sum_r,
             CAST(list_aggregate(flatten(list_transform(range(rh),
                    y -> list_transform(range(rw),
                      x -> (3 * doc_id + 10 * x + 2 * y) % 256))),
                  'sum') AS BIGINT) AS sum_g,
             CAST(list_aggregate(flatten(list_transform(range(rh),
                    y -> list_transform(range(rw),
                      x -> (5 * doc_id + 2 * x + 22 * y) % 256))),
                  'sum') AS BIGINT) AS sum_b
      FROM d ORDER BY doc_id""")
  )

  /** REAL audio decode (WAV PCM16): RIFF chunk walk, little-endian
    * sample extraction, exact integer energy. Sample counts and rates
    * vary per doc so the 'data' length and 'fmt ' fields are live. */
  val wavDecode: Q = Q(
    "mm_wav_decode",
    (s, dir) =>
      Multimodal.wavDecode(Tables(s, dir, "documents"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
             CAST(64 + doc_id % 64 AS INTEGER) AS n_samples,
             CAST(list_aggregate(list_transform(range(64 + doc_id % 64),
                    j -> ((doc_id * 31 + 17 * j) % 65536 - 32768)
                         * ((doc_id * 31 + 17 * j) % 65536 - 32768)),
                  'sum') AS BIGINT) AS energy
      FROM documents ORDER BY doc_id""")
  )

  /** REAL PNG decode: zlib INFLATE + chunk CRC validation + all five
    * row filters reconstructed (the encoder cycles None/Sub/Up/
    * Average/Paeth by row). The pixel sum only matches the closed
    * form if compression and unfiltering are byte-exact. */
  val pngDecodeQ: Q = Q(
    "mm_png_decode",
    (s, dir) =>
      Multimodal.pngDecode(Tables(s, dir, "documents"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(5 + doc_id % 12 AS INTEGER) AS width,
             CAST(6 + doc_id % 11 AS INTEGER) AS height,
             CAST(list_aggregate(flatten(list_transform(
                    range(6 + doc_id % 11), y -> list_transform(
                      range(5 + doc_id % 12),
                      x -> (7 * doc_id + 3 * x + 5 * y) % 256))),
                  'sum') AS BIGINT) AS pixel_sum
      FROM documents ORDER BY doc_id""")
  )

  /** REAL JPEG decode (baseline DCT, grayscale JFIF): marker walk,
    * canonical Huffman entropy decode, dequantize, IDCT, crop. The
    * images are block-constant (each 8x8 block one value), which at
    * quant 1 round-trips the lossy format EXACTLY — the only way a
    * closed-form arithmetic oracle can hash-match a DCT codec. Dims
    * are non-multiples of 8 so edge-block padding and crop are live
    * on every row. */
  val jpegDecodeQ: Q = Q(
    "mm_jpeg_decode",
    (s, dir) =>
      Multimodal.jpegDecode(Tables(s, dir, "documents"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(9 + doc_id % 14 AS INTEGER) AS width,
             CAST(10 + doc_id % 13 AS INTEGER) AS height,
             CAST(list_aggregate(flatten(list_transform(
                    range(10 + doc_id % 13), y -> list_transform(
                      range(9 + doc_id % 14),
                      x -> (11 * doc_id + 13 * (x // 8) + 29 * (y // 8))
                           % 256))),
                  'sum') AS BIGINT) AS pixel_sum
      FROM documents ORDER BY doc_id""")
  )

  /** Decode-failure quarantine report: every 13th PNG payload is
    * corrupted in flight (flipped CRC byte) and the decode seam
    * routes rows to 'ok'/'quarantined' instead of failing the task
    * (`Multimodal.quarantineReport`). The oracle replays the
    * corruption RULE, not the decoder — which ids were corrupted is
    * closed-form; that the decoder catches exactly those is what the
    * engine side proves (a decoder that misses a corrupt blob or
    * quarantines a healthy one hash-mismatches). */
  val quarantineQ: Q = Q(
    "mm_quarantine",
    (s, dir) =>
      Multimodal.quarantineReport(Tables(s, dir, "documents"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").as("id_checksum"))
        .orderBy("status"),
    Some("""
      SELECT CASE WHEN doc_id % 13 = 0 THEN 'quarantined'
                  ELSE 'ok' END AS status,
             count(*) AS n_docs,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM documents GROUP BY 1 ORDER BY 1""")
  )

  /** Perceptual-hash content addressing over the real decode path
    * (plumbing + hash definition in [[Multimodal.imagePhash]]): every
    * image gets its 64-bit average-hash and the count of corpus images
    * sharing it — the image-side analog of `dd_exact`'s fingerprint
    * grouping, robust to re-encoding where byte checksums are not.
    * The oracle replays decode + 8×8 sample + threshold in closed
    * form, so one wrong pixel anywhere in the codec flips a bit and
    * fails the hash compare.
    *
    * Scale (100 TB): the hash is a narrow per-row map over the decode;
    * the only exchange is the group count on the 8-byte fingerprint
    * (here a 64-char string for oracle visibility) — never on pixels
    * or payload bytes. Near-dup at Hamming ≤ k rides the
    * dd_simhash_hamming bit-flip join unchanged. */
  /** The oracle's closed-form replay of decode → 8×8 average-hash,
    * shared by the exact-match face and the Hamming near-dup face. */
  private val phashCtes = """px AS (
        SELECT doc_id, (8 + doc_id % 9) AS w, (8 + (doc_id * 3) % 7) AS h
        FROM documents),
      g AS (
        SELECT doc_id,
               list_transform(range(64), i ->
                 ((doc_id + 7 * ((i % 8) * w // 8)
                          + 13 * ((i // 8) * h // 8)) % 256)
               + ((3 * doc_id + 5 * ((i % 8) * w // 8)
                             + ((i // 8) * h // 8)) % 256)
               + ((5 * doc_id + ((i % 8) * w // 8)
                             + 11 * ((i // 8) * h // 8)) % 256)) AS grays
        FROM px),
      ph AS (
        SELECT doc_id,
               array_to_string(list_transform(grays, v ->
                 CASE WHEN 64 * v > list_aggregate(grays, 'sum')
                      THEN '1' ELSE '0' END), '') AS phash
        FROM g)"""

  val phashQ: Q = Q(
    "mm_phash",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("phash")
      Multimodal.imagePhash(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("phash"),
          count(lit(1)).over(w).as("n_same"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH $phashCtes
      SELECT doc_id, phash,
             count(*) OVER (PARTITION BY phash) AS n_same
      FROM ph ORDER BY doc_id""")
  )

  /** Perceptual NEAR-duplicate pairs — the claim [[phashQ]]'s scaladoc
    * makes ("near-dup at Hamming ≤ k rides the dd_simhash_hamming
    * bit-flip join unchanged"), DEMONSTRATED: the 64-char phash packs
    * into one BIGINT (a left fold of shifted bits — wrap into the
    * sign bit is fine on the Spark side, which is exactly why the
    * oracle replays the SEMANTICS with a half-split band join on the
    * bit STRINGS instead of replaying the packing: distance ≤ 1
    * implies one 32-bit half is untouched, so candidates share a
    * half and verification counts differing chars). Re-encoded or
    * slightly-corrupted images land within a bit or two of their
    * original — the image-side retrieval exact matching misses.
    *
    * Scale (100 TB): identical to dd_simhash_hamming — 65 variant
    * keys per image per side at d≤1, 8-byte longs through the
    * shuffle, never pixels. */
  val phashNearDup: Q = Q(
    "mm_phash_neardup",
    (s, dir) => {
      import graft.operators.CacheScope
      val fp = Multimodal.imagePhash(Tables(s, dir, "documents"))
        .select(col("doc_id"), expr(
          "aggregate(sequence(0, 63), 0L, (acc, i) -> acc | " +
            "IF(substring(phash, i + 1, 1) = '1', " +
            "shiftleft(1L, 63 - i), 0L))").as("fp"))
        .persist()
      val result = graft.operators.TextDedup
        .hammingPairs(fp, bits = 64, maxDistance = 1, fpCol = "fp")
        .orderBy("doc_a", "doc_b")
      CacheScope.eval(result)(fp)
    },
    Some(s"""
      WITH $phashCtes,
      halves AS (
        SELECT doc_id, phash, substr(phash, 1, 32) AS h1,
               substr(phash, 33, 32) AS h2
        FROM ph),
      pcand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.phash AS pa, b.phash AS pb
        FROM halves a JOIN halves b
          ON a.doc_id < b.doc_id AND (a.h1 = b.h1 OR a.h2 = b.h2)),
      pscored AS (
        SELECT doc_a, doc_b,
               CAST(len(list_filter(range(64), i ->
                 substr(pa, CAST(i AS INT) + 1, 1)
                   <> substr(pb, CAST(i AS INT) + 1, 1))) AS BIGINT)
                 AS dist
        FROM pcand)
      SELECT doc_a, doc_b, dist FROM pscored
      WHERE dist <= 1 ORDER BY doc_a, doc_b""")
  )

  /** AUDIO FINGERPRINT + BAND COLLISIONS — the audio twin of
    * [[phashQ]]/[[phashNearDup]]: the Haitsma–Kalker (2002) robust
    * fingerprint simplified to one energy band — bit j is the SIGN of
    * the energy delta between consecutive 2-sample windows, a feature
    * invariant to amplitude scaling (gain changes preserve every
    * delta's sign) — packed to a 20-bit BIGINT via the same native
    * `pcm16_window_ss` kernel as `mm_audio_energy`. Retrieval rides
    * LSH banding rather than a Hamming join: 4 bands × 5 bits, keyed
    * by the (fp_bits, band) CLASS so fingerprints truncated by short
    * payloads only ever compare against equally-truncated ones, with
    * each doc reporting how many OTHER docs share any of its band
    * buckets — the candidate-pair observability, `dd_lsh_bucket_stats`
    * style, that sizes a full audio-dedup pass before anyone runs it.
    *
    * Exactness: window energies are exact BIGINT (native kernel,
    * hex-conv-replayed by the oracle); the fingerprint is an integer
    * fold of strict `>` comparisons — no floats anywhere. Scale: one
    * narrow kernel pass, a 4×-bounded band explode, and a
    * (fp_bits, band, bucket)-keyed count — map-side combined. */
  val audioFingerprint: Q = Q(
    "mm_audio_fingerprint",
    (s, dir) => {
      graft.GraftExtensions.ensure(s)
      val base = Multimodal.withPayload(Tables(s, dir, "documents"))
        .withColumn("sss", expr("pcm16_window_ss(payload, 2)"))
        .select(col("doc_id"), size(col("sss")).cast("long")
          .as("n_win"), col("sss"))
        .withColumn("fp", expr(
          "CASE WHEN n_win >= 2 THEN aggregate(" +
            "sequence(0, int(least(n_win - 2, 19L))), 0L, " +
            "(acc, j) -> acc + CASE WHEN element_at(sss, j + 2) > " +
            "element_at(sss, j + 1) THEN shiftleft(1L, j) " +
            "ELSE 0L END) ELSE 0L END"))
        .withColumn("fp_bits",
          greatest(least(col("n_win") - 1, lit(20L)), lit(0L)))
        .drop("sss")
      val bands = base.select(col("doc_id"), col("fp_bits"),
          col("fp"), explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bucket",
          expr("shiftright(fp, band * 5) & 31"))
      val bc = bands.groupBy("fp_bits", "band", "bucket")
        .agg(count(lit(1)).as("c"))
      val coll = bands.join(bc, Seq("fp_bits", "band", "bucket"))
        .groupBy("doc_id")
        .agg(sum(col("c") - 1).as("n_band_collisions"))
      base.join(coll, "doc_id")
        .select("doc_id", "n_win", "fp_bits", "fp",
          "n_band_collisions")
        .orderBy("doc_id")
    },
    Some("""
      WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               CAST(octet_length(encode(text)) // 2 // 2 AS BIGINT)
                 AS n_win
        FROM documents),
      e AS (
        SELECT doc_id, n_win, win,
               list_aggregate(list_transform(range(2),
                 j -> (CAST('0x' || substr(h, (win*2 + j)*4 + 1, 4)
                        AS BIGINT) - 32768)
                      * (CAST('0x' || substr(h, (win*2 + j)*4 + 1, 4)
                         AS BIGINT) - 32768)),
                 'sum') AS ss
        FROM (SELECT doc_id, n_win, h, unnest(range(n_win)) AS win
              FROM p WHERE n_win > 0)),
      fl AS (
        SELECT doc_id, n_win, list(ss ORDER BY win) AS l
        FROM e GROUP BY 1, 2),
      fp AS (
        SELECT d.doc_id, coalesce(f.n_win, 0) AS n_win,
               greatest(least(coalesce(f.n_win, 0) - 1, 20), 0)
                 AS fp_bits,
               coalesce(CASE WHEN f.n_win >= 2 THEN
                 list_aggregate(list_transform(
                   range(least(f.n_win - 1, 20)),
                   j -> CASE WHEN f.l[j + 2] > f.l[j + 1]
                        THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
                        ELSE 0 END), 'sum') END, 0) AS fp
        FROM p d LEFT JOIN fl f USING (doc_id)),
      bands AS (
        SELECT doc_id, fp_bits, fp, unnest(range(4)) AS band
        FROM fp),
      b2 AS (
        SELECT doc_id, fp_bits, band,
               (fp >> CAST(band * 5 AS INTEGER)) & 31 AS bucket
        FROM bands),
      bc AS (
        SELECT fp_bits, band, bucket, count(*) AS c
        FROM b2 GROUP BY 1, 2, 3),
      coll AS (
        SELECT b.doc_id, CAST(sum(bc.c - 1) AS BIGINT)
                 AS n_band_collisions
        FROM b2 b JOIN bc ON bc.fp_bits = b.fp_bits
                         AND bc.band = b.band AND bc.bucket = b.bucket
        GROUP BY 1)
      SELECT f.doc_id, f.n_win, CAST(f.fp_bits AS BIGINT) AS fp_bits,
             CAST(f.fp AS BIGINT) AS fp, c.n_band_collisions
      FROM fp f JOIN coll c USING (doc_id)
      ORDER BY f.doc_id""")
  )

  def all: Seq[Q] =
    Seq(binaryStats, decodeFeatures, resize, frameSample, audioEnergy,
      imageDecode, imageResize, wavDecode, pngDecodeQ, jpegDecodeQ,
      quarantineQ, phashQ, phashNearDup, audioFingerprint)
}
