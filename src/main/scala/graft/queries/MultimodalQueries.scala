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

  def all: Seq[Q] = Seq(binaryStats, decodeFeatures)
}
