package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection/redaction — the scrub every corpus runs before text
  * leaves curation, shared verbatim by the batch catalog face
  * (`ta_pii_redact`) and the streaming ingest face
  * (`streaming.Streams.streamingPiiScrub`): one definition of what
  * counts as PII, so batch backfills and live ingest can never drift.
  *
  * Regexes use ASCII-only classes so the Java regex engine (Spark)
  * and RE2 (the DuckDB oracle) agree on every byte. Email classes
  * cover BOTH cases explicitly (emails are case-preserving in the
  * wild — Bob.Smith@Corp.COM must scrub like bob.smith@corp.com; an
  * ASCII [A-Za-z] range keeps Java/RE2 parity without (?i)'s
  * engine-specific Unicode folding). Redaction order
  * (email → ipv4 → phone) is part of the contract: placeholders carry
  * no digits, so later passes can never re-match earlier rewrites.
  *
  * Scale shape: pure per-row regex work — codegen'd built-ins, zero
  * shuffle, stateless (streaming-safe with no watermark needed).
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Attach per-class audit counts (`n_emails`, `n_ips`, `n_phones`)
    * and the redacted `clean_text`. NULL text yields NULL counts and
    * NULL clean_text — the op is total; gate NULLs upstream if the
    * sink requires them scrubbed. */
  def withScrub(df: DataFrame, textCol: String): DataFrame =
    df
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))))
      .withColumn("n_ips",
        size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))))
      .withColumn("clean_text",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
            Ipv4Re, "[IP]"),
          PhoneRe, "[PHONE]"))
}
