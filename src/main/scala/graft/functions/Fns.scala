package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function layer — SURVEY.md §2.7 F1–F13.
  *
  * Every transform here is built from codegen'd Spark built-ins (no UDFs,
  * SURVEY.md §2.9): each stays inside whole-stage codegen and is
  * pushdown/pruning-transparent to Catalyst.
  *
  * Oracle-dialect deltas handled here (SURVEY.md §7.3): Oracle treats ''
  * as NULL and `||` is NULL-tolerant; Spark `concat` null-propagates —
  * so concatenation goes through `concat_ws`/`coalesce` forms.
  */
object Fns {

  // F2 — Oracle `||`: NULL behaves as the empty string.
  def oracleConcat(cols: Column*): Column =
    concat(cols.map(c => coalesce(c, lit(""))): _*)

  // F2 — NVL2(x, a, b): a when x is not null else b (exists in Spark SQL
  // as nvl2; Column form spelled out for clarity).
  def nvl2(x: Column, whenNotNull: Column, whenNull: Column): Column =
    when(x.isNotNull, whenNotNull).otherwise(whenNull)

  /** F1/F2 — instructor-style full name: trim parts, join non-null
    * non-empty parts with single spaces (reference: jonesy/queries.py:179-185
    * builds prefix||' '||first||NVL2(middle,' ','')||middle||...).
    * concat_ws skips NULLs; nullif('') emulates Oracle ''≡NULL. */
  def fullName(parts: Column*): Column =
    concat_ws(" ", parts.map(p => nullif(trim(p), lit(""))): _*)

  // F3/F4 — catalog-number surgery (reference: jonesy/queries.py:168-170):
  // 'C103H' → prefix 'C', root '103', suffix 'H'. Regexp form — the
  // Oracle SUBSTR/INSTR/REPLACE dance collapses to one anchor pattern.
  private val CatalogRe = "^([A-Za-z]*)(\\d+)([A-Za-z]*)$"
  def catalogPrefix(c: Column): Column = regexp_extract(c, CatalogRe, 1)
  def catalogRoot(c: Column): Column   = regexp_extract(c, CatalogRe, 2)
  def catalogSuffix(c: Column): Column = regexp_extract(c, CatalogRe, 3)

  // F3 — strip all letters (digits remain).
  def stripLetters(c: Column): Column = regexp_replace(c, "[A-Za-z]", "")

  // F5 — strip newlines/CRs from long titles
  // (reference: jonesy/queries.py:200 REPLACE(x, CHR(10))).
  def stripNewlines(c: Column): Column = regexp_replace(c, "[\\n\\r]", "")

  // F6 — 'Y'/'N' flag → 'true'/'false' string
  // (reference: jonesy/queries.py:161).
  def ynToBool(c: Column): Column =
    when(c === "Y", "true").otherwise("false")

  /** F6 — weekday concat (reference: jonesy/queries.py:188-195):
    * seven CASE columns 'MON'='Y'→'MO' ∥ ... → e.g. 'MOWEFR'. Oracle CASE
    * without ELSE yields NULL, swallowed by `||`; Spark must coalesce
    * each piece to '' before concat. */
  def weekdayConcat(mon: Column, tue: Column, wed: Column, thu: Column,
                    fri: Column, sat: Column, sun: Column): Column = {
    def piece(c: Column, tag: String) =
      coalesce(when(c === "Y", lit(tag)), lit(""))
    concat(piece(mon, "MO"), piece(tue, "TU"), piece(wed, "WE"),
      piece(thu, "TH"), piece(fri, "FR"), piece(sat, "SA"), piece(sun, "SU"))
  }

  // F7 — TO_CHAR(num) → string id.
  def toChar(c: Column): Column = c.cast("string")

  // F8 — TO_CHAR(ts,'HH24:MI') → meeting times.
  def hhmm(c: Column): Column = date_format(c, "HH:mm")

  /** F13a — generic driver-side timestamp serialization:
    * '%Y-%m-%d %H:%M:%S UTC' (reference: jonesy/jobs.py:168-170).
    * Session TZ is pinned UTC (build.sbt) so no shift occurs. */
  def tsUtcFormat(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss 'UTC'")

  /** F13b — the `last_updated` special case (reference:
    * jonesy/jobs.py:166-173): the source labels local America/Los_Angeles
    * wall time as UTC; the driver re-interprets and emits
    * '%Y-%m-%d %H:%M:%S %z'. Deliberately "wrong-looking" — encoded as a
    * named, tested transform (SURVEY.md §7.3). Offset is derived from the
    * instant itself (PST -0800 / PDT -0700), not hard-coded. */
  def laReinterpretFormat(c: Column): Column = {
    val wall = from_utc_timestamp(c, "America/Los_Angeles")
    val offH = ((wall.cast("long") - c.cast("long")) / 3600).cast("int")
    concat(
      date_format(wall, "yyyy-MM-dd HH:mm:ss "),
      format_string("%+03d00", offH))
  }

  /** F12/S7 — md5-dated daily output prefix (reference:
    * jonesy/jobs.py:145-148): 'daily/<md5(yyyy-mm-dd)>-<yyyy-mm-dd>'. */
  def dailyPath(isoDate: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(isoDate.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    s"daily/$hex-$isoDate"
  }

  // O2 — career-priority sort key (reference: jonesy/queries.py:113-120):
  // UGRD=1, GRAD=2, LAW=3, UCBX=4, else 5. Parameterized rank map.
  def priorityRank(c: Column, ranks: Seq[(String, Int)],
                   dflt: Int = 5): Column =
    ranks.foldLeft(when(lit(false), dflt)) { case (acc, (v, r)) =>
      acc.when(c === v, r)
    }.otherwise(dflt)
}
