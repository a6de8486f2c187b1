package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.functions.Fns
import graft.sources.Tables

/** Scalar-function coverage — SURVEY.md §2.7 (F1–F13), exercised the way
  * the reference's widest query does (jonesy/queries.py:151-204
  * get_term_courses: a single SELECT computing ~20 derived columns).
  * Each Spark expression is paired with the ANSI/DuckDB equivalent to
  * prove the Oracle-dialect deltas (''≡NULL, NULL-tolerant ||, CASE
  * without ELSE) are normalized correctly.
  */
object ScalarFns extends QueryModule {

  /** F1/F3/F4/F6/F7 — catalog parsing + flag booleans + priority CASE,
    * on a synthesized catalog id ('Brand#13' sized 24 PROMO → 'B1324P'
    * style) so prefix/root/suffix extraction has all three parts. */
  val termCourses: Q = Q(
    "ref_term_courses",
    (s, dir) => {
      val p = Tables(s, dir, "part")
      val catalog = concat(
        substring(col("p_brand"), 1, 1),
        Fns.stripLetters(regexp_replace(col("p_brand"), "#", "")),
        when(col("p_type") === "PROMO", "P")
          .when(col("p_type") === "ECONOMY", "E")
          .otherwise(""))
      p.select(
          col("p_partkey").as("course_id"),
          trim(col("p_name")).as("course_title"),
          catalog.as("catalog_nbr"),
          Fns.catalogPrefix(catalog).as("catalog_prefix"),
          Fns.catalogRoot(catalog).as("catalog_root"),
          Fns.catalogSuffix(catalog).as("catalog_suffix"),
          Fns.ynToBool(when(col("p_size") > 20, "Y").otherwise("N"))
            .as("is_large"),
          Fns.toChar(col("p_size")).as("size_str"),
          Fns.priorityRank(col("p_type"),
            Seq("ECONOMY" -> 1, "PROMO" -> 2, "STANDARD" -> 3))
            .as("type_rank"))
        .orderBy("course_id")
    },
    Some("""
      WITH c AS (
        SELECT *,
          substring(p_brand, 1, 1)
          || regexp_replace(regexp_replace(p_brand, '#', ''), '[A-Za-z]', '', 'g')
          || (CASE WHEN p_type = 'PROMO' THEN 'P'
                   WHEN p_type = 'ECONOMY' THEN 'E' ELSE '' END) AS catalog_nbr
        FROM part)
      SELECT p_partkey AS course_id,
             trim(p_name) AS course_title,
             catalog_nbr,
             coalesce(regexp_extract(catalog_nbr, '^([A-Za-z]*)(\d+)([A-Za-z]*)$', 1), '') AS catalog_prefix,
             coalesce(regexp_extract(catalog_nbr, '^([A-Za-z]*)(\d+)([A-Za-z]*)$', 2), '') AS catalog_root,
             coalesce(regexp_extract(catalog_nbr, '^([A-Za-z]*)(\d+)([A-Za-z]*)$', 3), '') AS catalog_suffix,
             CASE WHEN p_size > 20 THEN 'true' ELSE 'false' END AS is_large,
             CAST(p_size AS VARCHAR) AS size_str,
             CASE p_type WHEN 'ECONOMY' THEN 1 WHEN 'PROMO' THEN 2
                         WHEN 'STANDARD' THEN 3 ELSE 5 END AS type_rank
      FROM c ORDER BY course_id""")
  )

  /** F2 — Oracle NULL-tolerant name assembly: NVL2-style conditional
    * spacing, ''≡NULL normalization, null-skipping concat. The "middle
    * name" is synthesized NULL for a slice of rows to hit the NULL path. */
  val fullNames: Q = Q(
    "ref_full_names",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val first = split(col("c_name"), "#").getItem(0)
      val middle = when(col("c_custkey") % 3 === 0, col("c_mktsegment"))
      // try_element_at, not getItem(1): under Spark 4's ANSI default
      // getItem THROWS on a c_name with no '#', where the oracle's
      // string_split(...)[2] returns NULL — NULL-on-missing in both
      // engines (r20 review, probed). getItem(0) stays: split always
      // yields at least one element.
      val last = try_element_at(split(col("c_name"), "#"), lit(2))
      c.select(
          col("c_custkey").as("person_id"),
          Fns.fullName(first, middle, last).as("full_name"),
          Fns.oracleConcat(first, lit("-"), middle).as("tagged_name"))
        .orderBy("person_id")
    },
    Some("""
      SELECT c_custkey AS person_id,
             concat_ws(' ',
               nullif(trim(string_split(c_name, '#')[1]), ''),
               nullif(trim(CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END), ''),
               nullif(trim(string_split(c_name, '#')[2]), '')) AS full_name,
             coalesce(string_split(c_name, '#')[1], '') || '-'
               || coalesce(CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment END, '')
               AS tagged_name
      FROM customer ORDER BY person_id""")
  )

  /** F6 — weekday concat with the CASE-without-ELSE NULL trap
    * (reference: jonesy/queries.py:188-195). Day flags synthesized from
    * key bits so every combination of present/absent days occurs. */
  val meetingDays: Q = Q(
    "ref_meeting_days",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      def flag(bit: Int) =
        when(shiftright(col("o_orderkey"), bit) % 2 === 1, "Y")
          .otherwise("N")
      o.select(
          col("o_orderkey").as("section_id"),
          Fns.weekdayConcat(flag(0), flag(1), flag(2), flag(3),
            flag(4), flag(5), flag(6)).as("meets_days"))
        .orderBy("section_id")
    },
    Some("""
      SELECT o_orderkey AS section_id,
             (CASE WHEN (o_orderkey // 1)  % 2 = 1 THEN 'MO' ELSE '' END)
          || (CASE WHEN (o_orderkey // 2)  % 2 = 1 THEN 'TU' ELSE '' END)
          || (CASE WHEN (o_orderkey // 4)  % 2 = 1 THEN 'WE' ELSE '' END)
          || (CASE WHEN (o_orderkey // 8)  % 2 = 1 THEN 'TH' ELSE '' END)
          || (CASE WHEN (o_orderkey // 16) % 2 = 1 THEN 'FR' ELSE '' END)
          || (CASE WHEN (o_orderkey // 32) % 2 = 1 THEN 'SA' ELSE '' END)
          || (CASE WHEN (o_orderkey // 64) % 2 = 1 THEN 'SU' ELSE '' END)
             AS meets_days
      FROM orders ORDER BY section_id""")
  )

  /** F8/F13 — the timestamp serialization contract
    * (reference: jonesy/jobs.py:166-173): HH:mm meeting times, generic
    * '... UTC' formatting, and the last_updated America/Los_Angeles
    * reinterpretation with a real %z offset (PST/PDT aware). */
  val tsFormats: Q = Q(
    "ref_ts_formats",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      e.select(
          col("event_id"),
          Fns.hhmm(col("ts")).as("hh_mm"),
          Fns.tsUtcFormat(col("ts")).as("utc_fmt"),
          Fns.laReinterpretFormat(col("ts")).as("last_updated_fmt"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id,
             strftime(ts, '%H:%M') AS hh_mm,
             strftime(ts, '%Y-%m-%d %H:%M:%S UTC') AS utc_fmt,
             -- timezone('UTC', ts), NOT ts::TIMESTAMPTZ: the cast
             -- resolves in the SESSION TimeZone (an LA-localized
             -- session makes the conversion the identity and the
             -- offset branch constant), while timezone('UTC', ...)
             -- pins the naive ts as UTC in any session — the same
             -- session-TZ-dependence class r19 fixed in
             -- ev_sliding_window (r20 review, probed under UTC/LA/
             -- Tokyo sessions)
             strftime(timezone('America/Los_Angeles',
                               timezone('UTC', ts)),
                      '%Y-%m-%d %H:%M:%S ')
               || CASE WHEN (epoch(timezone('America/Los_Angeles',
                               timezone('UTC', ts))) - epoch(ts))
                            / 3600 = -7
                       THEN '-0700' ELSE '-0800' END AS last_updated_fmt
      FROM events ORDER BY event_id""")
  )

  def all: Seq[Q] = Seq(termCourses, fullNames, meetingDays, tsFormats)
}
