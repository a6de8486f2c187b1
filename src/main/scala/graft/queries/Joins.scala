package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.sources.Tables

/** Join coverage — SURVEY.md §2.3 (J1–J7).
  *
  * Scale notes (100 TB stance): dimension tables (region/nation/customer-
  * sized) are explicitly `broadcast()` so the fact scan never shuffles for
  * them; fact-fact joins shuffle on their keys once and reuse that
  * partitioning; the correlated patterns from the reference are
  * decorrelated by construction (one shuffle instead of N probes).
  */
object Joins extends QueryModule {

  /** J1 — multi-key equi-join chain (reference: jonesy/queries.py:136-145
    * joins instructor updates ⋈ assigned instructors on 5 keys ⋈ sections
    * on 2). Fixture: lineitem ⋈ orders (fact-fact, shuffle) ⋈ customer ⋈
    * nation ⋈ region (dims, broadcast) → revenue rollup per region. */
  val starJoin: Q = Q(
    "ref_star_join",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(
          count(lit(1)).as("line_count"),
          // Exact integer cents: double→decimal casts round differently
          // in Spark (BigDecimal HALF_UP on the shortest decimal repr)
          // vs DuckDB (binary-value rounding) — ADVICE r2. round(x*100)
          // operates on the same IEEE product in both engines and the
          // long sum is exact and order-independent.
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("revenue_cents"))
        .orderBy("region", "nation")
    },
    Some("""
      SELECT r_name AS region, n_name AS nation,
             count(*) AS line_count,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** J2 — left outer join preserving unmatched left rows
    * (reference: jonesy/queries.py:251-264 LEFT OUTER JOIN chains). */
  val leftJoin: Q = Q(
    "ref_left_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 300000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey").as("custkey"))
        .agg(count(col("o_orderkey")).as("big_orders"))
        .orderBy("custkey")
    },
    Some("""
      SELECT c_custkey AS custkey, count(o_orderkey) AS big_orders
      FROM customer
      LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY 1""")
  )

  /** J4/P7 — the reference's most intricate query (jonesy/queries.py:1-19
    * omit_drops_and_withdrawals): a correlated per-row MIN over the
    * primary section's enrollments consulted inside a CASE predicate.
    * Here: lineitem = enrollment (l_returnflag = grade, l_linestatus =
    * status), orders = primary section, o_orderstatus = grading basis.
    * Spark side decorrelates by construction — pre-aggregate min(grade)
    * per order once (one shuffle) and left-join, instead of N correlated
    * probes. The DuckDB oracle keeps the reference's correlated-subquery
    * shape, proving the rewrite is semantics-preserving. */
  val conditionalJoin: Q = Q(
    "ref_conditional_join",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val enroll = li.filter(col("l_linestatus") =!= "X")
      val primMin = enroll
        .join(o.filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_orderkey").as("pm_orderkey"))
        .agg(min("l_returnflag").as("prim_grade"))
      enroll
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(primMin, col("l_orderkey") === col("pm_orderkey"), "left")
        .filter(
          when(col("o_orderstatus") === "O",
            col("prim_grade").isNotNull && col("prim_grade") =!= "R")
            .otherwise(col("l_returnflag") =!= "R"))
        .select(
          col("l_orderkey").as("orderkey"),
          col("l_linenumber").as("linenumber"),
          col("l_returnflag").as("grade"),
          col("o_orderstatus").as("basis"))
        .orderBy("orderkey", "linenumber")
    },
    Some("""
      SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber,
             l.l_returnflag AS grade, o.o_orderstatus AS basis
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_linestatus <> 'X'
        AND CASE WHEN o.o_orderstatus = 'O' THEN (
              SELECT min(p.l_returnflag) FROM lineitem p
              WHERE p.l_orderkey = l.l_orderkey AND p.l_linestatus <> 'X'
                AND EXISTS (SELECT 1 FROM orders po
                            WHERE po.o_orderkey = p.l_orderkey
                              AND po.o_orderstatus = 'F'))
            ELSE l.l_returnflag END IS NOT NULL
        AND CASE WHEN o.o_orderstatus = 'O' THEN (
              SELECT min(p.l_returnflag) FROM lineitem p
              WHERE p.l_orderkey = l.l_orderkey AND p.l_linestatus <> 'X'
                AND EXISTS (SELECT 1 FROM orders po
                            WHERE po.o_orderkey = p.l_orderkey
                              AND po.o_orderstatus = 'F'))
            ELSE l.l_returnflag END <> 'R'
      ORDER BY orderkey, linenumber""")
  )

  /** J5 — range/containment join with an equi-key component (reference:
    * jonesy/queries.py:266-268 course validity window vs TERM_END_DT).
    * The equi-key (orderkey) keeps the plan a hash/sort-merge join with
    * the range as a residual — not a nested-loop (SURVEY.md §7.3). */
  val rangeJoin: Q = Q(
    "ref_range_join",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      li.join(o,
          li("l_orderkey") === o("o_orderkey") &&
            li("l_shipdate") >= o("o_orderdate") &&
            // + INTERVAL, not date_add: date_add TRUNCATES the
            // timestamp to DATE before adding, while the oracle's
            // o_orderdate + INTERVAL 90 DAY keeps any time-of-day —
            // midnight-only fixtures hide the divergence until a
            // regeneration arms it (r19 review)
            li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("shipped_in_window"))
        .orderBy("priority")
    },
    Some("""
      SELECT o_orderpriority AS priority, count(*) AS shipped_in_window
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate >= o_orderdate
        AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      GROUP BY 1 ORDER BY 1""")
  )

  /** J7 — semi join: the reference hand-rolls existence via LEFT JOIN +
    * IS NOT NULL (jonesy/queries.py:10-17); idiomatic Spark is
    * left_semi — no duplicate amplification, no post-filter. */
  val semiJoin: Q = Q(
    "ref_semi_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
        .orderBy("custkey")
    },
    Some("""
      SELECT c_custkey AS custkey, c_name AS name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'O')
      ORDER BY custkey""")
  )

  /** J7 — anti join (complement of the semi). */
  val antiJoin: Q = Q(
    "ref_anti_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
        .orderBy("custkey")
    },
    Some("""
      SELECT c_custkey AS custkey, c_name AS name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'O')
      ORDER BY custkey""")
  )

  /** J3 variant — argmax with a sentinel-date OR-escape (reference:
    * jonesy/queries.py:269-283: latest updatedDate per course unless the
    * sentinel 1901-01-01 marks a legacy row that always survives). */
  val argmaxSentinel: Q = Q(
    "ref_argmax_sentinel",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val latest = li.groupBy(col("l_orderkey").as("g_orderkey"))
        .agg(max("l_shipdate").as("max_ship"))
      // No broadcast hint: `latest` scales with the fact table, so at
      // data scale AQE keeps this a shuffle join; at bench SF the
      // stats put `latest` under the broadcast threshold and Spark
      // broadcasts it — both plans are the right call for their size.
      // r10 flag post-mortem (0.83→1.31 s, unresolved): the plan is
      // clean (sentinel constant-folded, no per-row casts, filters
      // pushed); standalone the query measures ~0.95-1.0 s median
      // while the driver's number came mid-147-query process, and the
      // fixtures regenerate every round (l_shipdate shipped as a new
      // timestamp_ntz encoding in r10), so the comparison base and
      // the measurement crossed both a fixture and a process-state
      // boundary. No code change between the two numbers.
      li.join(latest, col("l_orderkey") === col("g_orderkey"))
        .filter(col("l_shipdate") === col("max_ship") ||
          col("l_shipdate") === to_timestamp(lit("1901-01-01")))
        .select(
          col("l_orderkey").as("orderkey"),
          col("l_linenumber").as("linenumber"),
          col("l_shipdate").as("shipdate"))
        .orderBy("orderkey", "linenumber")
    },
    Some("""
      SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             l_shipdate AS shipdate
      FROM lineitem l
      WHERE l_shipdate = (SELECT max(i.l_shipdate) FROM lineitem i
                          WHERE i.l_orderkey = l.l_orderkey)
         OR l_shipdate = TIMESTAMP '1901-01-01'
      ORDER BY orderkey, linenumber""")
  )

  /** The reference's deprecated course path composed as ONE plan
    * (reference: jonesy/queries.py:246-283 get_term_courses_deprecated):
    * sections JOIN the career-filtered term table, a 4-deep LEFT-JOIN
    * chain (display-name translation → versioned course catalog →
    * meetings → instructors), a validity-window containment against the
    * term's end date, and an argmax-with-sentinel over catalog versions.
    * Each piece is covered alone (ref_left_join / ref_range_join /
    * ref_argmax_sentinel); this exercises the COMPOSITION, where
    * join-order and pushdown surprises live. Fixture roles: lineitem =
    * sections (term = ship month), month table from 'F'-status orders =
    * EXTENDED_TERM_MVW (career filter), part = DISPLAYNAMEXLAT, orders
    * re-read = versioned API_COURSE (customer key as displayName, order
    * date as updatedDate), supplier = MEETING, nation = INSTRUCTOR.
    *
    * Catalyst/scale notes: the term lands on the sec scan as a pushable
    * timestamp range (the reference inlines the term id as a literal);
    * the WHERE's range + argmax predicates are null-intolerant on crs
    * columns, so Catalyst converts the xlat/crs LEFT JOINs to inner —
    * the same inner-ization Oracle applies to the reference's query.
    * The correlated MAX decorrelates by construction into one aggregate
    * + equi-join; its term2 lookup rides a literal-key broadcast whose
    * constant key folds away, leaving a 1×N broadcast loop over the
    * single-row term table — the correct scalar-attach plan at any
    * scale, allowlisted in PlanAuditSpec. Dims
    * (term/part/supplier/nation) broadcast; the only shuffled joins are
    * sec⋈crs and crs⋈argmax, both keyed on the catalog key so the
    * exchange is reused. The sentinel-date escape can't fire on this
    * data (no 1901 dates) — it is exercised structurally, as in
    * ref_argmax_sentinel. */
  val termCoursesDeprecated: Q = Q(
    "ref_term_courses_deprecated",
    (s, dir) => {
      val termId = "199506"
      val lo = lit("1995-06-01").cast("timestamp")
      val hi = lit("1995-07-01").cast("timestamp")
      val sentinel = lit("1901-01-01").cast("timestamp")
      val o = Tables(s, dir, "orders")
      val term1 = o
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(date_format(col("o_orderdate"), "yyyyMM").as("t_term_id"),
          last_day(col("o_orderdate")).cast("timestamp").as("term_end"))
        .distinct()
      val sec = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .withColumn("term_id", date_format(col("l_shipdate"), "yyyyMM"))
      val crs = o.select(col("o_custkey").as("crs_key"),
        col("o_orderdate").as("course_updated_date"),
        col("o_orderpriority").as("course_priority"))
      val inWindow: Column => Column = d =>
        d <= col("term_end") &&
          d + expr("INTERVAL 24 MONTHS") >= col("term_end")
      val latest = o.withColumn("t_term_id", lit(termId))
        .join(broadcast(term1), "t_term_id")
        .filter(inWindow(col("o_orderdate")) ||
          col("o_orderdate") === sentinel)
        .groupBy(col("o_custkey").as("mx_key"))
        .agg(max("o_orderdate").as("max_updated"))
      sec
        .join(broadcast(term1), col("term_id") === col("t_term_id"))
        .join(broadcast(Tables(s, dir, "part")),
          col("p_partkey") === col("l_partkey"), "left")
        .join(crs, col("crs_key") === col("p_partkey"), "left")
        .join(broadcast(Tables(s, dir, "supplier")),
          col("s_suppkey") === col("l_suppkey"), "left")
        .join(broadcast(Tables(s, dir, "nation")),
          col("n_nationkey") === col("s_nationkey"), "left")
        .join(latest, col("mx_key") === col("crs_key"), "left")
        .filter(inWindow(col("course_updated_date")) &&
          col("course_updated_date") === col("max_updated"))
        .select(
          col("l_orderkey").as("section_key"),
          col("l_linenumber").as("section_num"),
          col("term_id"),
          col("p_type").as("dept_code"),
          col("p_brand").as("catalog_nbr"),
          trim(col("p_name")).as("course_title"),
          col("course_updated_date"),
          col("course_priority"),
          col("s_name").as("location"),
          col("n_name").as("instructor_region"),
          col("l_quantity").as("units"),
          col("l_returnflag").as("enrollment_status"))
        .distinct()
        .orderBy("section_key", "section_num", "course_updated_date",
          "course_priority")
    },
    Some("""
      WITH term1 AS (
        SELECT DISTINCT strftime(o_orderdate, '%Y%m') AS t_term_id,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
                 AS term_end
        FROM orders
        WHERE o_orderstatus = 'F'
          AND o_orderdate >= TIMESTAMP '1995-06-01'
          AND o_orderdate < TIMESTAMP '1995-07-01')
      SELECT DISTINCT
        sec.l_orderkey AS section_key, sec.l_linenumber AS section_num,
        strftime(sec.l_shipdate, '%Y%m') AS term_id,
        xlat.p_type AS dept_code, xlat.p_brand AS catalog_nbr,
        trim(xlat.p_name) AS course_title,
        crs.o_orderdate AS course_updated_date,
        crs.o_orderpriority AS course_priority,
        mtg.s_name AS location, instr.n_name AS instructor_region,
        sec.l_quantity AS units, sec.l_returnflag AS enrollment_status
      FROM lineitem sec
      JOIN term1 ON term1.t_term_id = strftime(sec.l_shipdate, '%Y%m')
      LEFT JOIN part xlat ON xlat.p_partkey = sec.l_partkey
      LEFT JOIN orders crs ON crs.o_custkey = xlat.p_partkey
      LEFT JOIN supplier mtg ON mtg.s_suppkey = sec.l_suppkey
      LEFT JOIN nation instr ON instr.n_nationkey = mtg.s_nationkey
      WHERE sec.l_shipdate >= TIMESTAMP '1995-06-01'
        AND sec.l_shipdate < TIMESTAMP '1995-07-01'
        AND crs.o_orderdate <= term1.term_end
        AND crs.o_orderdate + INTERVAL 24 MONTH >= term1.term_end
        AND crs.o_orderdate = (
          SELECT max(crs2.o_orderdate)
          FROM orders crs2, term1 term2
          WHERE crs2.o_custkey = crs.o_custkey
            AND ((crs2.o_orderdate <= term2.term_end
                  AND crs2.o_orderdate + INTERVAL 24 MONTH >= term2.term_end)
                 OR crs2.o_orderdate = TIMESTAMP '1901-01-01'))
      ORDER BY section_key, section_num, course_updated_date,
               course_priority""")
  )

  def all: Seq[Q] = Seq(starJoin, leftJoin, conditionalJoin, rangeJoin,
    semiJoin, antiJoin, argmaxSentinel, termCoursesDeprecated)
}
