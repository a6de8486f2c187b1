package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryModule}
import graft.sources.Tables

/** Relational completions — SURVEY.md §2.8 set operations, §2.4 A5
  * (rollup/cube/distinct aggregates), and §2.6 O5 (ordered pagination).
  * The reference has none of these as explicit operators (set ops are
  * absent; pagination is client-side ROWNUM batching, S3/O5); in a Spark
  * engine they are first-class and come straight from Catalyst.
  *
  * Scale stance: set ops and grouped aggs shuffle once on their keys;
  * rollup/cube expand grouping sets map-side before one shuffle. The
  * pagination port is literal parity only — a global row_number is a
  * single-partition sort by construction and documented as such; at
  * scale the partitioned scan replaces it (SURVEY.md S3).
  */
object Relational extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** §2.8 — UNION (distinct): premium-segment ∪ high-balance customers. */
  val union: Q = Q(
    "rel_union",
    (s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
        .union(c.filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("custkey")))
        .distinct()
        .orderBy("custkey")
    },
    Some("""
      SELECT c_custkey AS custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE'
      UNION
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
      ORDER BY custkey""")
  )

  /** §2.8 — INTERSECT: customers in the segment AND above balance. */
  val intersect: Q = Q(
    "rel_intersect",
    (s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
        .intersect(c.filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey")))
        .orderBy("custkey")
    },
    Some("""
      SELECT c_custkey AS custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE'
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      ORDER BY custkey""")
  )

  /** §2.8 — EXCEPT: segment customers without a filed ('F') order. */
  val except: Q = Q(
    "rel_except",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_custkey").as("custkey"))
        .except(o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },
    Some("""
      SELECT c_custkey AS custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY custkey""")
  )

  /** §2.4 A5 — ROLLUP over the region→nation hierarchy: per-nation,
    * per-region subtotal, and grand-total customer counts in one pass
    * (grouping sets expand before a single shuffle). Null ordering is
    * pinned NULLS FIRST on both sides — the engines' defaults differ. */
  val rollup: Q = Q(
    "rel_rollup",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(asc_nulls_first("region"), asc_nulls_first("nation"))
    },
    Some("""
      SELECT r_name AS region, n_name AS nation,
             count(*) AS n_customers
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY region NULLS FIRST, nation NULLS FIRST""")
  )

  /** §2.4 A5 — CUBE over two independent dimensions with an exact-cents
    * revenue measure (double sums are order-dependent; cents are not). */
  val cube: Q = Q(
    "rel_cube",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment").as("segment"),
          col("o_orderstatus").as("status"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long"))
            .as("revenue_cents"))
        .orderBy(asc_nulls_first("segment"), asc_nulls_first("status"))
    },
    Some("""
      SELECT c_mktsegment AS segment, o_orderstatus AS status,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY CUBE(c_mktsegment, o_orderstatus)
      ORDER BY segment NULLS FIRST, status NULLS FIRST""")
  )

  /** §2.4 A5 — distinct aggregate alongside plain aggregates: per
    * segment, distinct nations represented, customer count, and exact
    * total balance in cents. */
  val distinctAgg: Q = Q(
    "rel_distinct_agg",
    (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"),
          sum(round(col("c_acctbal") * 100).cast("long"))
            .as("balance_cents"))
        .orderBy("segment"),
    Some("""
      SELECT c_mktsegment AS segment,
             count(DISTINCT c_nationkey) AS n_nations,
             count(*) AS n_customers,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS balance_cents
      FROM customer GROUP BY 1 ORDER BY 1""")
  )

  /** §2.6 O5 — ordered pagination window (reference: jonesy/queries.py:37-48
    * `ROWNUM <= hi / rnum > lo` over a stable ORDER BY, batch 2 of the
    * driver loop). Literal parity port: row_number over a global order is
    * a single-partition sort and exists only to mirror the reference's
    * client-side batching — a partitioned scan replaces it at scale. */
  val pagination: Q = Q(
    "rel_pagination",
    (s, dir) => {
      val w = Window.orderBy("orderkey")
      t(s, dir, "orders")
        .select(col("o_orderkey").as("orderkey"),
          col("o_custkey").as("custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") > 100 && col("rn") <= 200)
        .orderBy("rn")
    },
    Some("""
      SELECT orderkey, custkey, rn FROM (
        SELECT o_orderkey AS orderkey, o_custkey AS custkey,
               row_number() OVER (ORDER BY o_orderkey) AS rn
        FROM orders)
      WHERE rn > 100 AND rn <= 200
      ORDER BY rn""")
  )

  /** §2.6 O5 (scale path) — KEYSET pagination: the next page is "first
    * `pageSize` keys above the last key seen", a pushable range
    * predicate + distributed top-k (TakeOrderedAndProject) instead of
    * `rel_pagination`'s global row_number window (a single-partition
    * sort at any scale). This is the shape a 100 TB driver loop
    * actually runs: each page costs one pruned scan + k rows, and the
    * cursor (the last key) replaces the row offset. */
  val keysetPagination: Q = Q(
    "rel_keyset_pagination",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") > 400)
        .select(col("o_orderkey").as("orderkey"),
          col("o_custkey").as("custkey"))
        .orderBy("orderkey")
        .limit(100),
    Some("""
      SELECT o_orderkey AS orderkey, o_custkey AS custkey
      FROM orders WHERE o_orderkey > 400
      ORDER BY orderkey LIMIT 100""")
  )

  /** §2.12 ext — deterministic hash sampling, the curation primitive a
    * training-data pipeline uses instead of RNG sampling: keep a row
    * iff the first hex byte of md5(key) falls under the rate (here
    * 0x40/0x100 = 25%). Reproducible across engines, runs, and
    * cluster sizes (no seed, no partition dependence), and it stays a
    * narrow codegen'd filter — no shuffle, no sort, sample-then-join
    * lines up on both sides of any later equi-join on the same key.
    * Lowercase-hex string comparison ≡ numeric comparison, so the
    * oracle replays it verbatim. */
  val hashSample: Q = Q(
    "rel_hash_sample",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 2) < "40")
        .select(col("o_orderkey").as("orderkey"),
          col("o_custkey").as("custkey"),
          col("o_orderstatus").as("status"))
        .orderBy("orderkey"),
    Some("""
      SELECT o_orderkey AS orderkey, o_custkey AS custkey,
             o_orderstatus AS status
      FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '40'
      ORDER BY orderkey""")
  )

  /** §2.12 ext — stratified quota sampling: an equal-sized,
    * deterministic sample PER STRATUM (segment), the balanced-mixture
    * primitive for corpus curation. Rows rank within their stratum by
    * md5(key) — a uniform but reproducible order — and the first
    * `quota` win. One shuffle on the stratum key; each stratum ranks in
    * parallel (contrast with the global-window pagination port). */
  val stratifiedSample: Q = Q(
    "rel_stratified_sample",
    (s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 40)
        .select(col("c_mktsegment").as("segment"),
          col("c_custkey").as("custkey"), col("rn"))
        .orderBy("segment", "rn")
    },
    Some("""
      SELECT c_mktsegment AS segment, c_custkey AS custkey, rn FROM (
        SELECT c_mktsegment, c_custkey,
               row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
        FROM customer)
      WHERE rn <= 40
      ORDER BY segment, rn""")
  )

  /** §2.4 ext — PIVOT: order-status counts spread to columns per
    * segment. Spark `.pivot(col, values)` with explicit values keeps
    * the output schema static (required at scale — value discovery is
    * an extra job); missing combinations are 0 on both sides (Spark
    * pivot yields null there, DuckDB's FILTER count yields 0 —
    * coalesced to match). */
  val pivot: Q = Q(
    "rel_pivot",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("segment"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("segment")
    },
    Some("""
      SELECT c_mktsegment AS segment,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""")
  )

  /** §2.4 A5 ext — sketch aggregates: HyperLogLog++ distinct counts and
    * t-digest quantiles per segment. Sketch internals differ across
    * engines by design, so there is no SQL oracle; this face is
    * therefore SPEC-CERTIFIED (SketchSpec runs it and bounds its error
    * against exact answers) and deliberately NOT in the driver catalog
    * — every `SparkEntry.queries` entry must hash-match its oracle,
    * and a rows-only row would be the one untested claim in
    * CORRECTNESS (VERDICT r8). The catalog's hash-checked view of the
    * same capability is [[sketchBound]], which replays the exact
    * counts and pins the estimate inside its error bound. At 100 TB
    * these sketches are the only affordable distinct/quantile forms:
    * mergeable, fixed memory, one pass. */
  val sketchAgg: Q = Q(
    "rel_sketch_agg",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.05)
            .as("approx_customers"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
            .as("approx_median_price"))
        .orderBy("priority"),
    None // sketch internals are engine-specific — spec-only face
  )

  /** A5 companion — the sketch's accuracy made driver-visible:
    * rel_sketch_agg is rows-only by design (HLL internals are
    * engine-specific), so THIS query closes the loop by computing the
    * exact distinct count and the HLL++ estimate in one pass and
    * emitting a hash-checked boolean that the estimate lands within
    * 3×rsd (0.15 relative at rsd=0.05 — a ≥3σ bound for HLL++'s error
    * distribution, deterministic for a fixed input since the sketch is
    * seed-free). The oracle pins `within_bound` to TRUE per group and
    * replays the exact count, so the one non-hash-checked catalog
    * entry has a hash-checked accuracy certificate next to it.
    * Scale: one shuffle; the exact countDistinct is the expensive
    * exactness baseline (it expands per-key), present here exactly to
    * certify the cheap sketch a 100 TB run would use alone. */
  val sketchBound: Q = Q(
    "rel_sketch_bound",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          countDistinct(col("o_custkey")).as("exact_customers"),
          approx_count_distinct(col("o_custkey"), rsd = 0.05)
            .as("approx"))
        .select(col("priority"), col("exact_customers"),
          (abs(col("approx") - col("exact_customers")) <=
            col("exact_customers") * 0.15).as("within_bound"))
        .orderBy("priority"),
    Some("""
      SELECT o_orderpriority AS priority,
             count(DISTINCT o_custkey) AS exact_customers,
             TRUE AS within_bound
      FROM orders GROUP BY 1 ORDER BY 1""")
  )

  /** §2.4 A5 — explicit GROUPING SETS with grouping_id: the two
    * single-dimension rollups in one pass (the shape neither ROLLUP nor
    * CUBE expresses), disambiguating real NULL group keys from
    * subtotal rows via grouping_id. DataFrame API has rollup/cube only,
    * so this goes through the SQL face over a temp view. */
  val groupingSets: Q = Q(
    "rel_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("gs_orders")
      s.sql("""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS n
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY gid, status NULLS FIRST, priority NULLS FIRST""")
    },
    Some("""
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
               AS gid,
             count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY gid, status NULLS FIRST, priority NULLS FIRST""")
  )

  /** Skew-proof aggregation as a catalog face — the Partitioning
    * toolkit's salted two-phase stats (operators.Partitioning
    * .saltedStats) certified against a plain single-phase GROUP BY
    * oracle. `documents.lang` is the worst-case agg key: a handful of
    * values over the whole corpus, so an unsalted groupBy lands entire
    * languages on single reducers. Phase 1 spreads each language over
    * 8 deterministic salt reducers (row-hash salt, never rand() —
    * retry/replay-stable), phase 2 merges 8 partials per language —
    * correct for the count/sum/min/max family by algebraic
    * decomposability, and at 100 TB the difference between 5 working
    * reducers and a stuck one. (Spark's map-side partial aggregation
    * covers this for in-memory hash tables; explicit salting is the
    * contract when partials spill or the agg is holistic.) */
  val saltedAgg: Q = Q(
    "rel_salted_agg",
    (s, dir) => graft.operators.Partitioning
      .saltedStats(t(s, dir, "documents"), "lang", "n_chars", 8)
      .select(col("lang"), col("n_rows").as("n_docs"),
        col("sum_val").as("total_chars"), col("min_val").as("min_chars"),
        col("max_val").as("max_chars"))
      .orderBy("lang"),
    Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             min(n_chars) AS min_chars, max(n_chars) AS max_chars
      FROM documents GROUP BY 1 ORDER BY 1""")
  )

  /** Approximate-quantile certification — percentile_approx (the
    * KLL/t-digest-family sketch Spark aggregates in one pass with
    * mergeable partials, the 100 TB quantile path) certified against
    * the EXACT per-group p40/p60 band: with accuracy 10000 the rank
    * error is 1e-4·n, so the approx median must land far inside the
    * ±10%-rank band. Like rel_sketch_bound, the engine-specific
    * estimate never reaches the output — only the boolean and the
    * exact group stats do, so the oracle states the bound as TRUE and
    * the hash check proves it. */
  val quantileBound: Q = Q(
    "rel_quantile_bound",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          count(lit(1)).as("n_orders"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("approx_p50"),
          expr("percentile(o_totalprice, 0.4)").as("lo"),
          expr("percentile(o_totalprice, 0.6)").as("hi"))
        .select(col("priority"), col("n_orders"),
          (col("approx_p50") >= col("lo") &&
            col("approx_p50") <= col("hi")).as("within_bound"))
        .orderBy("priority"),
    Some("""
      SELECT o_orderpriority AS priority, count(*) AS n_orders,
             TRUE AS within_bound
      FROM orders GROUP BY 1 ORDER BY 1""")
  )

  /** Single-pass column profiler (operators.Profiler) — the per-column
    * null/distinct/min/max report a lake runs over an incoming drop.
    * The oracle SQL is deliberately the NAIVE form (one SELECT per
    * column, UNION ALL — N scans); the Spark plan folds all metrics
    * into one `agg`, scanning the table once. min/max stay in typed
    * columns (numeric as double, string as string) — never a double
    * formatted through a string, which would tie the hash to engine
    * float printing. */
  val profile: Q = Q(
    "rel_profile",
    (s, dir) => graft.operators.Profiler.profile(
      t(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")),
    Some {
      def numRow(c: String) =
        s"""SELECT '$c' AS col_name,
               count(*) - count($c) AS n_nulls,
               count(DISTINCT $c) AS n_distinct,
               CAST(min($c) AS DOUBLE) AS min_num,
               CAST(max($c) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
             FROM orders"""
      def strRow(c: String) =
        s"""SELECT '$c' AS col_name,
               count(*) - count($c) AS n_nulls,
               count(DISTINCT $c) AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_num,
               CAST(NULL AS DOUBLE) AS max_num,
               min($c) AS min_str, max($c) AS max_str
             FROM orders"""
      Seq(numRow("o_orderkey"), numRow("o_custkey"),
        strRow("o_orderstatus"), numRow("o_totalprice"),
        strRow("o_orderpriority"))
        .mkString("SELECT * FROM (", " UNION ALL ",
          ") ORDER BY col_name")
    }
  )

  /** Z-order layout report (operators.ZOrder) — both dims scaled to 4
    * bits, interleaved, and the 8-bit key space cut into 16 contiguous
    * chunks (= the 16 files a z-ordered write would produce). The
    * result row per chunk carries min/max of BOTH raw columns: every
    * chunk bounds custkey to ~1/4 of its range AND nationkey to ~1/4
    * of its range — the quantitative form of "a filter on either
    * column prunes ~3/4 of the files", which a single-column sort
    * gives for one dimension only. The per-dimension scaling bounds
    * come from a 1-row min/max aggregate broadcast-cross-joined back
    * (the ev_watermark pattern — one DAG, no driver round-trip, no
    * sf-dependent constants); the quotient of exactly-representable
    * ints through one correctly-rounded division keeps floor()
    * engine-identical. The interleave itself is integer shift/and/add
    * (codegen'd, oracle-identical). */
  val zorder: Q = Q(
    "rel_zorder",
    (s, dir) => {
      import graft.operators.ZOrder
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val bounds = c.agg(
        min("c_custkey").as("min_c"), max("c_custkey").as("max_c"),
        min("c_nationkey").as("min_n"), max("c_nationkey").as("max_n"))
      val scaled = c.crossJoin(broadcast(bounds))
        .withColumn("a_s", floor((col("c_custkey") - col("min_c")) * 16 /
          (col("max_c") - col("min_c") + 1)))
        .withColumn("b_s", floor((col("c_nationkey") - col("min_n")) * 16 /
          (col("max_n") - col("min_n") + 1)))
      scaled
        .withColumn("chunk",
          shiftright(ZOrder.key2(col("a_s"), col("b_s"), 4), 4))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_rows"),
          min("c_custkey").as("min_cust"),
          max("c_custkey").as("max_cust"),
          min("c_nationkey").as("min_nation"),
          max("c_nationkey").as("max_nation"))
        .orderBy("chunk")
    },
    Some(s"""
      WITH b AS (
        SELECT min(c_custkey) AS min_c, max(c_custkey) AS max_c,
               min(c_nationkey) AS min_n, max(c_nationkey) AS max_n
        FROM customer),
      scaled AS (
        SELECT c_custkey, c_nationkey,
               CAST(floor((c_custkey - min_c) * 16
                 / (max_c - min_c + 1)) AS BIGINT) AS a_s,
               CAST(floor((c_nationkey - min_n) * 16
                 / (max_n - min_n + 1)) AS BIGINT) AS b_s
        FROM customer, b),
      z AS (
        SELECT c_custkey, c_nationkey,
               ${graft.operators.ZOrder.duckKeyExpr2("a_s", "b_s", 4)}
                 AS zkey
        FROM scaled)
      SELECT zkey >> 4 AS chunk, count(*) AS n_rows,
             min(c_custkey) AS min_cust, max(c_custkey) AS max_cust,
             min(c_nationkey) AS min_nation,
             max(c_nationkey) AS max_nation
      FROM z GROUP BY 1 ORDER BY 1""")
  )

  /** ZONE-MAP PRUNING QUANTIFIED (r12) — the payoff measurement for
    * [[zorder]]: the same 16-bucket scaling builds per-chunk
    * (min, max) zone maps under TWO layouts — z-ordered chunks
    * (`zkey >> 4`, both dimensions bounded per chunk) and a LINEAR
    * single-column sort (chunks = custkey buckets) — and a fixed
    * bounds-relative 2-D predicate box (middle 25% of custkey ×
    * 6-value nationkey band) is tested against every chunk's bounds.
    * A chunk is SCANNED iff its rectangle intersects the box — the
    * exact skipping rule parquet row-group min/max stats give a
    * reader. Per layout: chunk counts, scanned chunks, scanned rows,
    * matching rows (identical across layouts by construction — the
    * layout changes what you READ, never what you FIND), and the
    * skip permille. The linear layout prunes one dimension
    * perfectly and the other not at all; z-order bounds both, which
    * is the whole case for Morton layout stated as data.
    *
    * Scale shape: one scan → two bounded groupBys (≤ 16/256 chunk
    * rows) → two 2-row summaries. The 1-row bounds attach is the
    * histogram idiom. */
  val zonemapPrune: Q = Q(
    "rel_zonemap_prune",
    (s, dir) => {
      import graft.operators.ZOrder
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val bounds = c.agg(
        min("c_custkey").as("min_c"), max("c_custkey").as("max_c"),
        min("c_nationkey").as("min_n"), max("c_nationkey").as("max_n"))
      val scaled = c.crossJoin(broadcast(bounds))
        .withColumn("a_s", floor((col("c_custkey") - col("min_c")) * 16 /
          (col("max_c") - col("min_c") + 1)))
        .withColumn("b_s", floor((col("c_nationkey") - col("min_n")) * 16 /
          (col("max_n") - col("min_n") + 1)))
        // the predicate box, bounds-relative so every sf exercises it
        .withColumn("clo",
          col("min_c") + expr("(max_c - min_c + 1) div 4"))
        .withColumn("chi",
          col("min_c") + expr("(max_c - min_c + 1) div 2"))
        .withColumn("nlo", col("min_n") + 2)
        .withColumn("nhi", col("min_n") + 7)
        .withColumn("matches",
          when(col("c_custkey").between(col("clo"), col("chi")) &&
            col("c_nationkey").between(col("nlo"), col("nhi")), 1L)
            .otherwise(0L))
      def layout(name: String, chunk: org.apache.spark.sql.Column) =
        scaled
          .withColumn("chunk", chunk)
          .groupBy("chunk")
          .agg(count(lit(1)).as("n_rows"), sum("matches").as("n_match"),
            min("c_custkey").as("lo_c"), max("c_custkey").as("hi_c"),
            min("c_nationkey").as("lo_n"), max("c_nationkey").as("hi_n"),
            max("clo").as("clo"), max("chi").as("chi"),
            max("nlo").as("nlo"), max("nhi").as("nhi"))
          .withColumn("scanned",
            when(col("hi_c") >= col("clo") && col("lo_c") <= col("chi") &&
              col("hi_n") >= col("nlo") && col("lo_n") <= col("nhi"), 1L)
              .otherwise(0L))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum("scanned").as("n_chunks_scanned"),
            sum(col("scanned") * col("n_rows")).as("rows_scanned"),
            sum("n_match").as("rows_matching"),
            sum("n_rows").as("n_rows_total"))
          .select(lit(name).as("layout"), col("n_chunks"),
            col("n_chunks_scanned"), col("rows_scanned"),
            col("rows_matching"),
            expr("((n_rows_total - rows_scanned) * 1000)" +
              " div n_rows_total").as("skip_permille"))
      layout("linear_custkey", col("a_s"))
        .unionAll(layout("zorder",
          shiftright(ZOrder.key2(col("a_s"), col("b_s"), 4), 4)))
        .orderBy("layout")
    },
    Some(s"""
      WITH b AS (
        SELECT min(c_custkey) AS min_c, max(c_custkey) AS max_c,
               min(c_nationkey) AS min_n, max(c_nationkey) AS max_n
        FROM customer),
      scaled AS (
        SELECT c_custkey, c_nationkey,
               CAST(floor((c_custkey - min_c) * 16
                 / (max_c - min_c + 1)) AS BIGINT) AS a_s,
               CAST(floor((c_nationkey - min_n) * 16
                 / (max_n - min_n + 1)) AS BIGINT) AS b_s,
               min_c + (max_c - min_c + 1) // 4 AS clo,
               min_c + (max_c - min_c + 1) // 2 AS chi,
               min_n + 2 AS nlo, min_n + 7 AS nhi,
               CASE WHEN c_custkey
                      BETWEEN min_c + (max_c - min_c + 1) // 4
                          AND min_c + (max_c - min_c + 1) // 2
                     AND c_nationkey
                      BETWEEN min_n + 2 AND min_n + 7
                    THEN 1 ELSE 0 END AS matches
        FROM customer, b),
      chunks AS (
        SELECT layout, chunk, count(*) AS n_rows,
               sum(matches) AS n_match,
               min(c_custkey) AS lo_c, max(c_custkey) AS hi_c,
               min(c_nationkey) AS lo_n, max(c_nationkey) AS hi_n,
               max(clo) AS clo, max(chi) AS chi,
               max(nlo) AS nlo, max(nhi) AS nhi
        FROM (
          SELECT 'linear_custkey' AS layout, a_s AS chunk, *
          FROM scaled
          UNION ALL
          SELECT 'zorder' AS layout,
                 (${graft.operators.ZOrder.duckKeyExpr2(
                    "a_s", "b_s", 4)}) >> 4 AS chunk, *
          FROM scaled)
        GROUP BY 1, 2),
      flags AS (
        SELECT layout, n_rows, n_match,
               CASE WHEN hi_c >= clo AND lo_c <= chi
                     AND hi_n >= nlo AND lo_n <= nhi
                    THEN 1 ELSE 0 END AS scanned
        FROM chunks)
      SELECT layout,
             count(*) AS n_chunks,
             CAST(sum(scanned) AS BIGINT) AS n_chunks_scanned,
             CAST(sum(scanned * n_rows) AS BIGINT) AS rows_scanned,
             CAST(sum(n_match) AS BIGINT) AS rows_matching,
             CAST((sum(n_rows) - sum(scanned * n_rows)) * 1000
               // sum(n_rows) AS BIGINT) AS skip_permille
      FROM flags GROUP BY 1 ORDER BY 1""")
  )

  /** ORDER-INDEPENDENT TABLE CHECKSUM — the migration-validation op:
    * after any copy/convert/re-partition of a 100 TB table, one number
    * per side answers "did every row survive, byte-identical?" without
    * moving data between environments. Per-row digest = the first 12
    * hex chars of md5 over a canonical '|'-joined serialization
    * (48 bits — any engine can parse it into an exact BIGINT), reduced
    * by SUM, which commutes — partition order, parallelism, and row
    * order cannot change the result (the ReproducibilitySpec
    * property). The sum stays exact: 48-bit terms × up to 2⁴ doc
    * groups per row here, and at corpus scale 2⁴⁸·N < 2⁶³ holds to
    * N ≈ 32 trillion rows. Count rides along so a checksum collision
    * on differing cardinalities cannot mask a loss.
    *
    * Scale shape: one scan, map-side partial sums, a single-row
    * result — the cheapest possible full-table audit. */
  val tableChecksum: Q = Q(
    "rel_table_checksum",
    (s, dir) =>
      t(s, dir, "documents")
        // concat (not concat_ws): NULL-strict like the oracle's `||`,
        // so a NULL anywhere nulls the row digest in BOTH engines and
        // the sum skips it identically
        .select(conv(substring(md5(concat(
            col("doc_id").cast("string"), lit("|"), col("text"), lit("|"),
            col("lang"), lit("|"), col("source"), lit("|"),
            col("n_chars").cast("string"))), 1, 12), 16, 10)
          .cast("long").as("h"))
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum")),
    Some("""
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(CAST('0x' || substr(md5(
               CAST(doc_id AS VARCHAR) || '|' || text || '|' || lang ||
               '|' || source || '|' || CAST(n_chars AS VARCHAR)),
               1, 12) AS BIGINT) AS BIGINT)) AS BIGINT) AS checksum
      FROM documents""")
  )

  /** SALTED-JOIN certification — the skew rewrite with an oracle: the
    * fact side joins the supplier dimension through
    * `Partitioning.saltedJoin` (row-hash salt on the fact, ×salts
    * replication of the dimension), and the result must be
    * BYTE-IDENTICAL to the plain inner join the oracle runs. This is
    * the claim that matters about salting — it changes the shuffle
    * layout, never the relation — certified per-row by hash, not
    * asserted in a spec over toy rows. Aggregated per supplier so the
    * output is bounded while every joined row still contributes.
    *
    * Scale shape: the salt spreads each hot supplier key over 4
    * reducers; the dimension grows ×4 (supplier is dimension-sized —
    * exactly the regime the operator documents). */
  val saltedJoin: Q = Q(
    "rel_salted_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      graft.operators.Partitioning.saltedJoin(li, sup, "l_suppkey", 4)
        .groupBy("l_suppkey", "s_name")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
        .orderBy("l_suppkey")
    },
    Some("""
      SELECT l_suppkey, s_name, count(*) AS n_rows,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_cents
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2 ORDER BY 1""")
  )

  /** CO-PURCHASE pairs (market-basket co-occurrence) — for every part
    * pair, the number of orders containing BOTH, support-thresholded:
    * the frequent-itemset primitive behind "bought together"
    * recommendations. Same scale discipline as dd_source_overlap: ONE
    * groupBy collapses the fact table to per-order baskets (map-side
    * combined distinct sets, each bounded by basket size), pair
    * generation is a narrow double-explode whose fan-out is
    * |basket|² per order — never |parts|² and never a fact-side
    * self-join — and the pair count is a second bounded-key shuffle.
    * The support threshold (≥ 3 co-orders) is where a 100 TB run
    * prunes the pair tail before it lands anywhere.
    *
    * MEGA-BASKET GUARD (ADVICE r8): baskets larger than
    * [[CopurchaseMaxBasket]] distinct parts are EXCLUDED before the
    * double explode — one pathological basket (a crawler order, a
    * catalog-wide batch import) would otherwise fan out |basket|²
    * rows ahead of any pruning filter. The cap is part of the query's
    * contract (both engines apply it), and [[copurchaseHealth]] is the
    * companion report that makes the dropped-basket count visible, so
    * the cap can never silently eat data. */
  val CopurchaseMaxBasket = 32
  val copurchase: Q = Q(
    "rel_copurchase",
    (s, dir) =>
      t(s, dir, "lineitem")
        // NULL order keys are not baskets: Spark's groupBy would form
        // a real basket for the NULL group (and count it toward every
        // pair's support) while the oracle's equi-joins drop those
        // rows — filter them in BOTH engines (r20 review)
        .filter(col("l_orderkey").isNotNull)
        .groupBy("l_orderkey")
        .agg(collect_set(col("l_partkey")).as("basket"))
        .filter(size(col("basket")) <= CopurchaseMaxBasket)
        .select(explode(col("basket")).as("part_a"), col("basket"))
        .select(col("part_a"), explode(col("basket")).as("part_b"))
        .filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 3)
        .orderBy("part_a", "part_b"),
    Some(s"""
      WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                 -- NULL part rows must not count toward the basket
                 -- cap: Spark's collect_set EXCLUDES NULLs, so a
                 -- 32-part basket plus one NULL row passes the cap
                 -- there but would read 33 here (r20 review); NULL
                 -- order keys mirror the Spark-side filter
                 WHERE l_partkey IS NOT NULL
                   AND l_orderkey IS NOT NULL),
           ok AS (SELECT l_orderkey FROM b GROUP BY 1
                  HAVING count(*) <= $CopurchaseMaxBasket)
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             count(*) AS n_orders
      FROM b a
      JOIN ok ON a.l_orderkey = ok.l_orderkey
      JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
      ORDER BY 1, 2""")
  )

  /** TRIANGLE COUNTING + LOCAL CLUSTERING over the support-thresholded
    * co-purchase graph — the graph-analytics face beyond connected
    * components and PageRank, and the community-structure signal
    * recommendation/fraud systems key on (colluding baskets show
    * abnormally high clustering; organic assortments low). Edges are
    * [[copurchase]]'s pairs at support ≥ 2 — one step below the
    * report face's ≥ 3, which at fixture scale keeps only 63 edges
    * and no closed wedge at all; ≥ 2 holds ~3.4k edges and real
    * community structure (61 triangles at sf0.01), so the closing
    * probe is positively exercised. The algorithm is the canonical
    * distributed one
    * (Suri & Vassilvitskii 2011 / Schank's orientation): orient every
    * undirected edge from the (degree, part)-LOWER endpoint to the
    * higher, enumerate wedges only at each edge's low-rank endpoint
    * (self-join the oriented list on src, second leg strictly
    * rank-above the first so each wedge appears once), close them
    * with one semi-join probe into the same oriented list — every
    * triangle counted exactly once, total wedge work O(m^{3/2})
    * regardless of hub degrees, the reason this beats the naive
    * three-way join on power-law graphs. Per part: degree, triangle
    * count (each triangle credits all three corners), and the
    * Watts–Strogatz local clustering coefficient in exact permille
    * `(2000·t) div (deg·(deg−1))`.
    *
    * Scale (100 TB): the graph is |parts|-sized (catalog-sized, not
    * fact-table-sized) and basket-bounded on build; the wedge join is
    * the m^{3/2}-bounded self-join on the oriented src key. All
    * counts exact BIGINT. */
  val copurchaseTriangles: Q = Q(
    "rel_copurchase_triangles",
    (s, dir) => {
      val und = t(s, dir, "lineitem")
        // same NULL-order-key exclusion as rel_copurchase
        .filter(col("l_orderkey").isNotNull)
        .groupBy("l_orderkey")
        .agg(collect_set(col("l_partkey")).as("basket"))
        .filter(size(col("basket")) <= CopurchaseMaxBasket)
        .select(explode(col("basket")).as("u"), col("basket"))
        .select(col("u"), explode(col("basket")).as("v"))
        .filter(col("u") < col("v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .select("u", "v")
      graft.operators.Graph.triangleStats(und)
        .select(col("vertex").cast("long").as("part"), col("deg"),
          col("n_triangles"), col("clustering_permille"))
        .orderBy("part")
    },
    Some(s"""
      WITH bk AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                  -- same NULL-exclusion as rel_copurchase's basket
                  -- CTE: collect_set drops NULLs on the Spark side,
                  -- and NULL order keys are not baskets
                  WHERE l_partkey IS NOT NULL
                    AND l_orderkey IS NOT NULL),
      bok AS (SELECT l_orderkey FROM bk GROUP BY 1
              HAVING count(*) <= $CopurchaseMaxBasket),
      und AS (
        SELECT a.l_partkey AS u, c.l_partkey AS v
        FROM bk a
        JOIN bok ON a.l_orderkey = bok.l_orderkey
        JOIN bk c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2),
      degs AS (
        SELECT part, count(*) AS deg FROM (
          SELECT u AS part FROM und
          UNION ALL SELECT v AS part FROM und) GROUP BY 1),
      e AS (
        SELECT CASE WHEN du < dv OR (du = dv AND u < v)
                    THEN u ELSE v END AS src,
               CASE WHEN du < dv OR (du = dv AND u < v)
                    THEN v ELSE u END AS dst,
               CASE WHEN du < dv OR (du = dv AND u < v)
                    THEN dv ELSE du END AS ddeg
        FROM (SELECT und.u, und.v, d1.deg AS du, d2.deg AS dv
              FROM und JOIN degs d1 ON d1.part = und.u
                       JOIN degs d2 ON d2.part = und.v)),
      w AS (
        SELECT x.src AS a, x.dst AS b, y.dst AS c
        FROM e x JOIN e y ON x.src = y.src
         AND (x.ddeg < y.ddeg OR
              (x.ddeg = y.ddeg AND x.dst < y.dst))),
      tri AS (
        SELECT a, b, c FROM w
        WHERE EXISTS (SELECT 1 FROM e
                      WHERE e.src = w.b AND e.dst = w.c)),
      pd AS (
        SELECT part, count(*) AS t FROM (
          SELECT a AS part FROM tri
          UNION ALL SELECT b AS part FROM tri
          UNION ALL SELECT c AS part FROM tri) GROUP BY 1)
      SELECT CAST(d.part AS BIGINT) AS part, d.deg,
             CAST(coalesce(p.t, 0) AS BIGINT) AS n_triangles,
             CAST(CASE WHEN d.deg >= 2
                  THEN (2000 * coalesce(p.t, 0)) // (d.deg * (d.deg - 1))
                  ELSE 0 END AS BIGINT) AS clustering_permille
      FROM degs d LEFT JOIN pd p USING (part)
      ORDER BY part""")
  )

  /** Companion to [[copurchase]] — the dropped-basket report: total
    * baskets, how many the mega-basket cap excluded, and the largest
    * basket seen. A silent cap reads as "covered everything"; this
    * face is the audit row an operator checks before trusting the
    * pair counts (and the alarm that fires when a data quirk starts
    * capping real baskets). One bounded-key aggregate then a 1-row
    * global fold — no explode, so it is safe to run even when the
    * pair query itself would be expensive. */
  val copurchaseHealth: Q = Q(
    "rel_copurchase_health",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(countDistinct(col("l_partkey")).as("basket_size"))
        .agg(
          count(lit(1)).as("n_baskets"),
          sum(when(col("basket_size") > CopurchaseMaxBasket, 1L)
            .otherwise(0L)).as("n_capped"),
          max(col("basket_size")).as("max_basket")),
    Some(s"""
      WITH sz AS (SELECT l_orderkey,
                         count(DISTINCT l_partkey) AS basket_size
                  FROM lineitem GROUP BY 1)
      SELECT count(*) AS n_baskets,
             CAST(sum(CASE WHEN basket_size > $CopurchaseMaxBasket
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
             max(basket_size) AS max_basket
      FROM sz""")
  )

  /** INCREMENTAL VIEW MAINTENANCE — the algebraic delta-merge a
    * warehouse uses to keep an aggregate view current without
    * rebuilding it: the last 30 days of orders are treated as the
    * fresh delta, everything older as the materialized base view, and
    * the output is base ⊕ delta — per-key full-outer merge with
    * coalesce-to-zero sums (count and sum are the self-decomposable
    * aggregates; min/max would need the saltedStats shape). The
    * certification is the point: the oracle computes the view by FULL
    * RECOMPUTE over all orders, so the hash match proves the merged
    * maintenance path equals the rebuild — exactly the invariant an
    * incremental refresh job must hold. Revenue in exact integer cents
    * (ref_star_join's parity idiom); the split cutoff anchors to
    * max(o_orderdate) via the broadcast 1-row attach.
    *
    * Scale: in production the base side is an already-materialized
    * table, so a refresh scans ONLY the delta — the whole point of
    * the maintenance path. Self-contained against a read-only fixture,
    * this face derives both sides from the orders table, so the base
    * and delta branches each scan it (plus the 1-row cutoff aggregate;
    * Spark does not dedupe common subplans) — that duplicated scan is
    * the fixture's artifact, not the operator's shape, and is why the
    * plan keeps the two-aggregate + merge structure instead of a
    * single-pass pivot that would erase the demonstrated invariant.
    * The merge itself joins two |keys|-sized aggregates —
    * broadcast-sized at any fact scale. */
  val incrementalView: Q = Q(
    "rel_incremental_view",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val hi = o.agg(max("o_orderdate").as("max_d"))
      val tagged = o.join(broadcast(hi))
        .withColumn("is_delta",
          col("o_orderdate") >= date_sub(col("max_d"), 30))
      def agg(df: DataFrame) = df.groupBy("status", "priority")
        .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      val base = agg(tagged.filter(!col("is_delta")))
      val delta = agg(tagged.filter(col("is_delta")))
      base.as("b").join(delta.as("d"),
          Seq("status", "priority"), "full_outer")
        .select(col("status"), col("priority"),
          (coalesce(col("b.n"), lit(0L)) +
            coalesce(col("d.n"), lit(0L))).as("n_orders"),
          (coalesce(col("b.c"), lit(0L)) +
            coalesce(col("d.c"), lit(0L))).as("sum_cents"))
        .orderBy("status", "priority")
    },
    Some("""
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS sum_cents
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** Exact distributed median by rank selection — the companion of
    * [[quantileBound]]: that face certifies the approximate sketch,
    * this one computes the TRUE per-group median without a
    * percentile() float path. Row-number the group ordered by the
    * value, pick the one (odd n) or two (even n) middle order
    * statistics, and emit their SUM — `med2_cents` = 2×median in
    * exact integer cents, so no engine ever divides (a .5-cent
    * median would force a float).
    *
    * Scale (100 TB): one exchange on the group key serves the
    * row_number, the count, and the final aggregate (the grouping
    * keys are a superset of the window partition). When a single
    * group outgrows one partition's sort, selection switches to
    * binary search on the value domain — O(log range) bounded-key
    * aggregate passes, no global sort; this face is the
    * per-group-fits form. */
  val exactMedian: Q = Q(
    "rel_exact_median",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy("cents")
      val wAll = Window.partitionBy("o_orderpriority")
      Tables(s, dir, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") === expr("(n + 1) div 2") ||
          col("rn") === expr("(n + 2) div 2"))
        .groupBy("o_orderpriority")
        .agg(max("n").as("n_orders"),
          sum(when((col("n") % 2) === 1, col("cents") * 2)
            .otherwise(col("cents"))).as("med2_cents"))
        .orderBy("o_orderpriority")
    },
    Some("""
      WITH c AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      r AS (
        SELECT o_orderpriority, cents,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM c)
      SELECT o_orderpriority, max(n) AS n_orders,
             CAST(sum(CASE WHEN n % 2 = 1 THEN cents * 2 ELSE cents END)
               AS BIGINT) AS med2_cents
      FROM r
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** Compaction planning — the small-file problem as a relational
    * plan: roll the fact table up to one "file" per ship month
    * (month → row count stands in for a lake file listing), then
    * assign files to a fixed number of compaction bins by
    * round-robin over the size-descending order. Round-robin-
    * decreasing is the windowable form of LPT list scheduling:
    * per-bin imbalance is bounded by the largest single file, and
    * unlike first-fit it needs no sequential bin state, so the same
    * plan runs over a million-file listing. Output carries each
    * file's bin plus the bin totals the compactor will write.
    *
    * Scale (100 TB): the file listing is metadata — billions of
    * data rows collapse to |months| listing rows before any window
    * runs; one bounded-key exchange orders them. This is the
    * relational analog of a table-maintenance OPTIMIZE planner. */
  val compactionPlan: Q = Q(
    "rel_compaction_plan",
    (s, dir) => {
      val ord = Window.orderBy(col("n_rows").desc, col("file_month"))
      val binW = Window.partitionBy("bin_id")
      Tables(s, dir, "lineitem")
        .groupBy(date_trunc("month", col("l_shipdate"))
          .cast("date").as("file_month"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("bin_id",
          ((row_number().over(ord) - 1) % 8).cast("long"))
        .withColumn("bin_total_rows", sum("n_rows").over(binW))
        .select(col("bin_id"), col("file_month"), col("n_rows"),
          col("bin_total_rows"))
        .orderBy("bin_id", "file_month")
    },
    Some("""
      WITH files AS (
        SELECT CAST(date_trunc('month', l_shipdate) AS DATE)
                 AS file_month,
               count(*) AS n_rows
        FROM lineitem GROUP BY 1),
      a AS (
        SELECT file_month, n_rows,
               (row_number() OVER (ORDER BY n_rows DESC, file_month)
                 - 1) % 8 AS bin_id
        FROM files)
      SELECT bin_id, file_month, n_rows,
             CAST(sum(n_rows) OVER (PARTITION BY bin_id) AS BIGINT)
               AS bin_total_rows
      FROM a ORDER BY bin_id, file_month""")
  )

  /** Equi-width histogram with integer-exact bucketing — the
    * distribution-shape profiler next to [[profile]]'s scalar stats:
    * global [min, max] cents come from a 1-row aggregate attached by
    * broadcast (the `ev_watermark` scalar-attach shape — one DAG, no
    * driver round-trip), and every row lands in
    * `(cents−min)·B div (range+1)` — pure long arithmetic, so both
    * engines bucket identically with no float width anywhere.
    * Per-bucket actual min/max expose gaps and skew a smooth count
    * row can hide.
    *
    * Scale (100 TB): one scan for bounds, one for bucketing (map-side
    * partials into B keys); nothing shuffles more than B rows. */
  val histogram: Q = Q(
    "rel_histogram",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      val bounds = o.agg(min("cents").as("min_c"), max("cents").as("max_c"))
      o.join(broadcast(bounds))
        .withColumn("bucket_id",
          expr("((cents - min_c) * 10) div (max_c - min_c + 1)"))
        .groupBy("bucket_id")
        .agg(count(lit(1)).as("n_orders"),
          min("cents").as("lo_cents"), max("cents").as("hi_cents"))
        .orderBy("bucket_id")
    },
    Some("""
      WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      b AS (SELECT min(cents) AS min_c, max(cents) AS max_c FROM c)
      SELECT ((cents - min_c) * 10) // (max_c - min_c + 1) AS bucket_id,
             count(*) AS n_orders,
             min(cents) AS lo_cents, max(cents) AS hi_cents
      FROM c, b GROUP BY 1 ORDER BY 1""")
  )

  /** Exact-k deterministic sample — [[hashSample]] keeps a RATE (its
    * output size drifts with the input); this face keeps exactly k
    * rows by ranking on a cryptographic hash of the key and taking
    * the k smallest: a seedless, engine-independent uniform draw
    * that any replica reproduces bit-for-bit. Spark plans the
    * ORDER-BY-LIMIT as TakeOrdered — per-partition top-k then one
    * k-row merge on the driver side of the exchange, never a global
    * sort of the table.
    *
    * Scale (100 TB): top-k is the textbook distributed selection —
    * every partition forwards ≤ k candidates no matter how many rows
    * it scanned. */
  val exactKSample: Q = Q(
    "rel_exact_k_sample",
    (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          md5(col("o_orderkey").cast("string")).as("draw"))
        .orderBy("draw")
        .limit(500)
        .select(col("o_orderkey"), col("o_custkey"), col("cents"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_custkey, cents
      FROM (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               md5(CAST(o_orderkey AS VARCHAR)) AS draw
        FROM orders ORDER BY draw LIMIT 500)
      ORDER BY o_orderkey""")
  )

  // sketchAgg is spec-certified (SketchSpec), not catalog-registered —
  // see its scaladoc; sketchBound is the catalog's hash-checked face.
  def all: Seq[Q] = Seq(union, intersect, except, rollup, cube,
    distinctAgg, pagination, keysetPagination, pivot,
    sketchBound, groupingSets, hashSample, stratifiedSample, saltedAgg,
    quantileBound, profile, zorder, zonemapPrune, tableChecksum,
    saltedJoin,
    copurchase, copurchaseHealth, incrementalView, exactMedian,
    compactionPlan, histogram, exactKSample, snapshotDiff,
    shareOfTotal, pareto, skyline, fkCheck, kAnonymity, lDiversity,
    tCloseness, copurchaseTriangles)

  /** k-anonymity audit — the privacy-compliance complement of
    * `ta_pii_redact`'s direct-identifier scrub: group the table by its
    * QUASI-identifier tuple (here nation × market segment — the
    * columns that re-identify by combination, not alone) and report
    * every equivalence class with its size and whether it clears the
    * k=5 bar. A released dataset is k-anonymous at the MINIMUM class
    * size; the `at_risk` rows are exactly the records a release
    * process must generalize or suppress first. Pure integer counts —
    * the hash check is exact.
    *
    * Scale (100 TB): one map-side-combined aggregate to
    * |quasi-identifier combinations| rows; no joins, no windows. */
  val kAnonymity: Q = Q(
    "rel_k_anonymity",
    (s, dir) =>
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("class_size"))
        .select(col("nationkey"), col("segment"), col("class_size"),
          when(col("class_size") < 5, "at_risk")
            .otherwise("anonymous").as("verdict"))
        .orderBy("nationkey", "segment"),
    Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
             c_mktsegment AS segment,
             count(*) AS class_size,
             CASE WHEN count(*) < 5 THEN 'at_risk'
                  ELSE 'anonymous' END AS verdict
      FROM customer GROUP BY 1, 2
      ORDER BY nationkey, segment""")
  )

  /** l-diversity audit — the attack k-anonymity misses: a class of
    * 50 identical-looking records is still a disclosure if they all
    * share one SENSITIVE value (homogeneity attack, Machanavajjhala
    * et al. 2007). Same quasi-identifier classes as
    * `rel_k_anonymity`; the sensitive attribute is the account
    * standing bucketed to {negative, low, high} (cents-exact
    * thresholds, no float compare); a class is distinct-l-diverse at
    * l = 3 iff all three buckets occur. The k and l reports together
    * are the release gate: generalize/suppress until both clear.
    *
    * Scale (100 TB): one aggregate to the class grain carrying a
    * distinct-count — Spark plans the classic two-phase partial
    * distinct (Expand-free here: a single count(distinct) keyed by
    * the class tuple); |classes| output rows. */
  val lDiversity: Q = Q(
    "rel_l_diversity",
    (s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("segment"),
          when(expr("CAST(round(c_acctbal * 100) AS BIGINT)") < 0L,
            "negative")
            .when(expr("CAST(round(c_acctbal * 100) AS BIGINT)")
              < 500000L, "low")
            .otherwise("high").as("standing"))
        .groupBy("nationkey", "segment")
        .agg(count(lit(1)).as("class_size"),
          countDistinct(col("standing")).as("n_sensitive"))
        .select(col("nationkey"), col("segment"), col("class_size"),
          col("n_sensitive"),
          when(col("n_sensitive") < 3, "homogeneous")
            .otherwise("diverse").as("verdict"))
        .orderBy("nationkey", "segment"),
    Some("""
      WITH b AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               c_mktsegment AS segment,
               CASE WHEN CAST(round(c_acctbal * 100) AS BIGINT) < 0
                    THEN 'negative'
                    WHEN CAST(round(c_acctbal * 100) AS BIGINT)
                         < 500000 THEN 'low'
                    ELSE 'high' END AS standing
        FROM customer)
      SELECT nationkey, segment, count(*) AS class_size,
             CAST(count(DISTINCT standing) AS BIGINT) AS n_sensitive,
             CASE WHEN count(DISTINCT standing) < 3
                  THEN 'homogeneous' ELSE 'diverse' END AS verdict
      FROM b GROUP BY 1, 2
      ORDER BY nationkey, segment""")
  )

  /** t-closeness audit — the attack l-diversity misses: a class can
    * hold all three standing buckets (diverse) while its DISTRIBUTION
    * over them is wildly unlike the table's — e.g. 96% negative in a
    * class vs 9% overall still discloses near-certain standing for
    * its members (skewness attack, Li/Li/Venkatasubramanian 2007,
    * "t-Closeness: Privacy Beyond k-Anonymity and l-Diversity").
    * Same quasi-identifier classes as `rel_k_anonymity`; the
    * sensitive attribute is the account balance over FIVE ORDERED
    * cents buckets (<0, <2500.00, <5000.00, <7500.00, ≥7500.00 —
    * cents-exact thresholds, no float compare). For ordered buckets
    * the paper's Earth-Mover's Distance reduces to the mean absolute
    * CUMULATIVE gap: EMD = (1/(k−1)) · Σ_{j<k−1} |P≤j − Q≤j|, with P
    * the class distribution and Q the whole table's. Computed in
    * exact integer permille — each cumulative gap |a_j/m − b_j/N|
    * becomes |a_j·N − b_j·m| over the common denominator m·N, so the
    * reported `emd_permille = (1000·Σ|a_j·N − b_j·m|) div (4·m·N)`
    * is exact (hash-stable) with no float in the plan. A class is
    * t-close at the canonical t = 0.2 bar iff emd ≤ 200‰; the
    * `skewed` rows are what a release must generalize next, AFTER
    * k and l already cleared. Third gate of the release pack
    * (`jobs.Jobs` JOB=release_corpus).
    *
    * Scale (100 TB): one map-side-combined aggregate to |classes|
    * rows (the cumulative counts are conditional sums in the same
    * pass) plus a broadcast 1-row corpus aggregate — the
    * `ev_watermark` scalar-attach pattern; no joins by key, no
    * windows. The Long arithmetic is exact while 4000·m·N < 2⁶³
    * (corpora to ~10⁹ rows); past that the two products switch to
    * DECIMAL(38,0) with the identical plan shape. */
  val tCloseness: Q = Q(
    "rel_t_closeness",
    (s, dir) => {
      val cents = expr("CAST(round(c_acctbal * 100) AS BIGINT)")
      val bucketed = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_mktsegment").as("segment"),
          when(cents < 0L, 0L).when(cents < 250000L, 1L)
            .when(cents < 500000L, 2L).when(cents < 750000L, 3L)
            .otherwise(4L).as("b"))
      val classes = bucketed.groupBy("nationkey", "segment")
        .agg(count(lit(1)).as("class_size"),
          sum(when(col("b") <= 0L, 1L).otherwise(0L)).as("a0"),
          sum(when(col("b") <= 1L, 1L).otherwise(0L)).as("a1"),
          sum(when(col("b") <= 2L, 1L).otherwise(0L)).as("a2"),
          sum(when(col("b") <= 3L, 1L).otherwise(0L)).as("a3"))
      val corpus = bucketed.agg(count(lit(1)).as("n_total"),
        sum(when(col("b") <= 0L, 1L).otherwise(0L)).as("q0"),
        sum(when(col("b") <= 1L, 1L).otherwise(0L)).as("q1"),
        sum(when(col("b") <= 2L, 1L).otherwise(0L)).as("q2"),
        sum(when(col("b") <= 3L, 1L).otherwise(0L)).as("q3"))
      classes.crossJoin(broadcast(corpus))
        .select(col("nationkey"), col("segment"), col("class_size"),
          expr("""(1000 * (abs(a0 * n_total - q0 * class_size) +
                           abs(a1 * n_total - q1 * class_size) +
                           abs(a2 * n_total - q2 * class_size) +
                           abs(a3 * n_total - q3 * class_size)))
                  div (4 * class_size * n_total)""")
            .as("emd_permille"))
        .select(col("nationkey"), col("segment"), col("class_size"),
          col("emd_permille"),
          when(col("emd_permille") > 200L, "skewed")
            .otherwise("close").as("verdict"))
        .orderBy("nationkey", "segment")
    },
    Some("""
      WITH b AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               c_mktsegment AS segment,
               CASE WHEN CAST(round(c_acctbal * 100) AS BIGINT) < 0
                      THEN 0
                    WHEN CAST(round(c_acctbal * 100) AS BIGINT)
                      < 250000 THEN 1
                    WHEN CAST(round(c_acctbal * 100) AS BIGINT)
                      < 500000 THEN 2
                    WHEN CAST(round(c_acctbal * 100) AS BIGINT)
                      < 750000 THEN 3
                    ELSE 4 END AS b
        FROM customer),
      cls AS (
        SELECT nationkey, segment, count(*) AS class_size,
               sum(CASE WHEN b <= 0 THEN 1 ELSE 0 END) AS a0,
               sum(CASE WHEN b <= 1 THEN 1 ELSE 0 END) AS a1,
               sum(CASE WHEN b <= 2 THEN 1 ELSE 0 END) AS a2,
               sum(CASE WHEN b <= 3 THEN 1 ELSE 0 END) AS a3
        FROM b GROUP BY 1, 2),
      tot AS (
        SELECT count(*) AS n_total,
               sum(CASE WHEN b <= 0 THEN 1 ELSE 0 END) AS q0,
               sum(CASE WHEN b <= 1 THEN 1 ELSE 0 END) AS q1,
               sum(CASE WHEN b <= 2 THEN 1 ELSE 0 END) AS q2,
               sum(CASE WHEN b <= 3 THEN 1 ELSE 0 END) AS q3
        FROM b),
      emd AS (
        SELECT nationkey, segment, class_size,
               CAST((1000 * (abs(a0 * n_total - q0 * class_size) +
                             abs(a1 * n_total - q1 * class_size) +
                             abs(a2 * n_total - q2 * class_size) +
                             abs(a3 * n_total - q3 * class_size)))
                    // (4 * class_size * n_total) AS BIGINT)
                 AS emd_permille
        FROM cls, tot)
      SELECT nationkey, segment, class_size, emd_permille,
             CASE WHEN emd_permille > 200 THEN 'skewed'
                  ELSE 'close' END AS verdict
      FROM emd ORDER BY nationkey, segment""")
  )

  /** Referential-integrity audit — the data-quality report a lake
    * needs BECAUSE nothing enforces foreign keys there: for every
    * relationship in the star schema, the child row count, how many
    * child keys are NULL (not a violation — SQL FK semantics), and
    * how many non-null child rows point at a missing parent
    * (orphans, found by a left-anti join). On healthy data every
    * orphan count is 0 — that all-zeros column IS the report; the
    * row/null counts keep the hash check substantive. The fix-up
    * step after a bad backfill starts from exactly this query.
    *
    * Scale (100 TB): each relationship is one anti-join — dimension
    * parents broadcast; the lineitem→orders fact-fact check shuffles
    * once on the key (bucketed co-location removes even that in
    * production). Output is |relationships| rows. */
  val fkCheck: Q = Q(
    "rel_fk_check",
    (s, dir) => {
      def audit(name: String, child: DataFrame, key: String,
                parent: DataFrame, pkey: String, bcast: Boolean)
          : DataFrame = {
        val keys = child.select(col(key).cast("long").as("k"))
        val par = parent.select(col(pkey).cast("long").as("pk"))
        val orphans = keys.filter(col("k").isNotNull)
          .join(if (bcast) broadcast(par) else par,
            col("k") === col("pk"), "left_anti")
        val base = keys.agg(count(lit(1)).as("n_child"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
        base.join(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
          .select(lit(name).as("fk"), col("n_child"),
            col("n_null_keys"), col("n_orphans"))
      }
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val nat = Tables(s, dir, "nation")
      Seq(
        audit("customer.c_nationkey->nation", cust, "c_nationkey",
          nat, "n_nationkey", bcast = true),
        audit("lineitem.l_orderkey->orders", li, "l_orderkey",
          ord, "o_orderkey", bcast = false),
        audit("lineitem.l_partkey->part", li, "l_partkey",
          Tables(s, dir, "part"), "p_partkey", bcast = true),
        audit("nation.n_regionkey->region", nat, "n_regionkey",
          Tables(s, dir, "region"), "r_regionkey", bcast = true),
        audit("orders.o_custkey->customer", ord, "o_custkey",
          cust, "c_custkey", bcast = true))
        .reduce(_.unionAll(_))
        .orderBy("fk")
    },
    Some("""
      SELECT * FROM (
        SELECT 'customer.c_nationkey->nation' AS fk,
               count(*) AS n_child,
               CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_null_keys,
               CAST((SELECT count(*) FROM customer WHERE c_nationkey
                 IS NOT NULL AND c_nationkey NOT IN
                 (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL)) AS BIGINT) AS n_orphans
        FROM customer
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders', count(*),
               CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST((SELECT count(*) FROM lineitem WHERE l_orderkey
                 IS NOT NULL AND l_orderkey NOT IN
                 (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_partkey->part', count(*),
               CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST((SELECT count(*) FROM lineitem WHERE l_partkey
                 IS NOT NULL AND l_partkey NOT IN
                 (SELECT p_partkey FROM part WHERE p_partkey IS NOT NULL)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'nation.n_regionkey->region', count(*),
               CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST((SELECT count(*) FROM nation WHERE n_regionkey
                 IS NOT NULL AND n_regionkey NOT IN
                 (SELECT r_regionkey FROM region WHERE r_regionkey IS NOT NULL)) AS BIGINT)
        FROM nation
        UNION ALL
        SELECT 'orders.o_custkey->customer', count(*),
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               CAST((SELECT count(*) FROM orders WHERE o_custkey
                 IS NOT NULL AND o_custkey NOT IN
                 (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)) AS BIGINT)
        FROM orders)
      ORDER BY fk""")
  )

  /** 2-D skyline (Pareto-optimal set) over `part` — every part no
    * other part dominates (cheaper-or-equal price AND larger-or-equal
    * size, at least one strict): the multi-objective shortlist query
    * (best price/size trade-offs) the cumulative-share [[pareto]]
    * face does NOT cover. The oracle states the semantics as the
    * quadratic NOT EXISTS dominance test; the engine computes the
    * same set in O(n log n) via `operators.Skyline.skyline2d`
    * (brute-equivalence also property-pinned on tie-heavy random
    * data in PropertySpec) as two sort-based passes:
    *
    *   - a row survives iff no strictly-cheaper row has size ≥ its
    *     own (`max(sz) RANGE UNBOUNDED..1 PRECEDING` on price — a
    *     range frame so price TIES stay out of the running max) and
    *     no same-price row has size strictly greater (a per-price
    *     partition max). Equal (price, sz) duplicates survive
    *     together — no strict coordinate, no dominance.
    *
    * and runs the pass TWICE — the published distributed-skyline
    * recipe: pass 1 partitions by `pmod(p_partkey, 16)` (any
    * partitioning works — dominance within a bucket implies dominance
    * globally, and dominance is transitive, so every globally-
    * dominated row is eliminated by some bucket survivor), pass 2
    * merges the ≤16 local staircases with the same window globally.
    *
    * Scale (100 TB): pass 1 is embarrassingly parallel over arbitrary
    * partitions; only LOCAL SKYLINE SURVIVORS (a staircase, ≤
    * |distinct prices in bucket| rows, typically orders of magnitude
    * below the table) reach the pass-2 global sort — the documented
    * reason this face sits in PlanAuditSpec's global-window allowlist
    * next to rel_compaction_plan's metadata-sized listing. */
  val skyline: Q = Q(
    "rel_skyline",
    (s, dir) => {
      val base = Tables(s, dir, "part").select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("sz"))
      graft.operators.Skyline
        .skyline2d(base, "price_cents", "sz",
          bucket = pmod(col("p_partkey"), lit(16)))
        .orderBy("p_partkey")
    },
    Some("""
      WITH p AS (
        SELECT p_partkey,
               CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
               CAST(p_size AS BIGINT) AS sz
        FROM part)
      SELECT p_partkey, price_cents, sz FROM p a
      WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.price_cents <= a.price_cents AND b.sz >= a.sz
          AND (b.price_cents < a.price_cents OR b.sz > a.sz))
      ORDER BY p_partkey""")
  )

  /** Ratio-to-report WITHOUT the global window: per-segment revenue
    * share of the corpus total. The naive spelling is
    * `sum(x) OVER ()` — a single-partition window over the whole
    * table, the exact shape PlanAuditSpec bans; here the total is a
    * 1-row aggregate attached by broadcast cross-join (the
    * ev_watermark scalar idiom), so the plan is two map-side-combined
    * aggregates and one broadcast, nothing global. The share is one
    * IEEE division of exact cents.
    *
    * Scale (100 TB): the segment aggregate is bounded by |segments|,
    * the total by 1 row — the report costs one scan regardless of
    * fact size. */
  val shareOfTotal: Q = Q(
    "rel_share_of_total",
    (s, dir) => {
      val seg = Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("seg_cents"))
      val total = seg.agg(sum("seg_cents").as("total_cents"))
      seg.join(broadcast(total))
        .select(col("segment"), col("seg_cents"),
          (col("seg_cents").cast("double") / col("total_cents"))
            .as("share"))
        .orderBy("segment")
    },
    Some("""
      WITH seg AS (
        SELECT c_mktsegment AS segment,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS seg_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1)
      SELECT segment, seg_cents,
             CAST(seg_cents AS DOUBLE) /
               (SELECT sum(seg_cents) FROM seg) AS share
      FROM seg ORDER BY segment""")
  )

  /** Pareto (80/20) report — cumulative revenue share over nations
    * ranked by revenue: "how many dimension members cover 80% of the
    * business". The cumulative window runs over the AGGREGATED
    * dimension (|nations| rows), never the fact table — the only sound
    * place for an ordered global window at scale, and the numerator
    * stays exact integer cents (cum_cents) with the share derived by
    * one division at the end. Ties in revenue are broken by name for
    * an engine-independent total order.
    *
    * Scale (100 TB): one fact scan into a bounded aggregate; the
    * window sorts ≤ |nations| rows on one partition by construction —
    * bounded-dimension, documented, and exactly what PlanAuditSpec's
    * global-window allowlist is for. */
  val pareto: Q = Q(
    "rel_pareto",
    (s, dir) => {
      val w = Window.orderBy(col("nation_cents").desc, col("nation"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byNation = Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("nation_cents"))
      val total = byNation.agg(sum("nation_cents").as("total_cents"))
      byNation
        .withColumn("rank", row_number().over(
          Window.orderBy(col("nation_cents").desc, col("nation")))
          .cast("long"))
        .withColumn("cum_cents", sum("nation_cents").over(w))
        .join(broadcast(total))
        .select(col("rank"), col("nation"), col("nation_cents"),
          col("cum_cents"),
          (col("cum_cents").cast("double") / col("total_cents"))
            .as("cum_share"))
        .orderBy("rank")
    },
    Some("""
      WITH n AS (
        SELECT n_name AS nation,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS nation_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1)
      SELECT row_number() OVER w AS rank, nation, nation_cents,
             CAST(sum(nation_cents) OVER (ORDER BY nation_cents DESC,
                 nation ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cents,
             CAST(sum(nation_cents) OVER (ORDER BY nation_cents DESC,
                 nation ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / (SELECT sum(nation_cents) FROM n) AS cum_share
      FROM n WINDOW w AS (ORDER BY nation_cents DESC, nation)
      ORDER BY rank""")
  )

  /** Snapshot diff — the INVERSE of the CDC pipeline's merge
    * (`ev_cdc_merge` turns a changelog into a snapshot; this turns two
    * snapshots into the changelog): full-outer join two versions on
    * the key and classify every key as I (new in v2), D (gone in v2),
    * or U (present in both with a different value) — the op stream a
    * MERGE sink or a downstream incremental consumer replays.
    * Self-contained against the read-only fixture, v1/v2 are derived
    * deterministically from `orders` (v1 drops keys ≡0 mod 89, v2
    * drops ≡0 mod 97 and bumps cents by 100 on ≡0 mod 13), giving all
    * three op kinds real populations; unchanged keys (the vast
    * majority) are filtered out in the same pass. Cents comparison is
    * exact integer equality — no float drift can fake a U.
    *
    * Scale (100 TB): one shuffle of each snapshot on the key — and in
    * production both snapshots are bucketed by that key (the
    * `Partitioning.bucketedTable` path), making the diff a zero-
    * exchange sort-merge over co-located files. Output is bounded by
    * the CHANGE volume, not the table. */
  val snapshotDiff: Q = Q(
    "rel_snapshot_diff",
    (s, dir) => {
      val base = Tables(s, dir, "orders").select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val v1 = base.filter(col("o_orderkey") % 89 =!= 0)
        .select(col("o_orderkey").as("k1"), col("cents").as("c1"))
      val v2 = base.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey").as("k2"),
          (col("cents") + when(col("o_orderkey") % 13 === 0, 100L)
            .otherwise(0L)).as("c2"))
      v1.join(v2, col("k1") === col("k2"), "full_outer")
        .withColumn("op",
          when(col("k1").isNull, "I")
            .when(col("k2").isNull, "D")
            .when(col("c1") =!= col("c2"), "U"))
        .filter(col("op").isNotNull)
        .select(coalesce(col("k1"), col("k2")).as("o_orderkey"),
          col("op"), col("c1").as("old_cents"), col("c2").as("new_cents"))
        .orderBy("o_orderkey")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      v1 AS (SELECT o_orderkey AS k1, cents AS c1 FROM base
             WHERE o_orderkey % 89 <> 0),
      v2 AS (SELECT o_orderkey AS k2,
                    cents + CASE WHEN o_orderkey % 13 = 0
                                 THEN 100 ELSE 0 END AS c2
             FROM base WHERE o_orderkey % 97 <> 0),
      d AS (
        SELECT COALESCE(k1, k2) AS o_orderkey,
               CASE WHEN k1 IS NULL THEN 'I'
                    WHEN k2 IS NULL THEN 'D'
                    WHEN c1 <> c2 THEN 'U' END AS op,
               c1 AS old_cents, c2 AS new_cents
        FROM v1 FULL OUTER JOIN v2 ON k1 = k2)
      SELECT * FROM d WHERE op IS NOT NULL ORDER BY o_orderkey""")
  )

}
