package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-catalog plan audit — the invariants that keep 100 TB plans
  * healthy, pinned so a refactor cannot silently regress them:
  * no cartesian/nested-loop joins except the two documented shapes,
  * and no single-partition global window except the literal-parity
  * pagination port. */
class PlanAuditSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed a BroadcastNestedLoopJoin: ss_topk_brute IS the
    * all-pairs baseline by definition (broadcast query batch);
    * ev_watermark joins a broadcast 1-row max aggregate with a
    * non-equi recency condition; ref_term_courses_deprecated attaches
    * the broadcast SINGLE-ROW term table to the argmax subquery's
    * version scan (the literal term-id equi-key constant-folds away,
    * leaving a 1×N broadcast loop — the correct scalar-attach plan at
    * any scale); ss_recall_report contains the ss_topk_brute pipeline
    * as its exactness baseline, inheriting its broadcast all-pairs
    * loop; rel_zorder broadcast-attaches its 1-row min/max scaling
    * bounds (the ev_watermark pattern); ss_hybrid_search is
    * ss_topk_brute over the metadata-filtered corpus — same broadcast
    * query batch, |eligible|·|Q| loop. All documented at the query
    * definition. */
  private val nestedLoopAllowed =
    Set("ss_topk_brute", "ev_watermark", "ref_term_courses_deprecated",
      "ss_recall_report", "rel_zorder", "ss_hybrid_search",
      // ta_heavy_hitters broadcast-attaches its 1-row (count, mg
      // summary) aggregate to the per-token exact counts — the
      // ev_watermark scalar-attach pattern
      "ta_heavy_hitters",
      // rel_incremental_view broadcast-attaches its 1-row max-date
      // cutoff for the base/delta split — same scalar-attach pattern
      "rel_incremental_view",
      // rel_histogram broadcast-attaches its 1-row [min, max] bounds
      // before integer bucketing — same scalar-attach pattern
      "rel_histogram",
      // rel_zonemap_prune broadcast-attaches the same 1-row scaling
      // bounds as rel_zorder before its chunk zone maps
      "rel_zonemap_prune",
      // ss_topk_pq scores the broadcast query batch against every
      // COMPRESSED corpus vector — PQ's documented shape (asymmetric
      // distance over reconstructions): |Q|·N like brute, but over m
      // codes + a literal codebook instead of raw vectors
      "ss_topk_pq",
      // rel_share_of_total and rel_pareto broadcast-attach their
      // 1-row corpus-total aggregate to a bounded dimension table —
      // the same scalar-attach pattern, documented at the queries
      "rel_share_of_total", "rel_pareto",
      // ta_unimax_mix broadcast-attaches its 1-row (budget, lang
      // count) aggregate to the |langs|-bounded dimension — same
      // scalar-attach pattern
      "ta_unimax_mix", "ta_mix_schedule",
      // ss_bm25_index_stats broadcast-attaches its 1-row doc count to
      // the vocabulary aggregate before idf bucketing — same
      // scalar-attach pattern (ss_bm25_topk's identical attach folds
      // into a later equi-join and never plans a BNLJ)
      "ss_bm25_index_stats",
      // ev_rfm broadcast-attaches its 1-row recency anchor (the
      // ev_watermark scalar-attach pattern) to the per-user aggregate
      "ev_rfm",
      // ta_unigram_surprisal broadcast-attaches the 1-row corpus
      // token total to the token-count join — same scalar-attach
      "ta_unigram_surprisal",
      // rel_fk_check attaches each relationship's 1-row orphan count
      // to its 1-row child aggregate — five 1×1 scalar attaches
      "rel_fk_check",
      // dd_quality_gate_pipeline inherits the surprisal stage's 1-row
      // corpus-total scalar attach
      "dd_quality_gate_pipeline",
      // dd_lsh_recall cross-joins its three 1-row count aggregates
      // (truth / candidates / caught) into the one-row certification
      // report — the same scalar-attach pattern
      "dd_lsh_recall",
      // dd_lsh_recall_sampled is the same three-scalar attach over
      // the sampled truth set (sample size / truth / caught)
      "dd_lsh_recall_sampled",
      // rel_t_closeness broadcast-attaches its 1-row corpus
      // cumulative-distribution aggregate to the |classes|-bounded
      // equivalence-class aggregate — the scalar-attach pattern
      "rel_t_closeness")

  /** Queries allowed an empty-partition (global) window:
    * rel_pagination is the documented literal-parity port of the
    * reference's ROWNUM batching; rel_keyset_pagination next to it is
    * the scale path. rel_compaction_plan's global row_number runs
    * AFTER the fact table collapses to one row per file/month — a
    * metadata-sized listing (planning-class), documented in its
    * scaladoc. */
  private val globalWindowAllowed =
    Set("rel_pagination", "rel_compaction_plan",
      // rel_pareto's cumulative window runs over the AGGREGATED
      // nation dimension (≤ |nations| rows) — bounded-dimension by
      // construction, documented in its scaladoc
      "rel_pareto",
      // rel_skyline's pass-2 merge window runs over the LOCAL SKYLINE
      // SURVIVORS only (≤16 per-bucket staircases), never the base
      // table — the distributed-skyline merge step, documented in its
      // scaladoc
      "rel_skyline",
      // ta_unimax_mix's water-fill windows run over the AGGREGATED
      // language dimension (≤ |langs| rows) — the rel_pareto
      // bounded-dimension class, documented in its scaladoc;
      // ta_mix_schedule composes the same bounded sub-plan (its own
      // prefix sums are lang-partitioned, its key order a
      // range-partitioned sort)
      "ta_unimax_mix", "ta_mix_schedule")

  test("no undocumented cartesian or nested-loop join in any query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad =
          (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) &&
            !nestedLoopAllowed(name)
        if (bad) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"undocumented non-equi join shapes in: $offenders")
  }

  test("sketch-only window aggregate carries no per-key aggregation state") {
    // ev_window_users is the CERTIFICATION face: its countDistinct
    // rider plans a partial aggregate KEYED BY user_id (one hash-table
    // entry per distinct user per window — per-key state, the thing
    // its doc says to drop at 100 TB; with several distinct aggs it
    // would be an Expand instead). windowUsersSketch is the promised
    // scale shape: constant-space HLL state only, so NO aggregate in
    // its plan may key on user_id, and no Expand may appear.
    def aggKeys(plan: String): Seq[String] =
      "keys=\\[[^\\]]*\\]".r.findAllIn(plan).toSeq
    val exact = SparkEntry.queries("ev_window_users")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(aggKeys(exact).exists(_.contains("user_id")),
      "certification face lost its per-user partial aggregate — " +
        "update this pin")
    val sketch = graft.queries.Events.windowUsersSketch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(aggKeys(sketch).nonEmpty &&
      aggKeys(sketch).forall(!_.contains("user_id")),
      s"scale-path plan must not aggregate per user: ${aggKeys(sketch)}")
    assert(!sketch.contains("Expand"),
      "scale-path sketch aggregate must not expand rows")
  }

  test("column pruning reaches the scan: text/embedding never read unused") {
    // the corpus' WIDE columns are text and embedding — a scan that
    // drags one of them for a query that doesn't touch it is the
    // difference between a metadata pass and a full-corpus read at
    // 100 TB. Pin the three shapes where pruning does real work.
    def readSchemas(name: String): Seq[String] =
      "ReadSchema: [^\\n]+".r.findAllIn(
        SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString).toSeq
    // temperature sampling decides on (doc_id, lang) alone
    assert(readSchemas("ta_temperature_sample").forall(!_.contains("text")),
      "ta_temperature_sample must not read document text")
    // the relational sample never touches orders' payload columns
    assert(readSchemas("rel_hash_sample").forall(!_.contains("o_totalprice")),
      "rel_hash_sample must not read o_totalprice")
    // hybrid search reads text only on the documents side — the
    // embeddings scan stays (vec_id, embedding)
    val hybrid = readSchemas("ss_hybrid_search")
    assert(hybrid.exists(r => r.contains("embedding") && !r.contains("text")),
      s"hybrid: embeddings scan must not carry text: $hybrid")
  }

  test("SRP dims probe is a one-row CollectLimit, not a full aggregate") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
    val plan = graft.operators.Srp.dimsProbe(emb)
      .queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit"), plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"dims probe regressed to a full-table aggregate:\n$plan")
  }

  test("l-diversity's single distinct aggregate plans without Expand") {
    // rel_l_diversity's scaladoc claims the one count(DISTINCT)
    // plus count(*) pair avoids the multi-distinct Expand rewrite
    // (Spark plans it as a two-phase partial distinct keyed by the
    // class tuple) — pin it so an added distinct agg can't silently
    // multiply the scan
    val plan = SparkEntry.queries("rel_l_diversity")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "rel_l_diversity now expands rows — update its scaladoc and " +
        "this pin, or split the aggregates")
  }

  test("rank-filter top-k shapes keep Spark's partial WindowGroupLimit") {
    // Spark 3.5+ plans Filter(rank <= k) over a window as a
    // WindowGroupLimit: each input partition keeps only its k best
    // rows per key BEFORE the shuffle — at 100 TB that is the
    // difference between shuffling k·|keys| rows and the whole fact
    // table. All our top-k faces are written in exactly the shape the
    // optimizer recognizes; pin it so a refactor (say, to a non-rank
    // predicate or a computed limit) can't silently fall back to the
    // full-window plan. This is also why the engine has NO custom
    // top-k physical operator: the built-in already does the partial
    // reduction, per the extension-surface policy.
    for (name <- Seq("ref_latest_order_window", "ss_topk_per_label",
        "rel_stratified_sample")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost the WindowGroupLimit pushdown:\n$plan")
    }
  }

  test("composed pipeline faces stay inside whole-stage codegen: no " +
      "fallback expressions, every generated method under " +
      "hugeMethodLimit (r17 verdict #4)") {
    // Past spark.sql.codegen.hugeMethodLimit Spark SILENTLY abandons
    // a compiled whole-stage subtree and runs it interpreted —
    // invisible at sf0.1, a multi-× data-path regression at 100 TB.
    // The five composed pipeline faces carry the catalog's largest
    // generated classes; audit them three ways.
    val hugeLimit = spark.conf
      .getOption("spark.sql.codegen.hugeMethodLimit")
      .map(_.toInt).getOrElse(65535)
    // the JIT's own refusal bar (-XX:-DontCompileHugeMethods default
    // 8000 bytecodes) is the stricter, economically-real threshold:
    // a method over it stays interpreted at the JVM level even when
    // Spark keeps the compiled class
    val jitLimit = 8000
    val faces = Seq("dd_curation_pipeline", "dd_quality_gate_pipeline",
      "ta_ingest_pipeline", "dd_method_agreement", "ta_dataset_card")
    for (name <- faces) {
      val df = SparkEntry.queries(name)(spark, sf)
      // execute: AQE finalizes the stages, and the faces' eager
      // checkpoint materializations compile their upstream subtrees
      // into the JVM-wide histogram checked below
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan
      // leg 1: no CodegenFallback expression anywhere in the final
      // plan — an interpreted per-row eval inside a hot projection
      // (Nondeterministic expressions are fallback by design and
      // carry no codegen path to lose)
      val fallbacks = scala.collection.mutable.Set.empty[String]
      plan.foreach { node =>
        node.expressions.foreach(_.foreach {
          case e: org.apache.spark.sql.catalyst.expressions
              .codegen.CodegenFallback
            if !e.isInstanceOf[
              org.apache.spark.sql.catalyst.expressions.Nondeterministic] =>
            fallbacks += e.getClass.getSimpleName
          case _ => ()
        })
      }
      assert(fallbacks.isEmpty,
        s"$name carries interpreted-eval expressions: " +
          s"${fallbacks.toSeq.sorted.mkString(", ")}")
      // leg 2: every finalized whole-stage subtree of the face's own
      // plan compiles with its largest method under BOTH bars
      val subtrees =
        org.apache.spark.sql.execution.debug.codegenStringSeq(plan)
      subtrees.zipWithIndex.foreach { case ((_, _, stats), i) =>
        assert(stats.maxMethodCodeSize < jitLimit,
          s"$name subtree $i: max generated method " +
            s"${stats.maxMethodCodeSize} bytecodes ≥ JIT limit " +
            s"$jitLimit — split the stage")
      }
    }
    // leg 3: the JVM-wide codegen histogram — covers every subtree
    // compiled while the five faces ran, INCLUDING the construction-
    // time checkpoint-feeding subplans their final plans no longer
    // show (the composed faces materialize intermediates eagerly, so
    // leg 2 alone would audit only the post-checkpoint tail)
    val snap = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot
    assert(snap.getMax > 0, "vacuous: no codegen compile recorded")
    assert(snap.getMax < hugeLimit,
      s"some generated method hit ${snap.getMax} bytecodes ≥ " +
        s"hugeMethodLimit $hugeLimit: Spark will silently fall back " +
        "to interpreted execution for that stage")
  }

  /** Per-face escape hatch for the full-catalog codegen audit —
    * expression class simple-names a named face is allowed to
    * evaluate interpreted BEYOND the two structural classes the test
    * allows for everyone (higher-order functions and imperative
    * aggregates, see the test body). Empty today: any entry added
    * here must carry a comment saying why the interpreted eval is
    * acceptable at 100 TB. */
  private val codegenFallbackAllowed: Map[String, Set[String]] =
    Map.empty

  test("full-catalog codegen audit: no interpreted-eval expression " +
      "in any face's plan outside the documented allowlist " +
      "(r18 verdict #2)") {
    // Two expression classes are interpreted BY SPARK'S DESIGN and
    // allowed catalog-wide:
    //  - HigherOrderFunction (transform/filter/aggregate/array_sort
    //    with a lambda) plus its LambdaFunction/NamedLambdaVariable
    //    plumbing: Spark has no codegen path for HOFs at all; they
    //    are the engine's accepted idiom for per-element array work
    //    (38 faces — token pipelines, IVF probe sorts, BM25 postings)
    //    and still vectorize the surrounding stages.
    //  - ImperativeAggregate (HLL++, percentiles, collect_list/set,
    //    PivotFirst, graft's MisraGriesAgg): the buffer evaluates
    //    inside the (Object)HashAggregate operator, never in a
    //    generated per-row projection — there is nothing to codegen.
    // Everything else must stay codegen'd: an interpreted scalar in
    // a hot projection is invisible at sf0.1 and a multi-× data-path
    // regression at 100 TB. In particular this catches one of graft's
    // 7 native Catalyst expressions losing its doGenCode override.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.catalyst.expressions.{
      HigherOrderFunction, LambdaFunction, NamedLambdaVariable,
      Nondeterministic, PlanExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate
      .ImperativeAggregate
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    def fallbacksOf(root: SparkPlan): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      def walk(p: SparkPlan): Unit = {
        val cur = p match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case x => x
        }
        cur.foreach { node =>
          node.expressions.foreach(_.foreach {
            case e: CodegenFallback
              if !e.isInstanceOf[Nondeterministic] &&
                !e.isInstanceOf[HigherOrderFunction] &&
                !e.isInstanceOf[LambdaFunction] &&
                !e.isInstanceOf[NamedLambdaVariable] &&
                !e.isInstanceOf[ImperativeAggregate] =>
              out += e.getClass.getSimpleName
            case pe: PlanExpression[_] => pe.plan match {
              // subquery plans (scalar subqueries, IN-subqueries)
              // carry expressions the main tree walk never sees
              case sp: SparkPlan => walk(sp)
              case _ => ()
            }
            case _ => ()
          })
        }
      }
      walk(root)
      out.toSet
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val found = fallbacksOf(fn(spark, sf).queryExecution.executedPlan)
        val undocumented =
          found -- codegenFallbackAllowed.getOrElse(name, Set.empty)
        if (undocumented.nonEmpty)
          Some(s"$name: ${undocumented.toSeq.sorted.mkString(", ")}")
        else None
    }
    assert(offenders.isEmpty,
      s"undocumented interpreted-eval expressions:\n" +
        offenders.mkString("\n"))
    // the allowlist itself must stay live: an entry whose face no
    // longer exists (or no longer falls back) is stale documentation
    val stale = codegenFallbackAllowed.keys.filterNot(
      SparkEntry.queries.contains)
    assert(stale.isEmpty, s"allowlist names unknown faces: $stale")
  }

  test("no undocumented single-partition global window in any query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        // windowspecdefinition( directly followed by an order spec and
        // no partition column = global window, one task at any scale
        val global = plan.contains("windowspecdefinition(") &&
          raw"windowspecdefinition\(\w+#\d+L? (ASC|DESC)".r
            .findFirstIn(plan).isDefined
        if (global && !globalWindowAllowed(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"undocumented global windows in: $offenders")
  }
}
