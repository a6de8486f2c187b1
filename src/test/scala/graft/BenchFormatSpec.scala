package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench stdout line is a DRIVER CONTRACT: only the last ~2000
  * chars of stdout survive capture, with the sbt epilogue inside the
  * window after the line — r7 shipped an unparseable truncated line
  * this way. Pin the two properties that keep it parseable forever:
  * every emitted line is valid JSON, and no catalog size can push it
  * past the budget. */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper

  private def mk(n: Int, err: Int = 0): Seq[(String, Double, Option[String])] =
    (1 to n).map { i =>
      (f"dd_some_catalog_query_name_$i%03d", i * 0.037,
        if (i <= err) Some("SparkException: boom") else None)
    }

  test("small catalogs emit the full map at millisecond precision") {
    val line = Bench.headline(mk(10), 3, "sf0.1", "BENCH_DETAIL.json")
    val js = mapper.readTree(line)
    assert(js.get("queries").size() == 10)
    assert(!js.has("q_omitted"))
    assert(js.get("reps").asInt() == 3)
    // 3-decimal precision survived (0.037 stays exact)
    assert(js.get("queries").get("dd_some_catalog_query_name_001")
      .asDouble() == 0.037)
  }

  test("every catalog size up to 500 queries fits the budget, parseable") {
    for (n <- Seq(50, 88, 120, 200, 500)) {
      val line = Bench.headline(mk(n), 3, "sf0.1", "BENCH_DETAIL.json")
      assert(line.length <= Bench.StdoutBudget, s"n=$n len=${line.length}")
      val js = mapper.readTree(line)
      assert(js.get("metric").asText() == "total")
      val shown = js.get("queries").size()
      val omitted = if (js.has("q_omitted")) js.get("q_omitted").asInt() else 0
      assert(shown + omitted == n, s"n=$n shown=$shown omitted=$omitted")
      if (omitted > 0) {
        assert(js.get("detail").asText() == "BENCH_DETAIL.json")
        // the SLOWEST queries survive degradation — the last (largest
        // value) name must be shown, the first (smallest) omitted
        assert(js.get("queries").has(f"dd_some_catalog_query_name_$n%03d"))
        assert(!js.get("queries").has("dd_some_catalog_query_name_001"))
      }
    }
  }

  test("error messages stay inside the line and the total excludes them") {
    val line = Bench.headline(mk(88, err = 2), 3, "sf0.1", "d.json")
    assert(line.length <= Bench.StdoutBudget)
    val js = mapper.readTree(line)
    assert(js.get("errors").size() == 2)
    // errored queries carry value -1 upstream; total sums successes only
    val total = mk(88, err = 2).collect { case (_, v, None) => v }.sum
    assert(math.abs(js.get("value").asDouble() - total) < 0.05)
  }

  test("a mass failure still fits the budget: the ladder shrinks the " +
      "error map too, with an omission count") {
    // 40 errored queries × ~30-char messages would blow the budget at
    // every query-shrinking rung if the error map never shrank (the
    // r7 decapitated-stdout failure, on the error path)
    val line = Bench.headline(mk(150, err = 40), 3, "sf0.1", "d.json")
    assert(line.length <= Bench.StdoutBudget,
      s"mass-failure headline exceeds the budget (${line.length})")
    val js = mapper.readTree(line)
    val shownErrs = js.get("errors").size()
    val omittedErrs =
      if (js.has("errors_omitted")) js.get("errors_omitted").asInt() else 0
    assert(shownErrs + omittedErrs == 40,
      s"errors accounted: shown=$shownErrs omitted=$omittedErrs")
    assert(shownErrs > 0, "at least some errors must survive the ladder")
  }

  test("detail JSON always carries the whole catalog at full precision") {
    val detail = Bench.detailJson(mk(500), 3, "sf0.01")
    val js = mapper.readTree(detail)
    assert(js.get("queries").size() == 500)
    assert(js.get("sf").asText() == "sf0.01")
  }

  test("regression gate fires on the r8 drift and round-trips detail") {
    // the exact cluster that slipped through r8's total-only check:
    // dedup queries 2-9x slower on unchanged code
    val prev = Map("dd_incremental" -> 0.74, "dd_curation_pipeline" -> 4.95,
      "dd_minhash_bound" -> 1.51, "dd_exact" -> 0.18,
      "ev_lag_lead" -> 0.10, "rel_union" -> 0.14)
    val cur = Map("dd_incremental" -> 6.94, "dd_curation_pipeline" -> 9.96,
      "dd_minhash_bound" -> 3.19, "dd_exact" -> 0.60,
      // sub-floor jitter must NOT fire: 2x but only +0.1s
      "ev_lag_lead" -> 0.20, "rel_union" -> 0.15,
      // new query with no previous number: not comparable
      "rel_copurchase" -> 1.06)
    val regs = Bench.regressions(prev, cur)
    assert(regs.map(_._1).toSet === Set("dd_incremental",
      "dd_curation_pipeline", "dd_minhash_bound", "dd_exact"))
    // worst factor first
    assert(regs.head._1 === "dd_incremental")
    // the comparison source is the detail file this object writes —
    // parse must invert detailJson for any catalog
    val detail = Bench.detailJson(mk(120), 3, "sf0.1")
    val parsed = Bench.parseDetailQueries(detail)
    assert(parsed.size === 120)
    assert(parsed("dd_some_catalog_query_name_001") === 0.037)
    // scalar fields for the sf/reps mismatch guard
    assert(Bench.parseDetailField(detail, "sf") === Some("sf0.1"))
    assert(Bench.parseDetailField(detail, "reps") === Some("3"))
    // a truncated file (killed mid-write) must parse to empty, never
    // throw — the gate runs AFTER the whole catalog was timed
    val cut = detail.substring(0, detail.indexOf("\"queries\":{") + 15)
    assert(Bench.parseDetailQueries(cut) === Map.empty)
    assert(Bench.parseDetailQueries("") === Map.empty)
  }

  test("self-arbitration record: reruns + unresolved_flags round-trip") {
    val reruns = Seq(
      Bench.Rerun("dd_curation_pipeline", 34.45, 6.02, 5.82,
        resolved = true),
      Bench.Rerun("dd_source_overlap", 2.70, 2.55, 0.98,
        resolved = false))
    val detail = Bench.detailJson(mk(120), 3, "sf0.1", calib = 0.29,
      cpus = "32", reruns = reruns, calib2 = 0.26, unresolvedFlags = 1)
    val js = mapper.readTree(detail)
    // both medians + prev + verdict, per flagged query
    val r1 = js.get("reruns").get("dd_curation_pipeline")
    assert(r1.get("first").asDouble() == 34.45)
    assert(r1.get("rerun").asDouble() == 6.02)
    assert(r1.get("prev").asDouble() == 5.82)
    assert(r1.get("resolved").asBoolean())
    assert(!js.get("reruns").get("dd_source_overlap").get("resolved")
      .asBoolean())
    assert(js.get("calib2").asDouble() == 0.26)
    assert(js.get("unresolved_flags").asInt() == 1)
    // the queries map parse is UNAFFECTED by the nested rerun objects
    // (they serialize after it — parseDetailQueries scans to the first
    // closing brace past "queries":{)
    assert(Bench.parseDetailQueries(detail).size == 120)
    // gate-compared-clean run: flags count present as explicit zero
    val clean = Bench.detailJson(mk(5), 3, "sf0.1", calib = 0.25,
      unresolvedFlags = 0)
    assert(mapper.readTree(clean).get("unresolved_flags").asInt() == 0)
    assert(!mapper.readTree(clean).has("reruns"))
    // no comparison happened (first run): both fields absent
    val first = Bench.detailJson(mk(5), 3, "sf0.1", calib = 0.25)
    assert(!mapper.readTree(first).has("unresolved_flags"))
    assert(!mapper.readTree(first).has("reruns"))
  }

  test("calib round-trips through detail and normalizes the gate") {
    // with calib: field present and parseable
    val detail = Bench.detailJson(mk(10), 3, "sf0.1", calib = 0.412,
      cpus = "32")
    assert(mapper.readTree(detail).get("calib").asDouble() === 0.412)
    assert(Bench.parseDetailField(detail, "calib") === Some("0.412"))
    assert(Bench.parseDetailField(detail, "cpus") === Some("32"))
    // without calib (older files): field absent, parse yields None
    val old = Bench.detailJson(mk(10), 3, "sf0.1")
    assert(!mapper.readTree(old).has("calib"))
    assert(Bench.parseDetailField(old, "calib") === None)
    // the gate's normalization contract: a uniformly 2.2×-slower host
    // (calib 0.4 → 0.88) divides every current time by 2.2 before
    // comparing, so unchanged code shows ZERO regressions...
    val prev = Map("a" -> 1.0, "b" -> 0.5)
    val slowHost = Map("a" -> 2.2, "b" -> 1.1).map {
      case (k, v) => k -> v / (0.88 / 0.4) }
    assert(Bench.regressions(prev, slowHost).isEmpty)
    // ...while a genuine 4× regression still clears the 1.5× bar
    // after the same normalization
    val realReg = Map("a" -> 4.0 / (0.88 / 0.4), "b" -> 0.5)
    assert(Bench.regressions(prev, realReg).map(_._1) === Seq("a"))
  }

  test("skew_bench evidence serializes after queries and stays valid JSON") {
    val skew = Map("join_plain_skew" -> 1.605, "scd2_salted_skew" -> 3.463)
    val detail = Bench.detailJson(mk(120), 3, "sf0.1", calib = 0.2,
      cpus = "32", skew = skew)
    val js = mapper.readTree(detail)
    assert(js.get("skew_bench").get("join_plain_skew").asDouble() === 1.605)
    // the queries parser must still stop at the queries object
    assert(Bench.parseDetailQueries(detail).size === 120)
  }

  test("skew context + cold/warm maps serialize, round-trip, stay parseable") {
    val skew = Map("cusum_plain_skew" -> 10.5, "cusum_salted_skew" -> 3.7)
    val cold = Map("dd_some_catalog_query_name_001" -> 1.9)
    val warm = Map("dd_some_catalog_query_name_001" -> 0.8)
    val detail = Bench.detailJson(mk(120), 3, "sf0.1", calib = 0.2,
      cpus = "32", skew = skew, skewCtx = "carried",
      coldMap = cold, warmMap = warm)
    val js = mapper.readTree(detail)
    assert(js.get("skew_bench_context").asText() === "carried")
    assert(js.get("cold").get("dd_some_catalog_query_name_001")
      .asDouble() === 1.9)
    assert(js.get("warm").get("dd_some_catalog_query_name_001")
      .asDouble() === 0.8)
    // the queries parser still stops at the queries object, and the
    // skew parser round-trips its own section
    assert(Bench.parseDetailQueries(detail).size === 120)
    assert(Bench.parseSkewBench(detail) === skew)
    assert(Bench.parseDetailField(detail, "skew_bench_context")
      === Some("carried"))
    // no context tag without cells; no tag requested → absent
    val bare = Bench.detailJson(mk(5), 3, "sf0.1", skew = skew)
    assert(!mapper.readTree(bare).has("skew_bench_context"))
    assert(Bench.parseSkewBench("{\"queries\":{\"a\":1}}") === Map.empty)
  }

  test("datapath_bench cells + context + deviations serialize after " +
      "queries, round-trip, and leave every other parser untouched") {
    val dp = Map("gopher_stats" -> 1.234, "bm25_probe" -> 0.456,
      "png_decode" -> 2.001)
    val detail = Bench.detailJson(mk(120), 3, "sf0.1", calib = 0.2,
      cpus = "32", skew = Map("join_plain_skew" -> 1.5),
      skewCtx = "controlled", datapath = dp,
      datapathCtx = "controlled", datapathDevs = Some(Set("png_decode")))
    val js = mapper.readTree(detail)
    assert(js.get("datapath_bench").get("gopher_stats")
      .asDouble() === 1.234)
    assert(js.get("datapath_bench_context").asText() === "controlled")
    assert(js.get("datapath_bench_deviations").get(0)
      .asText() === "png_decode")
    // round-trips through its own parser; the queries/skew parsers
    // still stop at their own sections
    assert(Bench.parseDatapathBench(detail) === dp)
    assert(Bench.parseDetailQueries(detail).size === 120)
    assert(Bench.parseSkewBench(detail) ===
      Map("join_plain_skew" -> 1.5))
    assert(Bench.parseDetailField(detail, "datapath_bench_context")
      === Some("controlled"))
    // no cells → no section, no tags; missing section parses empty
    val bare = Bench.detailJson(mk(5), 3, "sf0.1",
      datapathCtx = "controlled")
    assert(!mapper.readTree(bare).has("datapath_bench"))
    assert(!mapper.readTree(bare).has("datapath_bench_context"))
    assert(Bench.parseDatapathBench("{\"queries\":{\"a\":1}}")
      === Map.empty)
    // the carry/guard decision kernel is shared with the skew matrix:
    // a loaded host carries controlled datapath cells verbatim
    assert(Bench.skewPlan(loadedHost = true, dp,
      Some("controlled")) === ((false, "carried")))
    // and the deviation guard flags a >2x cell in either direction
    assert(Bench.skewDeviations(
      Map("gopher_stats" -> 2.9), dp) === Set("gopher_stats"))
    // carry-without-measuring preserves provenance: only controlled
    // evidence may be re-tagged "carried" — a 'loaded' or untagged
    // matrix keeps its own tag, so skewPlan can replace it later
    // instead of treating laundered noise as controlled-equivalent
    assert(Bench.carryCtx(dp, Some("controlled")) === "carried")
    assert(Bench.carryCtx(dp, Some("carried")) === "carried")
    assert(Bench.carryCtx(dp, Some("loaded")) === "loaded")
    assert(Bench.carryCtx(dp, None) === "")
    assert(Bench.carryCtx(Map.empty, Some("controlled")) === "")
  }

  test("frame_noise flags: tagged in the record, carried not failed " +
      "(excluded from unresolved_flags)") {
    // r18 verdict #1: a loadavg-2.47 launch shipped 4 UNRESOLVED
    // flags its own frame block refuted. A flag whose rerun persists
    // on an UNCONTROLLED frame is now tagged frame_noise and never
    // counts as unresolved — the catalog analogue of the skew
    // section's carry-on-loaded-host stance.
    val reruns = Seq(
      Bench.Rerun("ss_recall_report", 2.9, 2.8, 1.81,
        resolved = false, frameNoise = true),
      Bench.Rerun("ta_quality_drift", 2.5, 1.7, 1.89,
        resolved = true),
      Bench.Rerun("dd_real_regression", 9.0, 8.8, 1.0,
        resolved = false))
    // the kernel: only a persisted flag on a CONTROLLED frame is
    // unresolved
    assert(Bench.unresolvedCount(reruns) === 1)
    assert(Bench.unresolvedCount(reruns.take(2)) === 0)
    // the demotion verdict: a persisted timing on an uncontrolled
    // frame demotes; a CRASHED rerun never does (an error is a
    // failure, not timing noise), and a controlled frame never does
    assert(Bench.frameNoiseVerdict(resolved = false,
      frameUncontrolled = true, errored = false))
    assert(!Bench.frameNoiseVerdict(resolved = false,
      frameUncontrolled = true, errored = true))
    assert(!Bench.frameNoiseVerdict(resolved = false,
      frameUncontrolled = false, errored = false))
    assert(!Bench.frameNoiseVerdict(resolved = true,
      frameUncontrolled = true, errored = false))
    val detail = Bench.detailJson(mk(10), 3, "sf0.1", calib = 0.29,
      cpus = "32", reruns = reruns, calib2 = 0.26,
      unresolvedFlags = Bench.unresolvedCount(reruns))
    val js = mapper.readTree(detail)
    // per-flag tag: present (true) only on the frame-noise entry —
    // pre-r19 records and controlled-frame verdicts omit the field
    assert(js.get("reruns").get("ss_recall_report")
      .get("frame_noise").asBoolean())
    assert(!js.get("reruns").get("ta_quality_drift").has("frame_noise"))
    assert(!js.get("reruns").get("dd_real_regression").has("frame_noise"))
    // top-level counts: the frame-noise flag is visible (so a reader
    // knows to re-judge on a controlled host) but NOT failed
    assert(js.get("unresolved_flags").asInt() === 1)
    assert(js.get("frame_noise_flags").asInt() === 1)
    // no frame-noise flags → the companion count is absent
    val clean = Bench.detailJson(mk(10), 3, "sf0.1",
      reruns = reruns.filterNot(_.frameNoise), unresolvedFlags = 1)
    assert(!mapper.readTree(clean).has("frame_noise_flags"))
  }

  test("frame block: loadavg/calib/controlled serialize numerically, " +
      "round-trip via parseFrame, and stay absent when unset") {
    val detail = Bench.detailJson(mk(50), 3, "sf0.1", calib = 0.21,
      cpus = "32", calibSh = 0.8, loadavg = 0.375, controlled = 1)
    val js = mapper.readTree(detail)
    assert(js.get("frame").get("loadavg").asDouble() === 0.375)
    assert(js.get("frame").get("calib").asDouble() === 0.21)
    assert(js.get("frame").get("calib_sh").asDouble() === 0.8)
    assert(js.get("frame").get("controlled").asInt() === 1)
    val f = Bench.parseFrame(detail)
    assert(f("loadavg") === 0.375 && f("controlled") === 1.0)
    // the queries parser still stops at the queries object
    assert(Bench.parseDetailQueries(detail).size === 50)
    // the frame block reuses the top-level key names "calib"/
    // "calib_sh"; the tolerant first-match parseDetailField must
    // still return the TOP-LEVEL value on a frame-bearing record —
    // this pins the serialization-order constraint detailJson
    // documents (framePart after calibPart)
    assert(Bench.parseDetailField(detail, "calib") === Some("0.21"))
    assert(Bench.parseDetailField(detail, "calib_sh") === Some("0.8"))
    // platform with no loadavg but a frame verdict still records it
    val noLoad = Bench.detailJson(mk(5), 3, "sf0.1", calib = 0.2,
      loadavg = -1.0, controlled = 0)
    val nj = mapper.readTree(noLoad)
    assert(!nj.get("frame").has("loadavg"))
    assert(nj.get("frame").get("controlled").asInt() === 0)
    // pre-frame writer: both unset → block absent, parseFrame empty
    val pre = Bench.detailJson(mk(5), 3, "sf0.1")
    assert(!mapper.readTree(pre).has("frame"))
    assert(Bench.parseFrame(pre) === Map.empty)
  }

  test("skew guard: loaded host can never overwrite a controlled matrix") {
    val frame = Some((0.7, 0.9))
    // within guard on both probes → controlled re-measure
    assert(!Bench.hostLoaded(frame, 0.9, 1.2))
    assert(Bench.skewPlan(loadedHost = false, Map("c" -> 1.0),
      Some("controlled")) === ((true, "controlled")))
    // either probe past 1.5× its frame → loaded
    assert(Bench.hostLoaded(frame, 1.1, 0.9))   // cpu 1.57×
    assert(Bench.hostLoaded(frame, 0.7, 1.4))   // shuffle 1.56×
    // no frame (first run / foreign floor) → never loaded
    assert(!Bench.hostLoaded(None, 99.0, 99.0))
    // unrecorded channel (-1) never triggers
    assert(!Bench.hostLoaded(Some((-1.0, 0.9)), 99.0, 1.2))
    // loadavg leg (r18 verdict #1): a launch loadavg past the gate is
    // loaded even with calibs inside the guard — the r18 driver frame
    // (loadavg 2.474, calibs in-band) shipped 4 floor flags the
    // controlled record refuted; the probes are blind to competitor
    // load that lands after probe time
    assert(Bench.hostLoaded(frame, 0.9, 1.2, loadavg = 2.474))
    // ...and works without any floor frame at all
    assert(Bench.hostLoaded(None, 99.0, 99.0, loadavg = 2.0))
    // under the gate (or unavailable, -1) the leg stays silent
    assert(!Bench.hostLoaded(frame, 0.9, 1.2, loadavg = 0.3))
    assert(!Bench.hostLoaded(None, 99.0, 99.0, loadavg = -1.0))
    assert(!Bench.hostLoaded(None, 99.0, 99.0,
      loadavg = Bench.LoadavgGate))
    // loaded + previous controlled cells → CARRY, do not re-measure
    // (the r12 failure: a 2.4×-loaded closing refresh overwrote the
    // builder's controlled matrix with physically-backwards cells)
    assert(Bench.skewPlan(loadedHost = true,
      Map("scd2_plain_uniform" -> 2.4), Some("controlled"))
      === ((false, "carried")))
    // an already-carried matrix keeps being carried under load
    assert(Bench.skewPlan(loadedHost = true, Map("c" -> 1.0),
      Some("carried")) === ((false, "carried")))
    // a record with NO context tag has unknown provenance (r13
    // verdict #1: the one such incumbent was the r12 loaded-host
    // matrix with physically-backwards cells, and defaulting it to
    // "controlled" laundered it into quotable evidence) — it is
    // carried NOWHERE: the loaded host re-measures and says "loaded"
    assert(Bench.skewPlan(loadedHost = true, Map("c" -> 1.0), None)
      === ((true, "loaded")))
    // nothing worth protecting: measure, but the record says "loaded"
    assert(Bench.skewPlan(loadedHost = true, Map.empty,
      Some("controlled")) === ((true, "loaded")))
    assert(Bench.skewPlan(loadedHost = true, Map("c" -> 1.0),
      Some("loaded")) === ((true, "loaded")))
  }

  test("skew-only splice replaces cells + context, touches nothing else") {
    val orig = Bench.detailJson(mk(20), 3, "sf0.1", calib = 0.3,
      cpus = "32", skew = Map("scd2_plain_uniform" -> 13.641,
        "scd2_plain_skew" -> 6.458), skewCtx = "carried")
    val fresh = Map("scd2_plain_uniform" -> 5.8, "scd2_plain_skew" -> 11.2)
    val patched = Bench.spliceSkewBench(orig, fresh, "controlled").get
    val js = mapper.readTree(patched)
    assert(js.get("skew_bench").get("scd2_plain_uniform").asDouble() === 5.8)
    assert(js.get("skew_bench").size() === 2)
    assert(js.get("skew_bench_context").asText() === "controlled")
    // the catalog record around the splice is byte-identical
    assert(js.get("queries").size() === 20)
    assert(js.get("calib").asDouble() === 0.3)
    assert(Bench.parseSkewBench(patched) === fresh)
    // a PRE-GUARD record (cells, no context tag — the unknown-
    // provenance class the seeding path exists to displace) gets the
    // tag inserted next to the replaced cells, staying valid JSON
    val preGuard = Bench.detailJson(mk(20), 3, "sf0.1", calib = 0.3,
      skew = Map("scd2_plain_uniform" -> 13.641))
    assert(!mapper.readTree(preGuard).has("skew_bench_context"))
    val seeded = Bench.spliceSkewBench(preGuard, fresh, "controlled").get
    val sjs = mapper.readTree(seeded)
    assert(sjs.get("skew_bench_context").asText() === "controlled")
    assert(sjs.get("skew_bench").get("scd2_plain_skew").asDouble() === 11.2)
    assert(sjs.get("skew_bench").size() === 2)
    assert(sjs.get("queries").size() === 20)
    assert(Bench.parseDetailField(seeded, "skew_bench_context")
      === Some("controlled"))
    // no skew section at all / no cells → refuse rather than guess
    val bare = Bench.detailJson(mk(5), 3, "sf0.1")
    assert(Bench.spliceSkewBench(bare, fresh, "controlled") === None)
    assert(Bench.spliceSkewBench(orig, Map.empty, "controlled") === None)
  }

  test("skew deviation guard: >2x cells detected, tagged, spliced; " +
      "brace drift fails loudly") {
    // the kernel: either direction past the factor, missing or
    // nonpositive cells can never deviate (r14 verdict #1: a 15.86 s
    // cell over a 3.79 s carried controlled value shipped untagged)
    val carried = Map("scd2_salted_uniform" -> 3.79,
      "join_plain_skew" -> 1.6, "cusum_plain_skew" -> 10.0,
      "gone" -> 2.0, "bad" -> -1.0)
    val fresh = Map("scd2_salted_uniform" -> 15.86, // 4.2× slower
      "join_plain_skew" -> 0.7,                     // 2.3× faster
      "cusum_plain_skew" -> 11.0,                   // within 2×
      "new_cell" -> 9.9, "bad" -> 5.0)
    assert(Bench.skewDeviations(fresh, carried)
      === Set("scd2_salted_uniform", "join_plain_skew"))
    assert(Bench.skewDeviations(fresh, carried, factor = 5.0)
      === Set.empty)
    // exactly at the factor is NOT a deviation (strict >)
    assert(Bench.skewDeviations(Map("a" -> 2.0), Map("a" -> 1.0))
      === Set.empty)
    // detailJson: the tag is present (sorted, possibly empty) exactly
    // when the guard compared — Some — and absent when it could not
    val skew = Map("scd2_salted_uniform" -> 15.86)
    val tagged = Bench.detailJson(mk(10), 3, "sf0.1", cpus = "32",
      skew = skew, skewCtx = "controlled",
      skewDevs = Some(Set("scd2_salted_uniform")))
    val tjs = mapper.readTree(tagged)
    assert(tjs.get("skew_bench_deviations").size() === 1)
    assert(tjs.get("skew_bench_deviations").get(0).asText()
      === "scd2_salted_uniform")
    val clean = Bench.detailJson(mk(10), 3, "sf0.1", cpus = "32",
      skew = skew, skewCtx = "controlled", skewDevs = Some(Set.empty))
    assert(mapper.readTree(clean).get("skew_bench_deviations").size()
      === 0)
    val noGuard = Bench.detailJson(mk(10), 3, "sf0.1", cpus = "32",
      skew = skew, skewCtx = "carried")
    assert(!mapper.readTree(noGuard).has("skew_bench_deviations"))
    // splice: a stale deviations tag is dropped with the matrix it
    // described; the new guard's tag rides in with the context
    val fresh2 = Map("scd2_salted_uniform" -> 3.9)
    val respliced = Bench.spliceSkewBench(tagged, fresh2, "controlled",
      devs = Some(Set.empty)).get
    val rjs = mapper.readTree(respliced)
    assert(rjs.get("skew_bench").get("scd2_salted_uniform")
      .asDouble() === 3.9)
    assert(rjs.get("skew_bench_deviations").size() === 0)
    assert(rjs.get("queries").size() === 10)
    val guardless = Bench.spliceSkewBench(tagged, fresh2,
      "controlled").get
    assert(!mapper.readTree(guardless).has("skew_bench_deviations"))
    val reTagged = Bench.spliceSkewBench(noGuard, fresh2, "controlled",
      devs = Some(Set("scd2_salted_uniform"))).get
    assert(mapper.readTree(reTagged).get("skew_bench_deviations")
      .get(0).asText() === "scd2_salted_uniform")
    // a nested value inside skew_bench would put the first '}' at
    // the wrong brace — the splice must refuse loudly, not truncate
    val nested = tagged.replace(""""skew_bench":{""",
      """"skew_bench":{"inner":{"x":1},""")
    intercept[IllegalArgumentException] {
      Bench.spliceSkewBench(nested, fresh2, "controlled")
    }
  }

  test("value_resolved: resolved flags replace their medians in the companion total") {
    val results = mk(10)  // q_i = i * 0.037
    val reruns = Seq(
      Bench.Rerun("dd_some_catalog_query_name_010", 0.37, 0.05, 0.06,
        resolved = true),
      // UNRESOLVED flags keep their measured value — a real
      // regression must not be laundered out of the total
      Bench.Rerun("dd_some_catalog_query_name_009", 0.333, 0.30, 0.10,
        resolved = false))
    val detail = Bench.detailJson(results, 3, "sf0.1", calib = 0.3,
      reruns = reruns, unresolvedFlags = 1)
    val js = mapper.readTree(detail)
    val expect = results.map(_._2).sum - 0.37 + 0.05
    assert(math.abs(js.get("value_resolved").asDouble() - expect) < 1e-6)
    assert(math.abs(js.get("value").asDouble() -
      results.map(_._2).sum) < 1e-6)
    // stdout line carries the same companion and stays in budget
    val line = Bench.headline(results, 3, "sf0.1", "d.json", reruns)
    val hjs = mapper.readTree(line)
    assert(math.abs(hjs.get("value_resolved").asDouble() - expect) < 0.01)
    assert(line.length <= Bench.StdoutBudget)
    // absent when nothing resolved (no flags, or all real)
    val none = Bench.detailJson(results, 3, "sf0.1",
      reruns = reruns.filterNot(_.resolved), unresolvedFlags = 1)
    assert(!mapper.readTree(none).has("value_resolved"))
    assert(!mapper.readTree(Bench.detailJson(results, 3, "sf0.1"))
      .has("value_resolved"))
  }

  test("monotone floor: round-trips, only lowers, and catches multi-run drift") {
    // round-trip (3-element entries: [t, calibCpu, calibShuffle])
    val entries = Map("q1" -> ((1.25, 0.14, 0.5)), "q2" -> ((0.5, 0.2, 0.6)))
    val js = Bench.floorJson("sf0.1", 3, "32", entries)
    assert(Bench.parseFloorQueries(js) === entries)
    assert(Bench.parseDetailField(js, "sf") === Some("sf0.1"))
    assert(Bench.parseDetailField(js, "cpus") === Some("32"))
    assert(Bench.parseFloorQueries("") === Map.empty)
    assert(Bench.floorPath("BENCH_DETAIL.json") === "BENCH_FLOOR.json")
    // pre-shuffle-probe files (2-element entries) parse with the
    // shuffle calib absent — cpu-only normalization, the old behavior
    val legacy = """{"sf":"sf0.1","reps":3,"cpus":"32",""" +
      """"queries":{"q1":[1.25,0.14]}}"""
    assert(Bench.parseFloorQueries(legacy) === Map("q1" -> ((1.25, 0.14, -1.0))))
    // update: lowers on a faster run, never raises on a slower one,
    // seeds unseen queries
    val up = Bench.updatedFloor(entries,
      Map("q1" -> 0.9, "q2" -> 3.0, "q3" -> 0.7), calib = 0.3, calibSh = 0.7)
    assert(up("q1") === ((0.9, 0.3, 0.7)))   // lowered, new calibs recorded
    assert(up("q2") === ((0.5, 0.2, 0.6)))   // slower run: floor unchanged
    assert(up("q3") === ((0.7, 0.3, 0.7)))   // seeded
    // the r10 blind spot: pagerank drifted 2.4 -> 3.3 -> 4.0 in two
    // sub-1.5x steps; the last-record gate re-baselined each time,
    // the floor base still flags the accumulated 1.67x
    val prev = Map("ta_domain_pagerank" -> 3.3)
    val floor = Map("ta_domain_pagerank" -> ((2.4, 0.14, -1.0)))
    val regs = Bench.regressionsWithFloor(prev, Some(0.14), None, floor,
      Map("ta_domain_pagerank" -> 4.0), calib = 0.14)
    assert(regs.map(r => (r._1, r._2, r._5)) ===
      Seq(("ta_domain_pagerank", 2.4, "floor")))
    // excuse-only normalization applies per base: same raw times on a
    // host whose probe says 2x slower do not flag
    val slowHost = Bench.regressionsWithFloor(prev, Some(0.14), None, floor,
      Map("ta_domain_pagerank" -> 4.0), calib = 0.28)
    assert(slowHost.isEmpty)
    // a query with no floor entry still gets the prev-record gate
    val prevOnly = Bench.regressionsWithFloor(
      Map("x" -> 1.0), Some(0.2), None, Map.empty,
      Map("x" -> 2.1), calib = 0.2)
    assert(prevOnly.map(r => (r._1, r._5)) === Seq(("x", "prev")))
    // the r11 blind spot: host reboot leaves the CPU probe IDENTICAL
    // while shuffle throughput drops 1.7x — the shuffle channel must
    // excuse the uniform drift on identical code...
    val shFloor = Map("q" -> ((0.71, 0.17, 0.5)))
    val shExcused = Bench.regressionsWithFloor(
      Map.empty, None, None, shFloor,
      Map("q" -> 1.29), calib = 0.17, calibSh = 0.9)
    assert(shExcused.isEmpty,
      "shuffle-probe excuse must clear the identical-code reboot drift")
    // ...but with BOTH probes flat, the same drift is a real
    // regression and still flags
    val shFlags = Bench.regressionsWithFloor(
      Map.empty, None, None, shFloor,
      Map("q" -> 1.29), calib = 0.17, calibSh = 0.5)
    assert(shFlags.map(r => (r._1, r._5)) === Seq(("q", "floor")))
    // the cross-frame re-seed hole: a noisy-LOW probe (0.2 -> 0.1,
    // "host 2x faster") with raw parity must NOT lower the floor —
    // the (1.9, 0.1) entry it would write excuses 2x drift on every
    // later 0.2-probe run; the shuffle channel guards the same hole
    val noisy = Bench.updatedFloor(Map("q" -> ((2.0, 0.2, -1.0))),
      Map("q" -> 1.9), calib = 0.1)
    assert(noisy("q") === ((2.0, 0.2, -1.0)),
      "raw parity under a halved probe must not re-seed the floor")
    val noisySh = Bench.updatedFloor(Map("q" -> ((2.0, 0.2, 0.6))),
      Map("q" -> 1.9), calib = 0.2, calibSh = 0.3)
    assert(noisySh("q") === ((2.0, 0.2, 0.6)),
      "raw parity under a halved SHUFFLE probe must not re-seed either")
    // a genuine win still lowers it once it clears the clamped scale
    val win = Bench.updatedFloor(Map("q" -> ((2.0, 0.2, -1.0))),
      Map("q" -> 0.9), calib = 0.1)
    assert(win("q") === ((0.9, 0.1, -1.0)),
      "0.9 x 2.0 scale = 1.8 < 2.0: beats the floor in its own frame")
  }

  test("floor provenance: hand-re-baseline markers round-trip, drop " +
      "for re-measured entries, and ride a floor-flag into the record") {
    val entries = Map("q1" -> ((1.25, 0.14, 0.5)), "q2" -> ((0.5, 0.2, 0.6)))
    val prov = Map("q1" -> "r16: stale floor, controlled re-read 1.25")
    val js = Bench.floorJson("sf0.1", 3, "32", entries, prov)
    // queries parse is untouched by the string-valued section
    assert(Bench.parseFloorQueries(js) === entries)
    assert(Bench.parseFloorProvenance(js) === prov)
    // a brace inside a value must not truncate the section (hand
    // edits reference "{controlled}" protocols); later entries survive
    val braced = Map("a_q" -> "r17: re-read {controlled} 1.2",
      "z_q" -> "r17: later entry")
    val bjs = Bench.floorJson("sf0.1", 3, "32",
      Map("a_q" -> ((1.0, 0.1, 0.5)), "z_q" -> ((2.0, 0.1, 0.5))), braced)
    assert(Bench.parseFloorProvenance(bjs) === braced,
      "brace in a provenance value truncated the section")
    // a HAND-formatted section (the map exists for hand edits) with
    // whitespace around the colons must parse, not silently vanish
    // on the next round-trip
    val pretty = js.replace("\"provenance\":{",
      "\"provenance\": {\n  ").replace("\":\"r16", "\": \"r16")
    assert(Bench.parseFloorProvenance(pretty) === prov,
      "whitespace-formatted provenance dropped")
    // absent section → empty map; provenance for a key not in the
    // floor is dropped at write (its entry is gone — nothing to
    // describe)
    assert(Bench.parseFloorProvenance(
      Bench.floorJson("sf0.1", 3, "32", entries)) === Map.empty)
    assert(Bench.parseFloorProvenance(Bench.floorJson("sf0.1", 3, "32",
      entries, Map("gone" -> "r9: whatever"))) === Map.empty)
    // the shipped BENCH_FLOOR.json's own markers parse
    val shipped = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_FLOOR.json")), "UTF-8")
    val shippedProv = Bench.parseFloorProvenance(shipped)
    val shippedQs = Bench.parseFloorQueries(shipped)
    assert(shippedProv.nonEmpty,
      "the r16 hand-edited floor entries must carry provenance markers")
    assert(shippedProv.keySet.subsetOf(shippedQs.keySet),
      "provenance names a floor entry that no longer exists")
    assert(shippedProv.values.forall(_.startsWith("r")),
      "provenance lines name their round")
    // a flag against a provenance-carrying floor entry ships the
    // marker in the rerun record; a measured-floor flag ships none
    val reruns = Seq(
      Bench.Rerun("q1", 2.6, 2.5, 1.25, resolved = false,
        floorProv = prov.get("q1")),
      Bench.Rerun("q2", 1.2, 1.1, 0.5, resolved = true))
    val detail = Bench.detailJson(
      Seq(("q1", 2.6, None), ("q2", 1.2, None)), 3, "sf0.1",
      calib = 0.2, cpus = "32", reruns = reruns, calib2 = 0.2,
      unresolvedFlags = 1)
    assert(detail.contains(
      """"floor_prov":"r16: stale floor, controlled re-read 1.25""""),
      s"flag record must name the floor's provenance:\n$detail")
    assert(!detail.contains(""""q2":{"first":1.2""") ||
      !detail.substring(detail.indexOf(""""q2":{"first"""))
        .takeWhile(_ != '}').contains("floor_prov"),
      "a measured-floor flag must not carry a provenance field")
    // still one valid JSON line
    assert(!detail.contains("\n"))
  }

  test("calib normalization excuses a slower host, never inflates a faster one") {
    // slower host: probe 0.4 → 0.88 excuses up to 2.2×
    assert(math.abs(Bench.calibScale(0.4, 0.88) - 2.2) < 1e-9)
    // excuse capped at 3× — past that the record isn't comparable
    assert(Bench.calibScale(0.1, 1.0) === 3.0)
    // faster probe: floored at 1.0 — raw parity with the previous
    // record must never read as a regression (the round-10 false-flag
    // mode: probe halved, 32-thread query throughput unchanged)
    assert(Bench.calibScale(0.254, 0.133) === 1.0)
    assert(Bench.calibScale(0.2, 0.2) === 1.0)
    // dual-channel: the excuse is the WORSE of the two probes, each
    // channel independently excuse-only and degrading gracefully when
    // a base predates the shuffle probe
    assert(math.abs(Bench.dualScale(Some(0.2), Some(0.5), 0.2, 0.85)
      - 1.7) < 1e-9)
    assert(math.abs(Bench.dualScale(Some(0.2), Some(0.5), 0.3, 0.5)
      - 1.5) < 1e-9)
    assert(Bench.dualScale(Some(0.2), None, 0.4, 0.9) === 2.0)
    assert(Bench.dualScale(None, None, 0.4, 0.9) === 1.0)
    assert(Bench.dualScale(Some(0.2), Some(0.5), 0.1, 0.25) === 1.0)
  }
}
