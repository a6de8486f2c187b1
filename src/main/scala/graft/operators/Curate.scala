package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation kernels behind the r12 `ta_gopher_rules` /
  * `ta_html_extract` catalog faces — the two standard pre-training
  * passes this engine was still missing: the published Gopher
  * repetition/quality rule set (Rae et al. 2021, appendix A1) and
  * tag-strip text extraction from raw HTML-shaped crawl records.
  * Factored here so any pipeline column can ride the exact rule the
  * catalog faces certify against DuckDB.
  */
object GopherRules {

  /** Gopher repetition thresholds in exact permille, keyed by n-gram
    * order: for n ∈ {2,3,4} the TOP-n-gram character share may not
    * exceed the bound; for n ∈ {5..10} the EXCESS-occurrence
    * character mass of all duplicated n-grams may not. Values are the
    * published A1 fractions ×1000. Public so a caller tuning the gate
    * sees the baseline it is changing. */
  val TopThresholdPm: Map[Int, Long] = Map(2 -> 200L, 3 -> 180L, 4 -> 160L)
  val DupThresholdPm: Map[Int, Long] =
    Map(5 -> 150L, 6 -> 140L, 7 -> 130L, 8 -> 120L, 9 -> 110L, 10 -> 100L)

  /** Word-count and mean-word-length gates (A1's 50–100k words and
    * 3–10 chars/word), the length half of the rule set. */
  val MinWords = 50L
  val MaxWords = 100000L
  val MinWlenMilli = 3000L
  val MaxWlenMilli = 10000L

  /** Per-document Gopher repetition + length metrics, all exact
    * integers so any SQL engine replays them bit-for-bit:
    *
    *  - `n_words`: non-empty whitespace tokens;
    *  - `mean_wlen_milli`: non-space chars ×1000 div n_words;
    *  - `top{2,3,4}_pm`: characters of the MOST FREQUENT n-gram
    *    (count × its non-space char length) as a permille of the
    *    doc's non-space chars. Tie on count breaks to the LONGER
    *    gram — encoded as one max over `count·10⁵ + charlen`, so
    *    both engines pick the identical witness without a rank
    *    window (charlen < 10⁵ is guaranteed: a gram's chars are
    *    bounded by its doc, and a 10⁵-char doc-spanning gram would
    *    be the whole text — still one witness, still exact);
    *  - `dup{5..10}_pm`: EXCESS occurrence mass Σ (count−1)·charlen
    *    over grams with count > 1, permille of non-space chars —
    *    the "fraction of characters in duplicated n-grams" rule
    *    stated without overlap bookkeeping (each repeat re-charges
    *    its full char length; first occurrences are free);
    *  - `keep`: 1 iff every threshold above holds.
    *
    * Shape at 100 TB: the gram stream is 9 narrow explodes of the
    * token array (linear in corpus tokens, no joins), one groupBy on
    * (doc, n, gram) — map-side combinable, duplicate-heavy docs
    * combine before the exchange — then two bounded reductions back
    * to |docs| rows. Nothing is pairwise; nothing is collected.
    * Expects (doc_id, text); returns one row per doc, unordered. */
  def metrics(docs: DataFrame): DataFrame = {
    val base = docs.select(
      col("doc_id"),
      split(col("text"), " ").as("t"),
      length(expr("replace(text, ' ', '')")).cast("long").as("nc"),
      size(expr("filter(split(text, ' '), x -> x <> '')"))
        .cast("long").as("nw"))

    val grams = base
      .select(col("doc_id"), col("t"), col("nc"),
        explode(expr("sequence(2, 10)")).as("n"))
      .where(size(col("t")) >= col("n"))
      .select(col("doc_id"), col("n").cast("long").as("n"), col("nc"),
        explode(expr(
          "transform(sequence(1, size(t) - n + 1)," +
            " i -> concat_ws(' ', slice(t, i, n)))")).as("gram"))

    val gc = grams
      .groupBy("doc_id", "n", "gram")
      .agg(max("nc").as("nc"), count(lit(1)).as("cnt"))
      .withColumn("cl", (length(col("gram")) - (col("n") - 1)))

    val per = gc.groupBy("doc_id", "n")
      .agg(max("nc").as("nc"),
        max(when(col("n") <= 4, col("cnt") * 100000L + col("cl")))
          .as("topcode"),
        sum(when(col("n") >= 5 && col("cnt") > 1,
          (col("cnt") - 1) * col("cl")).otherwise(0L)).as("dupmass"))
      .withColumn("top_pm", expr(
        "((topcode div 100000) * (topcode % 100000) * 1000)" +
          " div greatest(nc, 1L)"))
      .withColumn("dup_pm", expr("(dupmass * 1000) div greatest(nc, 1L)"))

    def topPm(n: Int): Column =
      coalesce(max(when(col("n") === n, col("top_pm"))), lit(0L))
        .as(s"top${n}_pm")
    def dupPm(n: Int): Column =
      coalesce(max(when(col("n") === n, col("dup_pm"))), lit(0L))
        .as(s"dup${n}_pm")

    val pivot = per.groupBy("doc_id").agg(
      topPm(2), topPm(3), topPm(4),
      dupPm(5), dupPm(6), dupPm(7), dupPm(8), dupPm(9), dupPm(10))

    val keepCond = Seq(
      col("n_words") >= MinWords, col("n_words") <= MaxWords,
      col("mean_wlen_milli") >= MinWlenMilli,
      col("mean_wlen_milli") <= MaxWlenMilli) ++
      TopThresholdPm.toSeq.sortBy(_._1).map { case (n, t) =>
        col(s"top${n}_pm") <= t } ++
      DupThresholdPm.toSeq.sortBy(_._1).map { case (n, t) =>
        col(s"dup${n}_pm") <= t }

    base.select(col("doc_id"), col("nw").as("n_words"),
        expr("(nc * 1000) div greatest(nw, 1L)").as("mean_wlen_milli"))
      .join(pivot, Seq("doc_id"), "left")
      .na.fill(0L)
      .withColumn("keep",
        when(keepCond.reduce(_ && _), 1L).otherwise(0L))
  }
}

/** Tag-strip HTML → text extraction as pure built-in expressions —
  * the step between a raw crawl record and every `ta_*`/`dd_*` text
  * face. Deliberately regex-grade (the 100 TB first pass), not a
  * DOM parse: script/style subtrees are dropped wholesale, remaining
  * tags become spaces, the five standard entities decode, whitespace
  * collapses. Entity decoding runs AFTER tag stripping — a decoded
  * `&lt;b&gt;` must surface as literal text, not get re-stripped as
  * markup — and `&amp;` decodes LAST so it cannot manufacture new
  * entities out of `&amp;lt;`. All steps are codegen'd string
  * built-ins; malformed input (unclosed tags, bare `<`, empty
  * strings, NULLs) degrades to leftover literal text, never an
  * error (CurationSpec pins the edge cases). */
object HtmlText {

  /** `<title>` contents ('' when absent). */
  def title(html: Column): Column =
    regexp_extract(html, "<title>([^<]*)</title>", 1)

  /** All `href="…"` targets in document order. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]+)\""), lit(1))

  /** Drop script/style subtrees (non-greedy, so adjacent blocks
    * survive independently), then every remaining tag → one space. */
  def stripTags(html: Column): Column =
    regexp_replace(
      regexp_replace(html,
        "<(script|style)[^>]*>.*?</(script|style)>", " "),
      "<[^>]*>", " ")

  /** The five standard entities; `&amp;` last (see object doc). The
    * entity strings contain no regex metacharacters, so literal
    * regexp_replace is an exact string replace in both engines. */
  def decodeEntities(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&#39;", "'"),
      "&amp;", "&")

  /** The composed extraction: strip → decode → collapse runs of
    * whitespace → trim. */
  def cleanText(html: Column): Column =
    trim(regexp_replace(decodeEntities(stripTags(html)), " +", " "))
}
