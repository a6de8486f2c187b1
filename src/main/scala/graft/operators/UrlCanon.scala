package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical-URL normalization — the library-facing kernel behind
  * `dd_url_dedup` (the crawl pipeline's cheapest pre-content-dedup
  * pass), factored so any pipeline column can be canonicalized with
  * the exact rule the catalog face certifies against DuckDB.
  *
  * The rule, stated once: lowercase the scheme and host; split the
  * authority at the FIRST `://` (a URL whose path embeds another URL
  * — unencoded redirect targets are common in crawls — must keep the
  * OUTER host); strip the SCHEME'S OWN default port (`:80` for http,
  * `:443` for https, repeated; other schemes keep their ports —
  * `http://h:443/x` is not `http://h/x`), the
  * `#fragment`, and tracking params (`utm_*`, `fbclid`, `gclid` —
  * all other params survive in their original order; the query is
  * everything after the FIRST `?`, so embedded `?` characters,
  * legal per RFC 3986, stay inside it); drop ALL trailing slashes
  * from the path. Pure built-in expressions — narrow, codegen'd, no
  * UDF — so the normalization runs inside whole-stage codegen and
  * any SQL engine replays it with string functions.
  *
  * Idempotent by construction (canonicalize ∘ canonicalize =
  * canonicalize — every rule's output is a fixed point of that rule,
  * which is why the port/slash strips are greedy `+` repeats rather
  * than single-occurrence; PropertySpec pins it on adversarial
  * variants including `//`-tailed paths and stacked default ports),
  * which is what lets incremental crawls canonicalize re-crawled
  * URLs without tracking whether a string was already normalized. */
object UrlCanon {

  /** Tracking-parameter pattern — a query-string `k=v` pair whose key
    * matches is dropped. Public, so callers extending the list keep
    * the catalog face's baseline visible. `utm_*` admits underscores
    * and digits in the key tail: the real GA4 vocabulary includes
    * utm_source_platform / utm_creative_format / utm_marketing_tactic,
    * and a `[a-z]+`-only tail would leak those into the canonical
    * string — identical pages fetched with and without the tracker
    * would then canonicalize apart and the dedup would miss them.
    * Case-insensitive and `=`-optional (r19 review): mailers/ESPs
    * emit UPPERCASE UTM keys, and a bare `?utm_source` (no value)
    * is a legal query param — both previously survived the strip
    * and defeated the dedup. `(?i)` and the `(=|$)` tail parse
    * identically in Java regex and DuckDB's RE2, so the oracle twin
    * keeps the same spelling. */
  val TrackingParamRe = "(?i)^(utm_[a-z0-9_]+|fbclid|gclid)(=|$)"

  /** Everything after the FIRST occurrence of `delim`, or '' when the
    * delimiter is absent — the split_part(col, delim, 2)-compatible
    * behavior for a 1-field string, except it keeps LATER duplicate
    * delimiters inside the remainder (split_part would truncate). */
  private def afterFirst(c: Column, delim: String): Column =
    when(c.isNull, lit(null).cast("string"))
      .when(c.contains(delim),
        c.substr(instr(c, delim) + lit(delim.length), length(c)))
      .otherwise("")

  /** Host (lowercased, the scheme's own default port stripped) of a
    * URL column — the per-domain grouping key `dd_url_dedup` reports
    * on. The authority is whatever sits between the FIRST `://` and
    * the next `/` (or `?`, already cut by the caller-side base
    * split). Port stripping is SCHEME-AWARE: `:80` is only a default
    * for http and `:443` only for https — `http://host:443/x` names a
    * genuinely different resource than `http://host/x` and must NOT
    * collapse into it (r12 advice); any other scheme keeps its port
    * untouched. */
  def domainOf(url: Column): Column = {
    val base = substring_index(substring_index(url, "#", 1), "?", 1)
    val scheme = lower(substring_index(base, "://", 1))
    val host = lower(substring_index(afterFirst(base, "://"), "/", 1))
    when(scheme === "http", regexp_replace(host, "(:80)+$", ""))
      .when(scheme === "https", regexp_replace(host, "(:443)+$", ""))
      .otherwise(host)
  }

  /** The canonical form of a URL column (see object doc for the
    * rule). Input is expected to be `scheme://host[:port][/path]
    * [?query][#fragment]`-shaped; anything else passes through the
    * same string ops deterministically (no `://` → empty host, the
    * split_part convention the oracle shares). */
  def canonicalize(url: Column): Column = {
    val nofrag = substring_index(url, "#", 1)
    val base = substring_index(nofrag, "?", 1)
    val q = afterFirst(nofrag, "?")
    val scheme = lower(substring_index(base, "://", 1))
    val cleanHost = domainOf(url)
    // afterFirst is already '' when '://' is absent, so no guard —
    // the exact unguarded shape the DuckDB oracle replays
    val rawPath = regexp_replace(afterFirst(base, "://"), "^[^/]*", "")
    val cleanPath = regexp_replace(rawPath, "/+$", "")
    // array_join(filter(...)) keeps surviving params in input order
    val kept = array_join(
      filter(split(q, "&"), p =>
        p =!= "" && !p.rlike(TrackingParamRe)), "&")
    concat(scheme, lit("://"), cleanHost, cleanPath,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(""))
  }

  /** Every dot-suffix of a hostname, longest first — the join key
    * set for suffix-rule blocklists (`ta_domain_filter`):
    * `a.b.example.net` → [`a.b.example.net`, `b.example.net`,
    * `example.net`, `net`]. A blocklist entry matches a host iff it
    * equals one of these suffixes — the registrable-domain
    * convention (never a substring match, so `notexample.net` does
    * NOT match `example.net`). Bounded by the label count (≤127 per
    * RFC 1035), so exploding it is a constant-factor fan-out; a
    * million-entry blocklist then joins on the exploded key instead
    * of scanning patterns per row. */
  def domainSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }
}
