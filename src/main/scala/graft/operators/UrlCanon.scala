package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical-URL normalization — the library-facing kernel behind
  * `dd_url_dedup` (the crawl pipeline's cheapest pre-content-dedup
  * pass), factored so any pipeline column can be canonicalized with
  * the exact rule the catalog face certifies against DuckDB.
  *
  * The rule, stated once: lowercase the scheme and host; strip a
  * default port (`:80`/`:443`), the `#fragment`, and tracking params
  * (`utm_*`, `fbclid`, `gclid` — all other params survive in their
  * original order); drop ONE trailing slash from the path. Pure
  * built-in expressions — narrow, codegen'd, no UDF — so the
  * normalization runs inside whole-stage codegen and any SQL engine
  * replays it with string functions.
  *
  * Idempotent by construction (canonicalize ∘ canonicalize =
  * canonicalize — every rule's output is a fixed point of that rule;
  * PropertySpec pins it on adversarial variants), which is what lets
  * incremental crawls canonicalize re-crawled URLs without tracking
  * whether a string was already normalized. */
object UrlCanon {

  /** Tracking-parameter pattern — a query-string `k=v` pair whose key
    * matches is dropped. Public, so callers extending the list keep
    * the catalog face's baseline visible. */
  val TrackingParamRe = "^(utm_[a-z]+|fbclid|gclid)="

  /** Host (lowercased, default port stripped) of a URL column —
    * the per-domain grouping key `dd_url_dedup` reports on. */
  def domainOf(url: Column): Column = {
    val base = substring_index(substring_index(url, "#", 1), "?", 1)
    regexp_replace(
      lower(substring_index(substring_index(base, "://", -1), "/", 1)),
      ":(443|80)$", "")
  }

  /** The canonical form of a URL column (see object doc for the
    * rule). Input is expected to be `scheme://host[:port][/path]
    * [?query][#fragment]`-shaped; anything else passes through the
    * same string ops deterministically. */
  def canonicalize(url: Column): Column = {
    val nofrag = substring_index(url, "#", 1)
    val base = substring_index(nofrag, "?", 1)
    val q = when(nofrag.contains("?"), substring_index(nofrag, "?", -1))
      .otherwise("")
    val scheme = lower(substring_index(base, "://", 1))
    val cleanHost = domainOf(url)
    val cleanPath = regexp_replace(
      regexp_replace(base, "^[a-zA-Z]+://[^/]*", ""), "/$", "")
    // array_join(filter(...)) keeps surviving params in input order
    val kept = array_join(
      filter(split(q, "&"), p =>
        p =!= "" && !p.rlike(TrackingParamRe)), "&")
    concat(scheme, lit("://"), cleanHost, cleanPath,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(""))
  }
}
