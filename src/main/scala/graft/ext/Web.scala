package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup for web-scraped corpora — the
  * normalization CCNet / RefinedWeb-style pipelines run BEFORE content
  * dedup (a huge fraction of web duplicates are the same page re-crawled
  * under a cosmetically different URL: scheme, www, tracking params,
  * trailing slash, host case).
  *
  * Scale shape: [[canonicalizeUrl]] is a narrow chain of anchored
  * regex/string kernels (codegen'd, no shuffle); [[dedupByUrl]] is ONE
  * hash aggregation on the canonical key — the exact-dedup (c01) plan
  * shape, map-side partials absorbing per-URL skew. Nothing here is
  * pairwise, so the pass costs the same as any columnar scan at 100 TB.
  */
object Web {

  /** Canonical form for dedup: scheme dropped, host lowercased, a leading
    * "www." dropped, a tracking-ONLY query string (utm_*, fbclid, gclid)
    * dropped, a trailing slash dropped. A query string with any
    * non-tracking param is KEPT — over-normalizing merges genuinely
    * different pages, the opposite failure mode. Every regex is anchored,
    * so first-match (DuckDB) and all-match (Spark) replace semantics
    * agree — the oracle twin mirrors the chain textually. */
  def canonicalizeUrl(url: Column): Column = {
    val noScheme = regexp_replace(url, "^https?://", "")
    val host = regexp_extract(noScheme, "^[^/?]+", 0)
    val lowered = concat(lower(host), noScheme.substr(length(host) + lit(1), length(noScheme)))
    val noWww = regexp_replace(lowered, "^www\\.", "")
    val noTrack = regexp_replace(noWww,
      "\\?(?:utm_[a-z]+|fbclid|gclid)=[^&]*(?:&(?:utm_[a-z]+|fbclid|gclid)=[^&]*)*$", "")
    regexp_replace(noTrack, "/$", "")
  }

  /** The host of an already-canonical URL (no scheme). */
  def host(canonical: Column): Column = regexp_extract(canonical, "^[^/?]+", 0)

  /** URL-level dedup: one keeper (min id) per canonical URL, with the
    * canonical form, its host, and how many raw URLs collapsed into it. */
  def dedupByUrl(docs: DataFrame, id: Column, url: Column): DataFrame =
    docs.withColumn("url_canon", canonicalizeUrl(url))
      .groupBy("url_canon")
      .agg(min(id).as("doc_id"), count(lit(1)).as("dup_count"))
      .select(col("doc_id"), col("url_canon"),
        host(col("url_canon")).as("host"), col("dup_count"))
}
