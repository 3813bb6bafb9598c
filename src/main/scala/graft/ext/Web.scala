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

  /** PAGERANK over a link graph — the page-authority quality signal
    * web-corpus pipelines rank crawls by (Common Crawl publishes exactly
    * this family of host-level ranks). Simplified standard variant:
    * rank⁰ = 1/N; rankᵏ⁺¹ = (1−d)/N + d·Σ_incoming rankᵏ/outdeg;
    * dangling mass is dropped (documented). Cross-engine float
    * determinism: every rank RE-ROUNDS to 6 dp per iteration (the
    * k-means resync convention) and each node's incoming contributions
    * fold in ASCENDING-source order via a sorted in-row fold (the a118
    * sorted-sum trick) — so both engines add the same doubles in the
    * same order.
    *
    * Scale shape per iteration: one join of ranks onto edges (ranks are
    * node-sized; edges co-partition by src) + one (dst) hash agg whose
    * per-dst fold runs over the collected in-edge list (bounded by
    * in-degree; a mega-in-degree node would move to a pre-agg — the
    * documented skew path). Nodes/edges never leave the cluster. */
  def pageRank(edges: DataFrame, nNodes: Long, iters: Int,
               damping: Double = 0.85): DataFrame = {
    val out = edges.groupBy(col("src")).agg(count(lit(1)).as("_outdeg"))
    val e = edges.join(out, "src")
    var ranks: DataFrame = e.sparkSession.range(nNodes)
      .select(col("id").as("node"), round(lit(1.0 / nNodes), 6).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), col("src"), (col("rank") / col("_outdeg")).as("c"))
      val summed = contribs.groupBy(col("dst"))
        .agg(aggregate(
          array_sort(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("_in"))
      ranks = ranks.select(col("node")).join(summed, ranks("node") === summed("dst"), "left")
        .select(col("node"),
          round(lit((1 - damping) / nNodes) + lit(damping) * coalesce(col("_in"), lit(0.0)), 6)
            .as("rank"))
    }
    ranks
  }
}
