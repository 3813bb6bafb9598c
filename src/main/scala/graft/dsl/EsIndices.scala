package graft.dsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ES index-expression resolution (`GET logs-*,metrics-2024-?1,-logs-old/
  * _search`) over a registry of named frames — the multi-index layer the
  * `_index`-tagged frames ([[EsQueryJson]] `indices_boost`, `_msearch`)
  * consume. A registry entry is any DataFrame: a materialized index, a
  * [[EsQueryJson.filteredAlias]] view (aliases are just names for views,
  * exactly ES's model), or a day-partitioned slice of one physical table.
  *
  * Grammar (ES 6.5 `IndexNameExpressionResolver`): comma-separated items,
  * left to right; `*`/`?` wildcards expand against the registry in
  * lexicographic order; `-pattern` removes previously-selected names (only
  * meaningful after an inclusion); `_all` selects everything. A CONCRETE
  * missing name throws (ES's IndexNotFoundException) unless
  * `ignoreUnavailable`; a wildcard matching nothing is fine unless
  * `allowNoIndices = false` — ES's own defaults.
  *
  * The result is ONE union frame, rows tagged `_index`, missing columns
  * null-filled (ES fills unmapped fields per index the same way). Search
  * semantics over the union follow ES: term statistics (BM25 df/avgdl)
  * come from the COMBINED corpus — when the indices partition a corpus
  * the scores equal the single-table scores, pinned by the a179/a255
  * corpus rows. Scale: the union is a plan-level concat — per-index
  * filters and column pruning push into each member scan, and a
  * `term`-on-`_index` predicate prunes whole members at plan time
  * (partition pruning's moral equivalent). */
object EsIndices {

  def resolve(registry: Map[String, DataFrame], expression: String,
              ignoreUnavailable: Boolean = false,
              allowNoIndices: Boolean = true): DataFrame = {
    require(registry.nonEmpty, "empty index registry")
    val names = registry.keys.toSeq.sorted
    val items = expression.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(items.nonEmpty, s"empty index expression: '$expression'")
    val selected = scala.collection.mutable.LinkedHashSet.empty[String]
    items.foreach {
      case "_all" => selected ++= names
      case item if item.startsWith("-") =>
        // an exclusion applies to previously-selected names; with nothing
        // selected ES treats the item as a concrete (missing) index name
        if (selected.nonEmpty) {
          val re = wildcardRe(item.stripPrefix("-"))
          selected.filterInPlace(n => !re.matches(n))
        } else if (!ignoreUnavailable)
          throw new IllegalArgumentException(s"no such index [$item]")
      case item if item.contains("*") || item.contains("?") =>
        selected ++= names.filter(wildcardRe(item).matches)
      case concrete =>
        if (registry.contains(concrete)) selected += concrete
        else if (!ignoreUnavailable) throw new IllegalArgumentException(
          s"no such index [$concrete]")
    }
    if (selected.isEmpty) {
      if (!allowNoIndices) throw new IllegalArgumentException(
        s"no indices match '$expression' (allow_no_indices=false)")
      // ES returns an empty result; shape it like the first registry frame
      val proto = registry(names.head)
      return proto.limit(0).withColumn("_index", lit(null).cast("string"))
    }
    selected.toSeq
      .map(n => registry(n).withColumn("_index", lit(n)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def wildcardRe(pattern: String): scala.util.matching.Regex = {
    require(pattern.nonEmpty, "empty index pattern")
    pattern.map {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    }.mkString.r
  }
}
