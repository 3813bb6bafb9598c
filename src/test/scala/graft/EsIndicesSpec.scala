package graft

import graft.dsl.EsIndices
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EsIndicesSpec extends AnyFunSuite with SparkTestBase {

  private def frame(tag: Int, extra: Boolean = false) = {
    val sp = spark
    import sp.implicits._
    val base = Seq((tag * 10 + 1).toLong, (tag * 10 + 2).toLong).toDF("doc_id")
    if (extra) base.withColumn("note", lit(s"n$tag")) else base
  }

  private val registry = Map(
    "logs-2024-01" -> frame(1), "logs-2024-02" -> frame(2),
    "logs-2024-11" -> frame(3), "metrics-2024-01" -> frame(4, extra = true))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def indices(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("_index").distinct().collect().map(_.getString(0)).toSet

  test("wildcards, ?, comma lists, exclusion, _all resolve like ES") {
    assert(indices(EsIndices.resolve(registry, "logs-*")) ==
      Set("logs-2024-01", "logs-2024-02", "logs-2024-11"))
    // ? is a single character
    assert(indices(EsIndices.resolve(registry, "logs-2024-0?")) ==
      Set("logs-2024-01", "logs-2024-02"))
    assert(indices(EsIndices.resolve(registry, "logs-2024-01,metrics-2024-01")) ==
      Set("logs-2024-01", "metrics-2024-01"))
    assert(indices(EsIndices.resolve(registry, "logs-*,-logs-2024-1*")) ==
      Set("logs-2024-01", "logs-2024-02"))
    assert(indices(EsIndices.resolve(registry, "_all")) == registry.keySet)
    // a leading -pattern with nothing selected is a concrete miss (ES:
    // exclusions apply to previously selected names only)
    intercept[IllegalArgumentException] { EsIndices.resolve(registry, "-logs-*") }
    assert(ids(EsIndices.resolve(registry, "logs-2024-0*")) == Set(11L, 12L, 21L, 22L))
  }

  test("missing concrete name throws; ignore_unavailable and allow_no_indices gate it") {
    val e = intercept[IllegalArgumentException] {
      EsIndices.resolve(registry, "logs-2024-01,nope")
    }
    assert(e.getMessage.contains("no such index [nope]"))
    assert(indices(EsIndices.resolve(registry, "logs-2024-01,nope",
      ignoreUnavailable = true)) == Set("logs-2024-01"))
    // a wildcard matching nothing is fine by default (empty frame, schema kept)
    val empty = EsIndices.resolve(registry, "gone-*")
    assert(empty.count() == 0 && empty.columns.contains("_index"))
    intercept[IllegalArgumentException] {
      EsIndices.resolve(registry, "gone-*", allowNoIndices = false)
    }
  }

  test("heterogeneous mappings null-fill; _index term predicate prunes members") {
    val u = EsIndices.resolve(registry, "logs-2024-01,metrics-2024-01")
    assert(u.columns.toSet == Set("doc_id", "note", "_index"))
    val notes = u.select("_index", "note").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(notes == Set(("logs-2024-01", None), ("metrics-2024-01", Some("n4"))))
    // the _index literal tag folds: a term filter on it empties the
    // non-matching members at plan time (no scan-side work for them)
    val pruned = graft.dsl.EsQueryJson.search(u,
      """{"query": {"term": {"_index": "metrics-2024-01"}}, "sort": ["doc_id"], "size": 10}""")
    assert(ids(pruned) == Set(41L, 42L))
  }
}
