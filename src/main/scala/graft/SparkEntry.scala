package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 has a `queries` entry (declared in the
  * `graft.queries.Tier*` corpora) and, when SQL-expressible, a DuckDB
  * `oracleSql` twin with IDENTICAL column names and ordering. Map-typed
  * outputs are exploded to rows (parquet maps don't hash stably across
  * engines).
  */
object SparkEntry {

  private def corpus: Seq[Q] = TierA.all ++ TierB.all ++ TierC.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: lineitem⋈orders⋈customer⋈nation with the small
    * dimensions broadcast. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, d).select("n_nationkey", "n_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    corpus.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    corpus.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
