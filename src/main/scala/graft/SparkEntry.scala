package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 has a `queries` entry here and (when
  * SQL-expressible) a DuckDB `oracleSql` twin with IDENTICAL column names
  * and ordering. Map-typed outputs are exploded to rows (parquet maps don't
  * hash stably across engines).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: lineitem⋈orders⋈customer⋈nation with the small
    * dimension broadcast. */
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
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Tier A: reference-parity CDC semantics over the events change-log
    "a05_flatten" -> ((s, d) => TierA.flatten(s, d)),
    "a13_merge" -> ((s, d) => TierA.mergeFold(s, d)),
    "a08_deleted_keys" -> ((s, d) => TierA.deletedKeys(s, d)),
    "a13_merge_incremental" -> ((s, d) => TierA.mergeIncremental(s, d)),
    // ---- Tier B
    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
  )

  /** The change-log mapping shared by every Tier-A oracle (mirrors
    * [[ChangeLog.fromEvents]] exactly; ts is strictly monotone in event_id
    * in the driver data, so ordering by seq == ordering by (ts, seq)). */
  private val chCte =
    """WITH ch AS (
      |  SELECT CAST(user_id AS VARCHAR) AS id,
      |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |         event_id AS seq, event_type, value, props
      |  FROM events
      |), dmax AS (
      |  SELECT id, max(CASE WHEN op = 'D' THEN seq END) AS dseq FROM ch GROUP BY id
      |), u AS (
      |  SELECT ch.* FROM ch JOIN dmax USING (id)
      |  WHERE op = 'U' AND (dseq IS NULL OR seq > dseq)
      |), cells AS (
      |  SELECT id, 'etype' AS qualifier, event_type AS value, seq FROM u
      |  UNION ALL SELECT id, 'val', printf('%.2f', value), seq FROM u
      |  UNION ALL SELECT id, 'k', json_extract_string(props, '$.k'), seq FROM u
      |)""".stripMargin

  private val mergeOracle = chCte +
    """
      |SELECT id, qualifier, arg_max(value, seq) AS value
      |FROM cells GROUP BY id, qualifier ORDER BY id, qualifier""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "a05_flatten" ->
      """WITH u AS (
        |  SELECT CAST(user_id AS VARCHAR) AS id, event_id AS seq, event_type, value, props
        |  FROM events WHERE event_type <> 'error'
        |)
        |SELECT id, seq, qualifier, value FROM (
        |  SELECT id, seq, 'etype' AS qualifier, event_type AS value FROM u
        |  UNION ALL SELECT id, seq, 'val', printf('%.2f', value) FROM u
        |  UNION ALL SELECT id, seq, 'k', json_extract_string(props, '$.k') FROM u
        |) ORDER BY seq, qualifier""".stripMargin,
    "a13_merge" -> mergeOracle,
    "a13_merge_incremental" -> mergeOracle,
    "a08_deleted_keys" ->
      """WITH ch AS (
        |  SELECT CAST(user_id AS VARCHAR) AS id,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         event_id AS seq
        |  FROM events
        |)
        |SELECT id FROM ch GROUP BY id
        |HAVING max(CASE WHEN op = 'D' THEN seq END) IS NOT NULL
        |   AND (max(CASE WHEN op = 'U' THEN seq END) IS NULL
        |        OR max(CASE WHEN op = 'U' THEN seq END) < max(CASE WHEN op = 'D' THEN seq END))
        |ORDER BY id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
