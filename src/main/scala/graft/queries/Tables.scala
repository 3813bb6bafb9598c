package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver test tables (TESTDATA.md). Parquet scans get
  * Catalyst's predicate pushdown / column pruning for free — every query in
  * this package selects only the columns it needs so ReadSchema stays
  * minimal at 100 TB. */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as a long we truncate
    * to a microsecond timestamp (`ts div 1000`) — exactly DuckDB's ns→µs
    * truncation, so oracle SQL on `ts` agrees. */
  def events(s: SparkSession, d: String): DataFrame = {
    // defensive: the corpus must work from any session, not just our mains
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
