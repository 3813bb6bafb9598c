package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session tuning so Verify/Bench/tests agree.
  *
  * Scale notes: shuffle partitions sized to the local core count (the
  * cluster deployment would size to ~2-3× total cores); AQE on for runtime
  * coalescing + skew-join splitting; nanosAsLong because the driver's
  * `events` parquet carries TIMESTAMP(NANOS) which vanilla Spark refuses —
  * [[queries.Tables.events]] converts back to a microsecond timestamp. */
object Sessions {
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
