package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One corpus entry: the Spark query plus its DuckDB oracle twin (None →
    * the driver records a weaker rows-only check). Column names/ordering in
    * `run` and `oracle` must match exactly (driver hashes sorted columns). */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])
}
