package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic hashing for the dedup/sketch operators.
  *
  * Spark's native `xxhash64`/`hash` have no DuckDB twin, so every hash the
  * oracle must reproduce is derived from md5 (identical bytes everywhere):
  * the first 15 hex chars (60 bits) parsed as a non-negative long.
  * DuckDB twin: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * Codegen note: md5+conv are both codegen'd Catalyst expressions, so
  * shingle hashing stays inside WholeStageCodegen; at 100 TB the cost is
  * linear scan work, no shuffle.
  */
object Hashing {
  /** 60-bit hash of a string column. */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member i (minhash). */
  def seeded(i: Int, c: Column): Column =
    md5Long60(concat(lit(s"$i:"), c))

  /** JVM-side md5-60 (same value as [[md5Long60]]) — for fixture
    * generators that synthesize payloads in plain Scala loops. */
  def md5Long60Jvm(s: String): Long = TextKernels.md5Hash60(s)

  /** DuckDB SQL twin builders (used by the oracle strings). */
  def sqlMd5Long60(x: String): String = s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"
  def sqlSeeded(i: Int, x: String): String = sqlMd5Long60(s"'$i:' || $x")
}
