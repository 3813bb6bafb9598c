package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.storage.StorageLevel

/** Spark 4 removed the public `new Column(expr)` constructor; the sanctioned
  * conversion lives in `classic.ExpressionUtils`, which is `private[sql]`.
  * This bridge re-exports the two conversions for the engine's custom
  * Catalyst expressions. */
/** Analysis-time input contracts for the engine's custom kernels.
  * `AbstractDataType` is `private[sql]` at the Scala level, so the traits
  * naming it live here in the sql namespace; kernels mix them in to get
  * Catalyst's DATATYPE_MISMATCH at analysis instead of a runtime
  * ClassCastException when a wrongly-typed column reaches nullSafeEval. */
trait StringInput extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
}

trait IntArrayInput extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType))
}

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Materialize `df` into a persisted internal-row RDD and rebuild a fresh
    * DataFrame over it. Unlike `persist()` (which caches DATA but keeps the
    * full logical plan) this truncates BOTH plan and RDD lineage to O(1) —
    * an iterative self-join loop otherwise doubles its plan every round
    * (2^rounds nodes; even the explain string OOMs past ~10 rounds).
    * Returns the RDD handle so the caller can `unpersist()` the previous
    * round once the next one is materialized. Eager: the returned frame is
    * already computed. */
  def truncateLineage(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val rdd = cdf.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // materialize now so the source plan can be freed
    (cdf.sparkSession.internalCreateDataFrame(rdd, cdf.schema), rdd)
  }

  /** Apply a SparkSessionExtensions function-injector to an EXISTING
    * session's registry (extensions normally only take effect at session
    * construction). */
  def registerInto(f: org.apache.spark.sql.SparkSessionExtensions => Unit,
                   registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit = {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    f(e)
    e.registerFunctions(registry)
  }
}
