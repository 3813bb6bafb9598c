package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the sanctioned
  * conversion lives in `classic.ExpressionUtils`, which is `private[sql]`.
  * This bridge re-exports the two conversions for the engine's custom
  * Catalyst expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

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
