package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, the latest right row with
  * `right.ts <= left.ts` and equal keys. Spark lacks this operator; rather
  * than a nested-loop or correlated subquery (quadratic / driver-bound), we
  * use the union-then-window formulation:
  *
  *   1. tag both sides, union them (narrow);
  *   2. one shuffle+sort per key on (ts, side) — right rows sort BEFORE
  *      left rows at equal ts so `<=` semantics hold;
  *   3. running `last(right_payload, ignoreNulls)` over the per-key order
  *      gives every left row its as-of match in a single pass.
  *
  * Cost at scale: exactly one shuffle of |L|+|R| rows, no join explosion,
  * skew handled by AQE. This is the standard log-merge technique (cf. the
  * KDB/pandas `merge_asof` semantics) expressed in Catalyst built-ins, so
  * the whole plan stays codegen'd.
  */
object AsOfJoin {

  /** @param left          left (probe) rows
    * @param right         right (quote/state) rows
    * @param keys          equi-key column names present on both sides
    * @param leftTs        left event-time column name
    * @param rightTs       right event-time column name
    * @param rightCols     right payload columns to carry; emitted as
    *                      `asof_<name>` (null when no match)
    * @param rightTiebreak optional right column making the per-key order
    *                      total: among right rows with equal (keys, ts) the
    *                      HIGHEST tiebreak value wins. Without it, equal-ts
    *                      right duplicates yield a nondeterministic payload.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               rightTiebreak: Option[String] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val internal = Seq("_ts", "_side", "_tb", "_payload", "_asof")
    val clash = (lCols ++ right.columns).distinct.filter(internal.contains)
    require(clash.isEmpty,
      s"AsOfJoin reserves column names ${internal.mkString(", ")}; rename: ${clash.mkString(", ")}")
    val payload = struct(rightCols.map(col): _*)

    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side"),
        rightTiebreak.map(col).getOrElse(lit(0)).as("_tb"),
        payload.as("_payload")) ++ lCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(r.schema("_tb").dataType).as("_tb"), // value irrelevant: left payloads are null
        lit(null).cast(r.schema("_payload").dataType).as("_payload")) ++
        lCols.filterNot(keys.contains).map(col): _*)

    // right rows (_side 0) sort before left at equal ts, so `<=` holds; the
    // tiebreak orders equal-ts right rows so `last` is deterministic
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lCols.map(col) ++ rightCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
