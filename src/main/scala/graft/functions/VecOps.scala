package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Codegen'd kernels for the hot array math. Spark's higher-order functions
  * (`zip_with`/`aggregate`/`transform`) have no `doGenCode` — they evaluate
  * interpreted, one boxed lambda call per element, which dominates the
  * pairwise similarity and sketch pipelines. These expressions compile to a
  * tight primitive loop inside WholeStageCodegen.
  *
  * Numerics are kept IDENTICAL to the HOF formulations they replace (and to
  * the DuckDB oracle): float elements widened to double, accumulated in
  * element order.
  */
object VecOps {

  /** Σ a[i]·b[i] in double, element order. Null if either side is null. */
  case class DotProductFloat(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0; var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** 60-bit SimHash bit-vote over an array of (60-bit) token hashes with
    * multiplicity: bit j of the result is set iff
    * Σ_tokens (bit j set ? +1 : −1) > 0. */
  case class SimHash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(in: Any): Any = {
      val hs = in.asInstanceOf[ArrayData]
      val votes = new Array[Int](60)
      var i = 0
      while (i < hs.numElements()) {
        val h = hs.getLong(i); var j = 0
        while (j < 60) { if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1; j += 1 }
        i += 1
      }
      var out = 0L; var j = 0
      while (j < 60) { if (votes(j) > 0) out |= (1L << j); j += 1 }
      out
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val votes = ctx.freshName("votes"); val i = ctx.freshName("i")
        val j = ctx.freshName("j"); val h = ctx.freshName("h"); val out = ctx.freshName("out")
        s"""
           |int[] $votes = new int[60];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  long $h = $a.getLong($i);
           |  for (int $j = 0; $j < 60; $j++) {
           |    if ((($h >> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
           |  }
           |}
           |long $out = 0L;
           |for (int $j = 0; $j < 60; $j++) { if ($votes[$j] > 0) $out |= (1L << $j); }
           |${ev.value} = $out;
           |""".stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def dotF(a: Column, b: Column): Column = column(DotProductFloat(expression(a), expression(b)))
  def simhash60(hashes: Column): Column = column(SimHash60(expression(hashes)))
}
