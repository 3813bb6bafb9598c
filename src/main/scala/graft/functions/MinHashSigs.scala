package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** All `numHashes` minhash signature values in one pass over the shingle
  * array: sig[i] = min over grams of md5("i:" + gram) taken as the first 15
  * hex chars (60 bits). Bit-identical to the HOF formulation
  * `array_min(transform(grams, g -> conv(substring(md5(concat(i,':',g)),1,15),16,10)))`
  * and to the DuckDB oracle `min(CAST('0x'||substr(md5(i||':'||g),1,15) AS BIGINT))`
  * — but one JVM call per row instead of |grams|×numHashes interpreted
  * lambda evaluations. CodegenFallback is fine: the loop body IS the work.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // ThreadLocal like TextKernels.mdLocal: a plain lazy val would be shared
  // if the same expression instance is ever evaluated from two tasks
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i:".getBytes(StandardCharsets.UTF_8))

  private def hash60(prefix: Array[Byte], gram: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(prefix)
    md.update(gram)
    val d = md.digest()
    // first 15 hex chars == top 60 bits of the first 8 bytes (big-endian)
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  override def nullSafeEval(in: Any): Any = {
    val grams = in.asInstanceOf[ArrayData]
    val out = Array.fill(numHashes)(Long.MaxValue)
    var g = 0
    while (g < grams.numElements()) {
      val bytes = grams.getUTF8String(g).getBytes
      var i = 0
      while (i < numHashes) {
        val h = hash60(prefixes(i), bytes)
        if (h < out(i)) out(i) = h
        i += 1
      }
      g += 1
    }
    if (grams.numElements() == 0) null else new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSigs {
  def apply(grams: Column, numHashes: Int): Column =
    column(new MinHashSigs(expression(grams), numHashes))
}
