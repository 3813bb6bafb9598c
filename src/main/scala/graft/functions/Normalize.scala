package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a codegen'd expression — the
  * pre-tokenization step a web corpus needs before ANY hash-based
  * operator: the same visible text arrives both composed ("é") and
  * decomposed ("e" + U+0301) from different sources, and without
  * canonicalization every downstream fingerprint/dedup/term hash treats
  * them as distinct documents and distinct terms.
  *
  * `java.text.Normalizer` implements the Unicode standard's canonical
  * composition; DuckDB's `nfc_normalize` (utf8proc) implements the same
  * standard, so oracles compare byte-for-byte — both engines hash the
  * identical UTF-8 after normalization. Complements
  * [[graft.ext.Corpus]]'s typography mapping (c62), which handles
  * compatibility LOOKALIKES (curly quotes, dashes) that NFC deliberately
  * preserves.
  *
  * Scale shape: per-row, narrow, codegens to one static call — stays
  * inside whole-stage codegen like [[EditDistance]].
  */
object Normalize {

  /** Static entry point for generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost all
    // real text is already NFC — skip the allocation-heavy normalize call
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(in: Any): Any =
      nfc(in.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Normalize.nfc($c)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def nfcNormalize(c: Column): Column = column(NfcNormalize(expression(c)))
}
