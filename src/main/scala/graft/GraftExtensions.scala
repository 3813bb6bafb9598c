package graft

import graft.functions.{MinHashSigs, TextKernels, VecOps}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL surface for the engine's custom kernels. Register with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`), then:
  *
  * {{{
  *   SELECT dot_f(a.embedding, b.embedding)            -- codegen'd double dot
  *   SELECT simhash60(token_hashes60(text))            -- SimHash sketch
  *   SELECT minhash_sigs(word_ngrams(text, 3), 16)     -- MinHash signatures
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_f"),
      info("dot_f", "dot_f(a, b) - double dot product of two float arrays"),
      (args: Seq[Expression]) => VecOps.DotProductFloat(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(hashes) - 60-bit SimHash bit-vote over token hashes"),
      (args: Seq[Expression]) => VecOps.SimHash60(args.head)))
    ext.injectFunction((FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(grams, k) - k seeded 60-bit minhash signatures"),
      (args: Seq[Expression]) => MinHashSigs(args(0), intArg(args(1), "numHashes"))))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, n) - distinct space-joined word n-grams"),
      (args: Seq[Expression]) => TextKernels.WordNgramsKernel(args(0), intArg(args(1), "n"))))
    ext.injectFunction((FunctionIdentifier("token_hashes60"),
      info("token_hashes60", "token_hashes60(text) - 60-bit md5 hash per token"),
      (args: Seq[Expression]) => TextKernels.TokenHashes60(args.head)))
    ext.injectFunction((FunctionIdentifier("sign_bands"),
      info("sign_bands", "sign_bands(embedding, nBits, bandBits, dim) - LSH band values from md5-derived hyperplanes"),
      (args: Seq[Expression]) => VecOps.SignBandsExpr(args(0),
        intArg(args(1), "nBits"), intArg(args(2), "bandBits"), intArg(args(3), "dim"))))
    ext.injectFunction((FunctionIdentifier("quantize_int8"),
      info("quantize_int8", "quantize_int8(embedding) - struct(scale, q, q_sum, q_min, q_max) in one pass"),
      (args: Seq[Expression]) => VecOps.QuantizeInt8(args.head)))
    ext.injectFunction((FunctionIdentifier("term_freqs"),
      info("term_freqs", "term_freqs(text, terms...) - [tf per term, doclen] in one tokenize pass"),
      (args: Seq[Expression]) => TextKernels.TermFreqsKernel(args.head,
        args.tail.map { case Literal(s, _) => s.toString
                        case other => throw new IllegalArgumentException(s"term must be a literal, got $other") })))
    ext.injectFunction((FunctionIdentifier("phrase_freqs"),
      info("phrase_freqs", "phrase_freqs(text, words...) - [overlapping phrase freq, doclen]"),
      (args: Seq[Expression]) => TextKernels.PhraseFreqKernel(args.head,
        args.tail.map { case Literal(s, _) => s.toString.toLowerCase
                        case other => throw new IllegalArgumentException(s"word must be a literal, got $other") })))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats", "repetition_stats(text) - [n_tokens, n_distinct, n_2grams, n_distinct_2grams, top_token_count]"),
      (args: Seq[Expression]) => TextKernels.RepetitionStatsKernel(args.head)))
  }
}
