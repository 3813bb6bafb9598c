package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for a training-data pipeline: regex-detect and mask
  * emails / IPv4 addresses / phone-shaped numbers, keeping per-doc match
  * counts (the audit signal pipelines track per source).
  *
  * Everything is per-row regexp work inside codegen — fully narrow, no
  * shuffle, pushdown-unaffected. The patterns use only the regex subset
  * with identical semantics in Java (`java.util.regex`) and RE2
  * (DuckDB) — char classes, bounded repetition, `\b`, `\d` — so the
  * DuckDB oracle reproduces the masked text byte-for-byte.
  */
object Redact {

  /** (pattern, replacement-tag) in application order. Order matters:
    * emails first (an email's domain would otherwise partially match
    * nothing here, but keeping a fixed order makes the composition
    * deterministic and documentable). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b555-\\d{4}\\b" -> "<PHONE>")

  /** `(doc_id, redacted, n_email, n_ip, n_phone)` — masked text plus
    * per-category counts (counted on the ORIGINAL text, before masking,
    * so categories don't shadow each other). */
  def redactPii(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val counts = Seq("n_email", "n_ip", "n_phone").zip(piiPatterns).map {
      case (nm, (pat, _)) => regexp_count(text, lit(pat)).as(nm)
    }
    val masked = piiPatterns.foldLeft(text) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }
    df.select(idCol.as("doc_id") +: masked.as("redacted") +: counts: _*)
  }

  /** Luhn checksum over a digit string (the payment-card check): sum
    * digits right-to-left, doubling every second one (subtracting 9 when
    * the double exceeds 9); valid iff ≡ 0 (mod 10). Bounded in-row HOF
    * arithmetic over ≤ 19 digits — stays in codegen. */
  def luhnValid(digits: Column): Column = {
    val s = aggregate(sequence(lit(1), length(digits)), lit(0), (acc, i) => {
      val d = ascii(substring(reverse(digits), i, lit(1))) - 48
      val dd = when(pmod(i, lit(2)) === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      acc + dd
    })
    pmod(s, lit(10)) === 0
  }

  /** Checksum-GATED card redaction — what separates a production PII
    * scrubber from plain regex: 13–19 digit runs are only masked when
    * they pass the Luhn check (a random digit run false-positives the
    * regex ~10% of the time; Luhn filters the other 90%). Emits the
    * audit counts (candidates seen, candidates valid) plus the text with
    * VALID runs masked and invalid runs left untouched. Fully narrow:
    * candidate extraction is one regexp pass, the Luhn fold and the
    * conditional masking are bounded in-row HOFs over the per-doc
    * candidate list. */
  def luhnRedact(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    df.select(idCol.as("doc_id"), text.as("_t"))
      .withColumn("_c", expr("regexp_extract_all(_t, '\\\\b\\\\d{13,19}\\\\b', 0)"))
      .withColumn("_v", filter(col("_c"), c => luhnValid(c)))
      .select(col("doc_id"),
        size(col("_c")).as("n_candidates"),
        size(col("_v")).as("n_valid"),
        // boundary-anchored per-candidate mask: a raw substring replace
        // would also rewrite the same 13-19 digits INSIDE a longer
        // (>19-digit, hence never-extracted) run; \b re-asserts exactly
        // what the extractor matched (candidates are all-digit, so no
        // regex metacharacter escaping is needed)
        aggregate(col("_v"), col("_t"),
          (acc, c) => regexp_replace(acc,
            concat(lit("\\b"), c, lit("\\b")), lit("<CARD>"))).as("redacted"))
  }
}
