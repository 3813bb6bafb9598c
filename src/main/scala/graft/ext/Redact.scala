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
}
