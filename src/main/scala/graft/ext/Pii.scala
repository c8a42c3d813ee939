package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the privacy pass of a training-data
  * pipeline (C4-style regex scrubbing: emails, IPs, SSNs, phone
  * numbers are replaced with typed placeholder tokens before the text
  * reaches a training corpus).
  *
  * All pure `Column` expressions over codegen'd `regexp_*` functions —
  * narrow, shuffle-free, runs map-side at scan speed alongside the
  * quality/language pass.  Patterns deliberately stay inside the
  * RE2-compatible subset (no backreferences, no lookaround) so the
  * exact same regexes run on Spark (java.util.regex), the SQL oracle
  * (RE2), and any downstream engine.
  *
  * Replacement order is part of the contract: patterns apply in
  * [[patterns]] order, and placeholder tokens contain no digits or
  * `@`, so an earlier replacement can never create a later match.
  */
object Pii {

  /** (kind, regex, placeholder) — applied in this order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  /** Occurrences of one PII kind in `text`. */
  def countOf(text: Column, regex: String): Column =
    size(regexp_extract_all(text, lit(regex), lit(0)))

  /** `text` with every PII match replaced by its placeholder token,
    * in [[patterns]] order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (_, re, tok)) =>
      regexp_replace(t, re, tok)
    }

  /** Per-document PII audit + redaction: per-kind counts, an any-hit
    * flag, and the redacted text.  One narrow projection — at 100 TB
    * this fuses into the scan stage with zero shuffle (each regex runs
    * once per kind; Catalyst keeps the whole row in one codegen stage).
    * Downstream samplers filter on `has_pii` or train on
    * `text_redacted` directly. */
  def piiByDoc(docs: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = patterns.map { case (kind, re, _) =>
      countOf(t, re).as(s"n_$kind")
    }
    val anyHit = patterns
      .map { case (kind, _, _) => col(s"n_$kind") > 0 }
      .reduce(_ || _)
    docs.select(col(idCol) +: counts :+ redact(t).as("text_redacted"): _*)
      .withColumn("has_pii", anyHit)
  }
}
