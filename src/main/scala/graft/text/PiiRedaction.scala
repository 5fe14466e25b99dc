package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrub step a
  * training-data pipeline runs before anything else sees the corpus
  * (emails, phone numbers, host IPs, national-id-shaped numbers).
  *
  * Everything is built-in `regexp_count` / `regexp_replace` — codegen'd
  * string work, no UDF, so detection+redaction rides the same one scan
  * as the rest of the quality signals (compose with
  * [[TextStats]]/q14 at 100 TB: one pass, many columns).
  *
  * Pattern dialect: the expressions below avoid every construct on
  * which Java regex (Spark) and RE2 (DuckDB, Go tooling) disagree —
  * no backreferences, no lookaround, no possessive quantifiers — so
  * the oracle can run the IDENTICAL pattern strings. Order matters and
  * is fixed: email → ip → national id → phone (each placeholder is
  * letters-only, so later patterns can never match inside an earlier
  * replacement).
  *
  * This is pattern-shaped PII only (the honest scope of regex
  * scrubbing): names/addresses need an NER model, which belongs in the
  * q26-style mapInPandas stage, not here.
  */
object PiiRedaction {

  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  /** 3-2-4 dashed id (US SSN shape). Disjoint from [[PhonePattern]]
    * (3-3-4) by construction. */
  val NationalIdPattern = """\b\d{3}-\d{2}-\d{4}\b"""
  val PhonePattern = """\b\d{3}[-.]\d{3}[-.]\d{4}\b"""

  /** (kind, pattern, placeholder) in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", EmailPattern, "[EMAIL]"),
    ("ip", Ipv4Pattern, "[IP]"),
    ("national_id", NationalIdPattern, "[ID]"),
    ("phone", PhonePattern, "[PHONE]"))

  /** Matches of `kind` in `c` (pre-redaction text). */
  def piiCount(c: Column, kind: String): Column = {
    val p = Patterns.find(_._1 == kind)
      .getOrElse(sys.error(s"unknown PII kind $kind"))._2
    regexp_count(c, lit(p))
  }

  /** `c` with every pattern replaced by its placeholder, in the fixed
    * [[Patterns]] order. */
  def redact(c: Column): Column =
    Patterns.foldLeft(c) { case (acc, (_, p, r)) =>
      regexp_replace(acc, p, r)
    }

  /** Total residual matches of ANY pattern in already-redacted text —
    * the self-check a scrub stage should always emit (must be 0). */
  def residual(c: Column): Column =
    Patterns.map { case (_, p, _) => regexp_count(c, lit(p)) }
      .reduce(_ + _)
}
