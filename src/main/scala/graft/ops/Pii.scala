package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrubbing stage a
  * training-data pipeline runs before anything ships (the recipe popularized
  * by the BigScience ROOTS / Dolma curation stacks: conservative
  * pattern-based detection, typed placeholder substitution, and an audit
  * count per document so the drop/keep decision is queryable).
  *
  * Everything here is built from codegen'd native functions
  * (`regexp_count` / `regexp_replace`) — no UDFs, so the whole stage stays
  * inside whole-stage codegen and scales as a pure map (zero shuffles).
  *
  * The patterns are deliberately restricted to the regex subset whose
  * semantics agree between Java's engine and RE2 (no lookaround, no
  * backreferences): they run identically under Spark, DuckDB, and the
  * RE2-based scanners most curation stacks deploy. */
object Pii {

  /** user@host.tld — local part per RFC-practice subset, 2+ letter TLD. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version-ish strings with a 4+ digit
    * tail ("1.2.3.4567") never match. Octet range is NOT validated (a
    * scrubber prefers false positives over leaks). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone numbers: the nn-nnn-nnn-nnnn international print format (the
    * TPC-H `c_phone` shape) or a bare +country run of 9-15 digits. */
  val PhonePattern = "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b|\\+\\d{9,15}"

  /** Per-document match counts: n_emails, n_ipv4, n_phones. */
  def counts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_ipv4", regexp_count(col(textCol), lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)))

  /** Typed-placeholder redaction. Order matters and is part of the
    * contract: emails first (an email never contains an IP, but a redacted
    * host must not re-match), then IPs, then phones. */
  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      PhonePattern, "[PHONE]")

  /** Redact + audit in one pass: the original column is replaced, the
    * counts ride along so downstream filters (e.g. "drop documents with
    * > k distinct PII hits") need no second scan. */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame =
    counts(docs, textCol).withColumn(textCol, redactText(col(textCol)))
}
