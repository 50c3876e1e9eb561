package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection and redaction for training-corpus hygiene: emails, phone
  * numbers, IPv4 addresses, and SSN-shaped ids, in the style of public
  * corpus-cleaning pipelines (C4 / CCNet blocklist regexes).
  *
  * Pure `Column` regex expressions — whole-stage codegen, no UDFs — and the
  * patterns are restricted to the syntax subset where Java regex and RE2
  * agree (no lookaround, no backreferences), so an external SQL oracle
  * reproduces every count and every redacted byte exactly.
  *
  * Scale shape: map-side only. Redaction adds zero shuffles; counting is a
  * per-row projection, so the operator is bounded by scan throughput at any
  * corpus size.
  */
object Pii {

  /** Category -> (pattern, replacement token). Declaration order is the
    * redaction order (fixed, so both engines produce identical bytes even
    * where categories could overlap in pathological text).
    */
  val Categories: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** Replace every PII span with its category token. */
  def redact(c: Column): Column =
    Categories.foldLeft(c) { case (acc, (_, pattern, token)) =>
      regexp_replace(acc, pattern, token)
    }

  /** Per-category match counts, in [[Categories]] order. */
  def counts(c: Column): Seq[(String, Column)] =
    Categories.map { case (name, pattern, _) =>
      name -> size(regexp_extract_all(c, lit(pattern), lit(0))).cast(LongType)
    }

  /** Total PII spans of any category. */
  def totalCount(c: Column): Column =
    counts(c).map(_._2).reduce(_ + _)
}
