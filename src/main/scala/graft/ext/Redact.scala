package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the privacy-scrub pass every
  * LLM-training corpus goes through before the text is usable (the
  * reference has no free-text surface at all; this is north-star
  * extension surface like the rest of ext/).
  *
  * Shape at scale: pure regexp column expressions — a narrow,
  * codegen'd map over the text column with zero shuffle, zero UDF,
  * zero driver state, so the scrub rides the same scan as
  * tokenization/quality scoring. Patterns are anchored with `\b` word
  * boundaries and stay inside the regex subset Java's engine and RE2
  * (the DuckDB oracle) interpret identically: no backreferences, no
  * lookaround, no possessive quantifiers.
  *
  * Counting uses non-overlapping left-to-right matching
  * (`regexp_extract_all` → size), the semantics both engines share.
  * Replacement order matters and is fixed: emails first (an email
  * contains dot-separated runs a naive IP pattern could nibble at),
  * then IPs, then phones.
  */
object Redact {

  /** user@host.tld — local part without leading/trailing dot chars is
    * not enforced (scrub recall beats precision for PII).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, 1-3 digits per octet. `\b` keeps it off longer
    * digit runs; octet range (0-255) is deliberately not enforced —
    * same recall-over-precision tradeoff.
    */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style 3-3-4 phone with `-`/`.`/space separators. No optional
    * `+1` prefix: `\b` before an optional `\+` is a trap (space→`+` is
    * no word boundary, so the prefixed branch silently never matches);
    * keeping the pattern prefix-free keeps Java and RE2 trivially
    * agreeing.
    */
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact all three PII classes to typed placeholder tokens. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }
}
