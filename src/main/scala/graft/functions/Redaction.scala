package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus curation: scrub email addresses,
  * IPv4 addresses, and phone numbers from document text, and count what
  * was scrubbed (the audit trail a redaction pass must publish). The
  * standard pre-training cleanup step (C4/Dolma-style pipelines run
  * exactly this trio) that the reference's document pipeline stops
  * short of — its text munging is field renames and null pruning
  * (`search/decorate.js`), not content scrubbing.
  *
  * Everything is `regexp_replace`/`regexp_count` over codegen'd
  * expressions — per-row, shuffle-free, scan-speed over a 100 TB
  * documents table, and no UDFs. The patterns are restricted to the
  * regex subset Java (Spark) and RE2 (the DuckDB oracle) interpret
  * identically — character classes, bounded quantifiers, `\b`, `\d` —
  * so the oracle twin (q88) replays redaction bit-for-bit; Java-only
  * constructs (backreferences, lookaround) are deliberately out.
  *
  * Replacement order is fixed (email, then IPv4, then phone): an email
  * is the only pattern that can CONTAIN digit runs able to feed the
  * later patterns, so scrubbing it first makes the pass order-stable;
  * the counts are defined against the ORIGINAL text (what was present,
  * not what an earlier replacement left behind).
  */
object Redaction {

  /** user@host.tld — local part and host restricted to the usual
    * atom characters, TLD at least two letters.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded (no octet-range validation — a
    * scrubber prefers false positives over leaked addresses).
    */
  val Ipv4Pattern: String =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style 3-3-4 phone with `-` or `.` separators, word-bounded. */
  val PhonePattern: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern))

  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Pattern))

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern))

  /** The scrubbed text: all three pattern families replaced by their
    * typed tags, in the fixed email → IPv4 → phone order.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailTag),
        Ipv4Pattern, IpTag),
      PhonePattern, PhoneTag)
}
