package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over a documents table — the scrub pass a
  * training-data pipeline runs before anything ships: count identifying
  * spans (emails, IPv4 addresses, phone-shaped numbers) and replace them
  * with typed placeholder tokens.
  *
  * All pure regex column expressions (whole-stage codegen, scan-speed at
  * 100 TB). The patterns deliberately stay inside the Java ∩ RE2 common
  * subset (no backreferences, no lookaround), so the exact same pattern
  * strings run in Spark (java.util.regex) and in an external SQL oracle
  * (RE2) with identical matches — redaction output is verified by md5, not
  * just by count.
  *
  * Redaction is idempotent: placeholder tokens contain no `@`, digits, or
  * dots, so a second pass is a no-op (pinned by PiiSpec).
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone-shaped: +C[C] NNN-NNNN (international-prefix form; a broader
    * rule set would just add alternates in the same dialect subset).
    */
  val PhonePattern = "\\+\\d{1,2} \\d{3}-\\d{4}"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Replace every PII span with a typed placeholder. Order matters and is
    * part of the contract: emails first (their domain part would otherwise
    * be corrupted by a prior IP pass on numeric hosts), then IPs, then
    * phones.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
}
