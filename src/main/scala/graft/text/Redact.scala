package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for pretraining corpora — the masking pass production
  * pipelines (CCNet/Dolma-style) run between filtering and
  * tokenization: structured identifiers (emails, phone numbers, IP
  * addresses) are replaced with stable placeholder tokens so the
  * cleaned corpus neither leaks the identifier nor shifts token
  * statistics run-to-run.
  *
  * Scale shape: pure `regexp_replace`/`regexp_count` column chains —
  * scan-local, codegen'd, zero shuffle; at 100 TB the pass rides the
  * same scan as language/quality scoring. Patterns are written in the
  * RE2-compatible subset (no backreferences, no lookaround) so the
  * DuckDB oracle replays them byte-for-byte (q50) and a port to any
  * RE2-based engine keeps semantics.
  *
  * Rule order is load-bearing and fixed: emails first (an email
  * contains digit runs a later numeric rule could partially eat),
  * then phones, then IPv4.
  */
object Redact {

  /** One scrub rule: RE2-compatible pattern → placeholder token. */
  final case class Rule(name: String, pattern: String, placeholder: String)

  val Email: Rule = Rule(
    "email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** NANP-style dashed phone numbers (the common explicit form; free-form
    * international numbers are corpus-policy territory, not defaults). */
  val Phone: Rule = Rule(
    "phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")

  val Ipv4: Rule = Rule(
    "ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")

  val DefaultRules: Seq[Rule] = Seq(Email, Phone, Ipv4)

  /** Replace every rule match with its placeholder (rules applied in
    * order). Idempotent: placeholders contain no rule-matchable text. */
  def scrub(text: Column, rules: Seq[Rule] = DefaultRules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.placeholder))

  /** Total redaction count over the RAW text (count before scrubbing —
    * rule order cannot eat a later rule's matches the way chained
    * replaces can).
    *
    * This is a raw-text MATCH count, which on adjacency edge cases can
    * differ from the number of substitutions [[scrub]] actually performs:
    * in `a@b.com555-123-4567` the email match consumes the digits up to
    * the phone's word boundary on raw text (no phone match counted), but
    * after the email is replaced the inserted `<EMAIL>` creates a word
    * boundary and scrub masks the phone too. An audit-metric quirk, not a
    * correctness bug — both sides of the q50 oracle use the same raw-text
    * semantics. */
  def redactionCount(text: Column, rules: Seq[Rule] = DefaultRules): Column =
    rules.map(r => regexp_count(text, lit(r.pattern)))
      .reduceOption(_ + _).getOrElse(lit(0)).cast("long")

  /** Per-rule counts as (name → count) columns for audit outputs. */
  def redactionCounts(text: Column, rules: Seq[Rule] = DefaultRules): Seq[(String, Column)] =
    rules.map(r => r.name -> regexp_count(text, lit(r.pattern)).cast("long"))
}
