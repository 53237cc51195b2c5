package graft.pipeline

import java.util.regex.Pattern

/** PII scrubbing: an ORDERED list of precompiled regex passes applied in one
  * typed map. The order and the rule list are part of the byte-identity
  * contract, so `version` (a stable hash of the rule list) is recorded in
  * the run ledger — mirroring the reference's column_registry_hash
  * discipline (/root/reference/src/witness/record.rs:122-135).
  *
  * Patterns use only constructs with identical semantics in java.util.regex
  * and RE2 (no backrefs, no lookbehind) so DuckDB oracles can replicate them.
  */
object Scrub {

  final case class Rule(id: String, pattern: Pattern, replacement: String)

  /** Order matters: SSN before phone (both dash-digit shapes, SSN is the
    * more specific 3-2-4), email first (contains digits that phone/ip
    * patterns could nibble). */
  val rules: Seq[Rule] = Seq(
    Rule("email", Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), "[EMAIL]"),
    Rule("ssn", Pattern.compile("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"), "[SSN]"),
    Rule("phone", Pattern.compile("\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"), "[PHONE]"),
    Rule("ipv4", Pattern.compile("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"), "[IP]"))

  /** Stable version tag: SHA-256 over the ordered rule list. */
  lazy val version: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    for (r <- rules) md.update(s"${r.id}:${r.pattern.pattern}:${r.replacement}\n".getBytes("UTF-8"))
    "sha256:" + md.digest().map("%02x".format(_)).mkString
  }

  /** Apply every rule in order. Pure; used in mapPartitions. */
  def scrub(text: String): String = {
    var t = text
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      // fast path: skip the matcher when the trigger char is absent
      t = r.pattern.matcher(t).replaceAll(r.replacement)
      i += 1
    }
    t
  }
}
