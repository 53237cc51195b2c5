package graft.core

/** Pure scalar kernels shared by the Spark pipeline, the independent oracle,
  * and the verifier. Semantics re-expressed from the reference (cmdrvl/rvl):
  *
  *  - ASCII trim: /root/reference/src/normalize/trim.rs:5-21 — strip ONLY
  *    0x20 and 0x09 from both ends. Never Unicode whitespace, never \r\n.
  *  - Missing tokens: /root/reference/src/numeric/missing.rs:10-23 —
  *    "", "-", NA, N/A, NULL, NAN, NONE (ASCII case-insensitive, post-trim).
  *  - Finance-aware numeric parse: /root/reference/src/numeric/parse.rs:14-166.
  *
  * All functions are deterministic, locale-free and allocation-light — they
  * run inside Spark typed maps / mapPartitions hot loops.
  */
object AsciiTrim {
  @inline def isBlank(c: Char): Boolean = c == ' ' || c == '\t'

  /** Strip ASCII space/tab from both ends. NBSP, \r, \n are preserved. */
  def trim(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && isBlank(s.charAt(start))) start += 1
    while (end > start && isBlank(s.charAt(end - 1))) end -= 1
    if (start == 0 && end == s.length) s else s.substring(start, end)
  }

  def isBlankSlice(s: String): Boolean = trim(s).isEmpty
}

object Missing {
  private val tokens = Array("NA", "N/A", "NULL", "NAN", "NONE")

  /** True if the value is a missing token after ASCII-trim (null counts). */
  def isMissing(raw: String): Boolean = {
    if (raw == null) return true
    val t = AsciiTrim.trim(raw)
    if (t.isEmpty || t == "-") return true
    var i = 0
    while (i < tokens.length) {
      if (t.equalsIgnoreCase(tokens(i))) return true
      i += 1
    }
    false
  }
}

/** Finance-aware numeric parse per the reference's v0 rules
  * (/root/reference/src/numeric/parse.rs):
  *  - optional accounting parentheses force-negative: (123.45), ($1,234.56)
  *  - sign and `$` prefix, each at most once, in either order: +$1, $-2
  *  - US thousands commas: first group 1-3 digits, rest exactly 3,
  *    none in fraction or exponent
  *  - optional exponent [eE][+-]?digits
  *  - result must be finite; NaN/inf tokens are NOT numbers
  */
object RvlNumeric {

  def parse(raw: String): Option[Double] = {
    if (raw == null) return None
    val trimmed = AsciiTrim.trim(raw)
    if (trimmed.isEmpty) return None

    var token = trimmed
    var forceNegative = false
    if (token.length >= 2 && token.charAt(0) == '(' && token.charAt(token.length - 1) == ')') {
      forceNegative = true
      token = token.substring(1, token.length - 1)
    }
    if (token.isEmpty) return None

    // prefix: sign and '$', once each, any order
    var sign = 1.0
    var seenSign = false
    var seenDollar = false
    var idx = 0
    var scanning = true
    while (scanning && idx < token.length) {
      val c = token.charAt(idx)
      if ((c == '+' || c == '-') && !seenSign) {
        sign = if (c == '-') -1.0 else 1.0; seenSign = true; idx += 1
      } else if (c == '$' && !seenDollar) {
        seenDollar = true; idx += 1
      } else scanning = false
    }
    val rest = token.substring(idx)
    if (rest.isEmpty) return None
    val first = rest.charAt(0)
    if (first == '+' || first == '-') return None
    if (rest.indexOf('$') >= 0) return None

    parseCore(rest).map { v =>
      val signed = v * sign
      if (forceNegative) -math.abs(signed) else signed
    }
  }

  private def parseCore(token: String): Option[Double] = {
    if (token.isEmpty) return None
    var expIdx = -1
    var i = 0
    while (expIdx < 0 && i < token.length) {
      val c = token.charAt(i)
      if (c == 'e' || c == 'E') expIdx = i
      i += 1
    }
    val mantissa = if (expIdx >= 0) token.substring(0, expIdx) else token
    val exponent = if (expIdx >= 0) token.substring(expIdx) else null

    if (mantissa.isEmpty) return None
    if (exponent != null) {
      if (exponent.length < 2) return None
      if (exponent.indexOf(',') >= 0) return None
      // [eE][+-]?digit+ strictly (Java parseDouble would accept more)
      var j = 1
      val c1 = exponent.charAt(1)
      if (c1 == '+' || c1 == '-') j = 2
      if (j >= exponent.length) return None
      var k = j
      while (k < exponent.length) {
        if (!exponent.charAt(k).isDigit) return None
        k += 1
      }
    }
    if (!validateCommas(mantissa)) return None

    val sb = new java.lang.StringBuilder(token.length)
    var m = 0
    while (m < mantissa.length) {
      val c = mantissa.charAt(m)
      if (c != ',') sb.append(c)
      m += 1
    }
    if (exponent != null) sb.append(exponent)
    val normalized = sb.toString
    try {
      val v = java.lang.Double.parseDouble(normalized)
      if (java.lang.Double.isFinite(v)) Some(v) else None
    } catch { case _: NumberFormatException => None }
  }

  /** Mantissa character/grouping validation. Only digits, one '.', commas in
    * valid 3-digit groups in the integer part. Guarantees the normalized
    * string is in the strict subset both Rust and Java parse identically.
    */
  private def validateCommas(mantissa: String): Boolean = {
    var dotIdx = -1
    var i = 0
    while (i < mantissa.length) {
      val c = mantissa.charAt(i)
      if (c == '.') {
        if (dotIdx >= 0) return false
        dotIdx = i
      } else if (c != ',' && !c.isDigit) return false // stricter than Rust's
      // parse-time rejection ("1a", "1.5f", "0x1p3"): same net accept set.
      i += 1
    }
    val intPart = if (dotIdx >= 0) mantissa.substring(0, dotIdx) else mantissa
    val fracPart = if (dotIdx >= 0) mantissa.substring(dotIdx + 1) else ""
    if (fracPart.indexOf(',') >= 0) return false

    def hasDigit(s: String): Boolean = s.exists(_.isDigit)

    if (intPart.indexOf(',') < 0) return hasDigit(intPart) || hasDigit(fracPart)

    val groups = intPart.split(",", -1)
    val firstGrp = groups(0)
    if (firstGrp.isEmpty || firstGrp.length > 3 || !firstGrp.forall(_.isDigit)) return false
    var g = 1
    while (g < groups.length) {
      if (groups(g).length != 3 || !groups(g).forall(_.isDigit)) return false
      g += 1
    }
    true
  }
}
