package graft.core

import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.util.Locale

/** Deterministic rendering utilities (identifier encoding, thousands commas,
  * shortest round-trip float, signed delta, 1-dp percent) — semantics from
  * the reference:
  *  - /root/reference/src/format/ident_human.rs:13-27 and ident_json.rs:8-18
  *  - /root/reference/src/format/numbers.rs:4-101
  * These are load-bearing for golden-output tests.
  */
object Fmt {

  private def hasAsciiControl(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b <= 0x1f || b == 0x7f) return true
      i += 1
    }
    false
  }

  private def decodeUtf8Strict(bytes: Array[Byte]): Option[String] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch { case _: CharacterCodingException => None }

  def hexLower(bytes: Array[Byte]): String = {
    val table = "0123456789abcdef"
    val sb = new java.lang.StringBuilder(4 + bytes.length * 2)
    sb.append("hex:")
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(table.charAt(b >> 4)).append(table.charAt(b & 0x0f))
      i += 1
    }
    sb.toString
  }

  /** Human identifier: plain UTF-8 as-is; `u8:`/`hex:`-prefixed input gets a
    * disambiguating `u8:`; control bytes or invalid UTF-8 → `hex:<lower>`. */
  def identHuman(bytes: Array[Byte]): String =
    decodeUtf8Strict(bytes) match {
      case Some(_) if hasAsciiControl(bytes) => hexLower(bytes)
      case Some(s) if s.startsWith("u8:") || s.startsWith("hex:") => "u8:" + s
      case Some(s) => s
      case None => hexLower(bytes)
    }

  def identHuman(s: String): String = identHuman(s.getBytes(StandardCharsets.UTF_8))

  /** JSON identifier: always prefixed — `u8:<utf8>` or `hex:<lower>`. */
  def identJson(bytes: Array[Byte]): String =
    decodeUtf8Strict(bytes) match {
      case Some(s) if !hasAsciiControl(bytes) => "u8:" + s
      case _ => hexLower(bytes)
    }

  def identJson(s: String): String = identJson(s.getBytes(StandardCharsets.UTF_8))

  /** 1,234,567-style integer rendering. */
  def intCommas(value: Long): String = {
    val negative = value < 0
    val abs = BigInt(value).abs.toString
    val sb = new java.lang.StringBuilder(abs.length + abs.length / 3 + 1)
    if (negative) sb.append('-')
    val firstGroup = if (abs.length % 3 == 0) 3 else abs.length % 3
    sb.append(abs.substring(0, firstGroup))
    var idx = firstGroup
    while (idx < abs.length) {
      sb.append(',').append(abs.substring(idx, idx + 3))
      idx += 3
    }
    sb.toString
  }

  /** Shortest round-trip decimal digits of |v| plus base-10 exponent:
    * value = 0.d1d2... × 10^(exp10+1), returned as (digits, exp10) where
    * digits are "d1d2..dn" and value = d1.d2..dn × 10^exp10.
    */
  private def shortestDigits(v: Double): (String, Int) = {
    val abs = math.abs(v)
    var p = 0
    while (p < 17) {
      val s = String.format(Locale.ROOT, s"%.${p}e", java.lang.Double.valueOf(abs))
      if (java.lang.Double.parseDouble(s) == abs) {
        val Array(mant, exp) = s.split("e")
        val digits = mant.replace(".", "").reverse.dropWhile(_ == '0').reverse match {
          case "" => "0"
          case d => d
        }
        return (digits, exp.toInt)
      }
      p += 1
    }
    val s = String.format(Locale.ROOT, "%.16e", java.lang.Double.valueOf(abs))
    val Array(mant, exp) = s.split("e")
    (mant.replace(".", ""), exp.toInt)
  }

  private def plainRender(sign: String, digits: String, exp10: Int): String = {
    val n = digits.length
    if (exp10 >= n - 1) sign + digits + "0" * (exp10 - (n - 1))
    else if (exp10 >= 0) sign + digits.substring(0, exp10 + 1) + "." + digits.substring(exp10 + 1)
    else sign + "0." + "0" * (-exp10 - 1) + digits
  }

  private def sciRender(sign: String, digits: String, exp10: Int): String = {
    val mant = if (digits.length == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
    s"$sign${mant}e$exp10"
  }

  /** Shortest of plain decimal vs trimmed scientific; plain wins ties.
    * floatShortest(0.0) == "0"; floatShortest(7e-10) == "7e-10". */
  def floatShortest(v: Double): String = {
    if (v == 0.0) return "0"
    val sign = if (v < 0) "-" else ""
    val (digits, exp10) = shortestDigits(v)
    val plain = plainRender(sign, digits, exp10)
    val sci = sciRender(sign, digits, exp10)
    if (sci.length < plain.length) sci else plain
  }

  /** Signed delta: "+0" for zero, else explicit sign + shortest float of |v|. */
  def delta(v: Double): String = {
    if (v == 0.0) return "+0"
    val sign = if (v < 0) "-" else "+"
    sign + floatShortest(math.abs(v))
  }

  /** Ratio as percent, one decimal: percent1(0.95) == "95.0%". */
  def percent1(v: Double): String =
    String.format(Locale.ROOT, "%.1f%%", java.lang.Double.valueOf(v * 100.0))
}
