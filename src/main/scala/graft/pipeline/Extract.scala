package graft.pipeline

import java.nio.charset.StandardCharsets

/** Deterministic HTML → text extraction with the reference's byte-encoding
  * guard applied per-document (reference: guard_input_bytes,
  * /root/reference/src/csv/input.rs:61-70 — refuse UTF-16/32 BOMs, strip
  * UTF-8 BOM, refuse NUL in the first 8 KiB; here the refusal becomes a
  * per-row reason code instead of aborting the job).
  *
  * Extraction contract (the "byte-identical extracted text per url"
  * invariant): drop head/script/style subtrees, close block tags to
  * newlines, strip remaining tags, decode the fixed entity set
  * (&amp; &lt; &gt; &quot; &#39; &nbsp;), ASCII-trim each line, drop empty
  * lines, join with \n. Pure function — safe in mapPartitions hot loops.
  */
object Extract {

  sealed trait Result
  final case class Extracted(text: String) extends Result
  final case class Refused(reason: String) extends Result // "encoding" | "nul"

  private val Utf8Bom = Array(0xef, 0xbb, 0xbf).map(_.toByte)

  /** Byte guard: Some(reason) if the payload must be refused. */
  def guard(bytes: Array[Byte]): Option[String] = {
    if (bytes.length >= 2) {
      val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
      if (b0 == 0xff && b1 == 0xfe) return Some("encoding") // UTF-16/32 LE
      if (b0 == 0xfe && b1 == 0xff) return Some("encoding") // UTF-16 BE
      if (bytes.length >= 4 && b0 == 0 && b1 == 0 &&
        (bytes(2) & 0xff) == 0xfe && (bytes(3) & 0xff) == 0xff)
        return Some("encoding") // UTF-32 BE
    }
    val lim = math.min(bytes.length, 8192)
    var i = if (hasUtf8Bom(bytes)) 3 else 0
    while (i < lim) {
      if (bytes(i) == 0) return Some("nul")
      i += 1
    }
    None
  }

  private def hasUtf8Bom(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && bytes(0) == Utf8Bom(0) && bytes(1) == Utf8Bom(1) && bytes(2) == Utf8Bom(2)

  /** Block-level elements whose close (or self-close) becomes a newline. */
  private val blockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "blockquote", "pre", "section", "article", "header",
    "footer", "title")

  private val dropTags = Set("script", "style", "head")

  def extract(bytes: Array[Byte]): Result = {
    guard(bytes) match {
      case Some(reason) => return Refused(reason)
      case None =>
    }
    val start = if (hasUtf8Bom(bytes)) 3 else 0
    val html = new String(bytes, start, bytes.length - start, StandardCharsets.UTF_8)
    Extracted(extractFromString(html))
  }

  /** Tag-stripping state machine (single pass, no regex backtracking). */
  def extractFromString(html: String): String = {
    val out = new java.lang.StringBuilder(html.length / 2)
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = html.indexOf('>', i + 1)
        if (close < 0) { i = n } // unterminated tag: discard tail
        else {
          val inner = html.substring(i + 1, close)
          val isEnd = inner.startsWith("/")
          val rawName = (if (isEnd) inner.substring(1) else inner)
            .takeWhile(ch => ch.isLetterOrDigit)
            .toLowerCase(java.util.Locale.ROOT)
          if (!isEnd && dropTags.contains(rawName) && !inner.endsWith("/")) {
            // raw-text subtree (script/style) or head: skip to its close tag
            // (script bodies legally contain '<', so tag-scanning would derail)
            val endAt = lower.indexOf(s"</$rawName", close + 1)
            if (endAt < 0) { i = n }
            else {
              val endClose = html.indexOf('>', endAt)
              i = if (endClose < 0) n else endClose + 1
            }
          } else {
            if (blockTags.contains(rawName)) out.append('\n')
            i = close + 1
          }
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    val decoded = decodeEntities(out.toString)
    val lines = decoded.split("\n", -1)
    val sb = new java.lang.StringBuilder(decoded.length)
    var first = true
    var li = 0
    while (li < lines.length) {
      val t = graft.core.AsciiTrim.trim(lines(li))
      if (t.nonEmpty) {
        if (!first) sb.append('\n')
        sb.append(t)
        first = false
      }
      li += 1
    }
    sb.toString
  }

  /** Fixed entity set, longest-match, single pass. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val rep =
          if (s.startsWith("&amp;", i)) { i += 5; "&" }
          else if (s.startsWith("&lt;", i)) { i += 4; "<" }
          else if (s.startsWith("&gt;", i)) { i += 4; ">" }
          else if (s.startsWith("&quot;", i)) { i += 6; "\"" }
          else if (s.startsWith("&#39;", i)) { i += 5; "'" }
          else if (s.startsWith("&nbsp;", i)) { i += 6; " " }
          else { i += 1; "&" }
        sb.append(rep)
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
