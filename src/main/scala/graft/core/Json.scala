package graft.core

/** Minimal deterministic JSON writer (no deps offline). Keys render in the
  * order given; callers keep that order stable — hashed/audited output must
  * never depend on map iteration order (the reference enforces the same rule
  * via its no-hashmap-in-output lint, /root/reference/rules/). */
object Json {

  def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case x if x < ' ' => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else Fmt.floatShortest(d)

  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${esc(k)}:$v" }.mkString("{", ",", "}")

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")

  def optStr(o: Option[String]): String = o.map(esc).getOrElse("null")
  def optNum(o: Option[Double]): String = o.map(num).getOrElse("null")

  /** Regex readers for THIS writer's flat canonical JSON (string and
    * integer fields) — shared by the manifest/ledger readers so the
    * parsing weakness lives in one place. NOT a general JSON parser. */
  def fieldStr(src: String, k: String): Option[String] =
    (s""""$k":"([^"]*)"""").r.findFirstMatchIn(src).map(_.group(1))
  def fieldNum(src: String, k: String): Option[Long] =
    (s""""$k":(-?\\d+)""").r.findFirstMatchIn(src).map(_.group(1).toLong)

  /** Inverse of [[esc]] for a string BODY (no surrounding quotes):
    * \" \\ \n \r \t \uXXXX. Used by the capsule manifest reader. */
  def unesc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
