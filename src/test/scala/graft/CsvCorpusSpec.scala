package graft

import graft.sources.CsvFrontDoor
import graft.sources.CsvFrontDoor.{BackslashEscape, RfcEscape}
import graft.core.RefusalCode
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Conformance against the reference's CSV torture corpus: every fixture in
  * /root/reference/tests/fixtures/corpus must parse with the expected
  * dialect/escape or refuse with the expected code, per the expectation
  * table in that corpus's README ("no 'malformed' handwaving",
  * /root/reference/docs/PLAN_RVL.md:568).
  */
class CsvCorpusSpec extends AnyFunSuite {

  private val corpusDir = "/root/reference/tests/fixtures/corpus"

  private case class Expectation(file: String, expected: String, delim: String, escape: String)

  private val rowRe =
    """\|\s*`([^`]+\.csv)`\s*\|[^|]*\|\s*`?([^|`]+)`?\s*\|\s*`?([^|`]*?)`?\s*\|\s*`?([^|`]*?)`?\s*\|""".r

  private lazy val expectations: Seq[Expectation] = {
    val readme = new String(Files.readAllBytes(Paths.get(corpusDir, "README.md")), "UTF-8")
    readme.linesIterator.flatMap { line =>
      rowRe.findFirstMatchIn(line).map(m =>
        Expectation(m.group(1), m.group(2).trim, m.group(3).trim, m.group(4).trim))
    }.toSeq
  }

  private def delimByte(s: String): Option[Byte] = s match {
    case "," => Some(','.toByte)
    case ";" => Some(';'.toByte)
    case "|" => Some('|'.toByte)
    case "^" => Some('^'.toByte)
    case "=" => Some('='.toByte)
    case "\\t" => Some('\t'.toByte)
    case h if h.startsWith("0x") || h.startsWith("0X") =>
      Some(Integer.parseInt(h.substring(2), 16).toByte)
    case _ => None
  }

  test("corpus README expectation table parses (sanity)") {
    assert(expectations.size >= 85, s"only ${expectations.size} rows parsed")
    assert(expectations.exists(_.file == "ambiguous_delimiter.csv"))
  }

  for (e <- expectations) {
    test(s"corpus: ${e.file} -> ${e.expected}") {
      val bytes = Files.readAllBytes(Paths.get(corpusDir, e.file))
      val hexDelim = e.delim.toLowerCase.startsWith("0x")
      // control-byte delimiters are outside the candidate set: the table's
      // parse_ok applies with a forced delimiter; auto mode must refuse
      val forced = if (hexDelim) delimByte(e.delim) else None
      val result = CsvFrontDoor.parse(bytes, forced)
      e.expected match {
        case "parse_ok" =>
          result match {
            case Right(parsed) =>
              delimByte(e.delim).foreach(d =>
                assert(parsed.dialect.delimiter === d, s"delimiter for ${e.file}"))
              val expEscape = if (e.escape == "\\\\") BackslashEscape else RfcEscape
              assert(parsed.dialect.escape === expEscape, s"escape for ${e.file}")
              assert(parsed.headers.nonEmpty)
            case Left(r) => fail(s"${e.file}: expected parse_ok, got ${r.code.code}: ${r.message}")
          }
          if (hexDelim) {
            // and without the forced delimiter: E_DIALECT (guardrail)
            CsvFrontDoor.parse(bytes, None) match {
              case Left(r) => assert(r.code === RefusalCode.Dialect, e.file)
              case Right(p) => fail(s"${e.file}: auto mode should refuse, parsed ${p.headers}")
            }
          }
        case code =>
          result match {
            case Left(r) => assert(r.code.code === code, s"${e.file}: ${r.message}")
            case Right(p) =>
              fail(s"${e.file}: expected $code, parsed headers=${p.headers} " +
                s"delim='${p.dialect.delimiter.toChar}'")
          }
      }
    }
  }
}
