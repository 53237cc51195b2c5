package graft

import graft.core.{AsciiTrim, Fmt, Missing, RvlNumeric}
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-kernel golden vectors ported from the reference unit tests:
  * numeric parse /root/reference/src/numeric/parse.rs:178-248, missing
  * missing.rs:30-83, trim trim.rs:29-99, formatting numbers.rs:103-135,
  * identifiers ident_human.rs:46-68 / ident_json.rs:40-66.
  */
class KernelSpec extends AnyFunSuite {

  private def p(s: String): Option[Double] = RvlNumeric.parse(s)

  test("numeric parse: plain numbers") {
    assert(p("123") === Some(123.0))
    assert(p("-123") === Some(-123.0))
    assert(p("+123") === Some(123.0))
    assert(p("123.45") === Some(123.45))
    assert(p("-123.45") === Some(-123.45))
    assert(p("1e6") === Some(1e6))
    assert(p("-1.2E-3") === Some(-1.2e-3))
  }

  test("numeric parse: thousands separators") {
    assert(p("1,234") === Some(1234.0))
    assert(p("-1,234") === Some(-1234.0))
    assert(p("+1,234") === Some(1234.0))
    assert(p("1,234,567.89") === Some(1234567.89))
    assert(p("-1,234,567.89") === Some(-1234567.89))
  }

  test("numeric parse: currency prefix") {
    assert(p("$123.45") === Some(123.45))
    assert(p("$1,234.56") === Some(1234.56))
    assert(p("-$1,234.56") === Some(-1234.56))
    assert(p("$-1,234.56") === Some(-1234.56))
    assert(p("+$1,234.56") === Some(1234.56))
    assert(p("$+1,234.56") === Some(1234.56))
  }

  test("numeric parse: accounting parentheses force negative") {
    assert(p("(123.45)") === Some(-123.45))
    assert(p("(1,234.56)") === Some(-1234.56))
    assert(p("($1,234.56)") === Some(-1234.56))
    assert(p("($-1,234.56)") === Some(-1234.56))
  }

  test("numeric parse: rejects invalid commas") {
    for (bad <- Seq("12,34", "1,23,456", "1,234,56.78", ",123", "123,"))
      assert(p(bad).isEmpty, bad)
  }

  test("numeric parse: rejects invalid tokens") {
    for (bad <- Seq("", "$", "sep=,", "1,234.5.6", "+$-1", "--1", "NaN",
        "inf", "+inf", "-inf", "Infinity", "1.5f", "1.5d", "0x1p3", "1a", "5e"))
      assert(p(bad).isEmpty, bad)
  }

  test("numeric parse: ascii trim applies") {
    assert(p("  123  ") === Some(123.0))
    assert(p("\t$1,234.00\t") === Some(1234.0))
  }

  test("ascii trim: spaces/tabs only, inner + unicode preserved") {
    assert(AsciiTrim.trim("  hello  ") === "hello")
    assert(AsciiTrim.trim("\thello\t") === "hello")
    assert(AsciiTrim.trim(" \t hello \t ") === "hello")
    assert(AsciiTrim.trim("") === "")
    assert(AsciiTrim.trim("  \t\t  ") === "")
    assert(AsciiTrim.trim("  hello world  ") === "hello world")
    assert(AsciiTrim.trim("\thello\tworld\t") === "hello\tworld")
    assert(AsciiTrim.trim(" hello ") === " hello ")
    assert(AsciiTrim.trim("hello") === "hello")
    assert(AsciiTrim.trim("\r\nhello\r\n") === "\r\nhello\r\n")
    assert(AsciiTrim.isBlankSlice(" \t "))
    assert(!AsciiTrim.isBlankSlice(" x "))
  }

  test("missing tokens") {
    for (m <- Seq("", "   ", "\t\t", " \t ", "-", "  -  ", "NA", "na", "N/A",
        "n/a", "NULL", "Null", "NAN", "nan", "NONE", "none", "  n/a  ", "\tNaN\t"))
      assert(Missing.isMissing(m), m)
    for (nm <- Seq("0", "NA_", "N/Ax", "--", "NULLS", "\r", "\r\n", "\r\nNA\r\n"))
      assert(!Missing.isMissing(nm), nm)
    assert(Missing.isMissing(null))
  }

  test("int commas") {
    assert(Fmt.intCommas(0) === "0")
    assert(Fmt.intCommas(12) === "12")
    assert(Fmt.intCommas(1234) === "1,234")
    assert(Fmt.intCommas(1234567) === "1,234,567")
    assert(Fmt.intCommas(-1234567) === "-1,234,567")
    assert(Fmt.intCommas(1842223) === "1,842,223")
    assert(Fmt.intCommas(Long.MinValue) === "-9,223,372,036,854,775,808")
  }

  test("float shortest") {
    assert(Fmt.floatShortest(0.0) === "0")
    assert(Fmt.floatShortest(1.0) === "1")
    assert(Fmt.floatShortest(1.25) === "1.25")
    assert(Fmt.floatShortest(-1.25) === "-1.25")
    assert(Fmt.floatShortest(7e-10) === "7e-10")
    assert(Fmt.floatShortest(0.1) === "0.1")
    assert(Fmt.floatShortest(1e21) === "1e21")
  }

  test("delta formatting") {
    assert(Fmt.delta(0.0) === "+0")
    assert(Fmt.delta(-0.0) === "+0")
    assert(Fmt.delta(2.5) === "+2.5")
    assert(Fmt.delta(-2.5) === "-2.5")
  }

  test("percent one decimal") {
    assert(Fmt.percent1(0.95) === "95.0%")
    assert(Fmt.percent1(0.001) === "0.1%")
  }

  test("identifier human") {
    assert(Fmt.identHuman("hello") === "hello")
    assert(Fmt.identHuman("café") === "café")
    assert(Fmt.identHuman("u8:col") === "u8:u8:col")
    assert(Fmt.identHuman("hex:dead") === "u8:hex:dead")
    assert(Fmt.identHuman("hi\u0001") === "hex:686901")
    assert(Fmt.identHuman("\u007f") === "hex:7f")
    assert(Fmt.identHuman(Array(0xff.toByte, 0xfe.toByte)) === "hex:fffe")
  }

  test("identifier json") {
    assert(Fmt.identJson("abc") === "u8:abc")
    assert(Fmt.identJson("¢") === "u8:¢")
    assert(Fmt.identJson("\u0000abc") === "hex:00616263")
    assert(Fmt.identJson("ab\u007f") === "hex:61627f")
    assert(Fmt.identJson("u8:foo") === "u8:u8:foo")
    assert(Fmt.identJson("hex:deadbeef") === "u8:hex:deadbeef")
    assert(Fmt.identJson(Array(0xff.toByte, 0xfe.toByte)) === "hex:fffe")
  }

  test("property: floatShortest round-trips and re-parses (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val d = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(25) - 12)
      val s = Fmt.floatShortest(d)
      assert(java.lang.Double.parseDouble(s) === d, s"roundtrip $d -> $s")
      assert(RvlNumeric.parse(s) === Some(d), s"reparse $d -> $s")
    }
  }

  test("property: minhashFromSet(shingleSet) == minhash; sortedIntersect is exact") {
    import graft.functions.TextHash
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val s = (0 until rnd.nextInt(60)).map(_ => (97 + rnd.nextInt(26)).toChar).mkString
      // min over the DISTINCT set must equal min over all positions
      assert(TextHash.minhashFromSet(TextHash.shingleSet(s)).toSeq ===
        TextHash.minhash(s).toSeq, s"minhash mismatch on '$s'")
    }
    for (_ <- 1 to 500) {
      val a = TextHash.shingleSet((0 until rnd.nextInt(50)).map(_ => (97 + rnd.nextInt(4)).toChar).mkString)
      val b = TextHash.shingleSet((0 until rnd.nextInt(50)).map(_ => (97 + rnd.nextInt(4)).toChar).mkString)
      val expected = a.toSet.intersect(b.toSet).size.toLong
      assert(TextHash.sortedIntersect(a, b) === expected)
      assert(TextHash.sortedIntersect(b, a) === expected) // commutative
    }
  }
}
