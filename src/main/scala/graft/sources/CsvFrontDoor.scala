package graft.sources

import graft.core.{Outcome, RefusalCode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's CSV "front door", re-expressed byte-for-byte
  * (SURVEY §2.1 ops 1-6):
  *
  *  1. encoding guard — refuse UTF-16/32 BOM (`E_ENCODING`), strip UTF-8
  *     BOM, refuse NUL in first 8 KiB (src/csv/input.rs:61-70);
  *  2. `sep=` directive on the first non-blank line (src/csv/sep.rs:22-43);
  *  3. delimiter auto-detect: 5 candidates scored on header + ≤200 records
  *     / ≤64 KiB by (records_parsed, mode_count, mode_fields); ties
  *     byte-compare samples → candidate order, else `E_DIALECT`;
  *     single-column guard (src/csv/dialect.rs:81-137);
  *  4. RFC4180 parse with backslash-escape fallback only on hard failure
  *     (`E_CSV_PARSE` with line number, src/csv/parser.rs:60-159);
  *  5. blank-record skipping — never the header (src/csv/blank.rs:28-33);
  *  6. header normalization (trim, empty → __rvl_col_<n>, duplicate →
  *     `E_HEADERS`) and width normalization (short rows padded, extra
  *     trailing fields must be blank, src/normalize/headers.rs:29-68 +
  *     csv/records.rs:48-64).
  *
  * Precedence: forced delimiter > `sep=` > auto-detect
  * (src/orchestrator.rs:1095-1128).
  */
object CsvFrontDoor {

  sealed abstract class EscapeMode(val display: String)
  case object RfcEscape extends EscapeMode("none")
  case object BackslashEscape extends EscapeMode("\\\\")

  final case class Dialect(delimiter: Byte, escape: EscapeMode, headerFields: Int,
      score: (Long, Long, Int))

  final case class Parsed(
      dialect: Dialect,
      headers: Vector[String],
      records: Vector[Vector[Array[Byte]]])

  val CandidateDelimiters: Array[Byte] = Array(',', '\t', ';', '|', '^').map(_.toByte)
  val MaxDataRecords = 200
  val MaxSampleBytes = 64 * 1024

  // ---------------------------------------------------------------- bytes
  @inline private def isBlankByte(b: Byte): Boolean = b == ' '.toByte || b == '\t'.toByte

  private def trimBytes(f: Array[Byte]): Array[Byte] = {
    var from = 0
    var to = f.length
    while (from < to && isBlankByte(f(from))) from += 1
    while (to > from && isBlankByte(f(to - 1))) to -= 1
    if (from == 0 && to == f.length) f else java.util.Arrays.copyOfRange(f, from, to)
  }

  private def isBlankField(f: Array[Byte]): Boolean = {
    var i = 0
    var j = f.length
    while (i < j && isBlankByte(f(i))) i += 1
    i == j
  }

  private def isBlankRecord(r: Vector[Array[Byte]]): Boolean =
    r.isEmpty || r.forall(isBlankField)

  private def stripCr(line: Array[Byte]): Array[Byte] =
    if (line.nonEmpty && line(line.length - 1) == '\r'.toByte)
      java.util.Arrays.copyOfRange(line, 0, line.length - 1)
    else line

  private def splitLines(input: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var start = 0
    var i = 0
    while (i < input.length) {
      if (input(i) == '\n'.toByte) {
        out += java.util.Arrays.copyOfRange(input, start, i)
        start = i + 1
      }
      i += 1
    }
    if (start < input.length) out += java.util.Arrays.copyOfRange(input, start, input.length)
    out.result()
  }

  // ------------------------------------------------------------ sep= scan
  /** Valid delimiters: single byte 0x01-0x7F excluding quote/CR/LF. */
  def isValidDelimiter(d: Byte): Boolean =
    d >= 0x01 && d <= 0x7f && d != '"'.toByte && d != '\r'.toByte && d != '\n'.toByte

  sealed trait SepScan
  final case class SepDirective(delimiter: Byte, lineIndex: Int) extends SepScan
  final case class FirstNonBlank(lineIndex: Int) extends SepScan
  case object NoLines extends SepScan

  def scanSep(lines: Vector[Array[Byte]]): SepScan = {
    var idx = 0
    while (idx < lines.length) {
      val line = stripCr(lines(idx))
      if (!isBlankField(line)) {
        if (line.length == 5 && line(0) == 's' && line(1) == 'e' && line(2) == 'p' &&
          line(3) == '=' && isValidDelimiter(line(4)))
          return SepDirective(line(4), idx)
        return FirstNonBlank(idx)
      }
      idx += 1
    }
    NoLines
  }

  // --------------------------------------------------------- quote check
  /** Pre-pass quote validation (src/csv/parser.rs:111-159): a closing quote
    * must be followed by delimiter/CR/LF/EOF; unterminated quotes fail.
    * Returns -1 when valid, else the BYTE OFFSET of the violation (for an
    * unterminated quote: the offset of its opening quote), so the refusal
    * can name the actual offending line. */
  def validateQuotes(input: Array[Byte], delimiter: Byte, escape: EscapeMode): Int = {
    var inQuotes = false
    var quoteStart = -1
    var i = 0
    val n = input.length
    while (i < n) {
      val b = input(i)
      if (inQuotes) {
        if (escape == BackslashEscape && b == '\\'.toByte && i + 1 < n && input(i + 1) == '"'.toByte) {
          i += 2
        } else if (b == '"'.toByte) {
          if (i + 1 < n && input(i + 1) == '"'.toByte) i += 2
          else {
            inQuotes = false
            if (i + 1 < n) {
              val next = input(i + 1)
              if (next != delimiter && next != '\n'.toByte && next != '\r'.toByte) return i + 1
            }
            i += 1
          }
        } else i += 1
      } else {
        if (b == '"'.toByte) { inQuotes = true; quoteStart = i }
        i += 1
      }
    }
    if (inQuotes) quoteStart else -1
  }

  // -------------------------------------------------------------- parser
  /** Flexible-width byte-record parse. Terminators: \n, \r\n, lone \r.
    * Quoting active only at field start (the pre-pass has already refused
    * pathological quote placement). Returns (records, linesConsumed) or the
    * failing 1-based line. */
  def readRecords(input: Array[Byte], delimiter: Byte, escape: EscapeMode)
      : Either[Long, Vector[Vector[Array[Byte]]]] = {
    val violationAt = validateQuotes(input, delimiter, escape)
    if (violationAt >= 0) {
      // first offending line = newlines up to the violation offset + 1
      var line = 1L
      var i = 0
      while (i < violationAt) { if (input(i) == '\n'.toByte) line += 1; i += 1 }
      return Left(line)
    }
    val records = Vector.newBuilder[Vector[Array[Byte]]]
    val field = new java.io.ByteArrayOutputStream(64)
    var current = Vector.newBuilder[Array[Byte]]
    var nFields = 0
    var i = 0
    val n = input.length
    var sawAny = false

    def endField(): Unit = { current += field.toByteArray; field.reset(); nFields += 1 }
    def endRecord(): Unit = {
      endField()
      records += current.result()
      current = Vector.newBuilder[Array[Byte]]
      nFields = 0
      sawAny = false
    }

    while (i < n) {
      val b = input(i)
      if (b == '"'.toByte && field.size() == 0 && !sawAny) {
        // quoted field
        sawAny = true
        i += 1
        var closed = false
        while (!closed && i < n) {
          val c = input(i)
          if (escape == BackslashEscape && c == '\\'.toByte && i + 1 < n && input(i + 1) == '"'.toByte) {
            field.write('"'); i += 2
          } else if (c == '"'.toByte) {
            if (i + 1 < n && input(i + 1) == '"'.toByte) { field.write('"'); i += 2 }
            else { closed = true; i += 1 }
          } else { field.write(c); i += 1 }
        }
      } else if (b == delimiter) {
        endField(); sawAny = false; i += 1
      } else if (b == '\n'.toByte) {
        endRecord(); i += 1
      } else if (b == '\r'.toByte) {
        endRecord()
        i += 1
        if (i < n && input(i) == '\n'.toByte) i += 1
      } else {
        field.write(b); sawAny = true; i += 1
      }
    }
    if (field.size() > 0 || nFields > 0 || sawAny) endRecord()
    Right(records.result())
  }

  // -------------------------------------------------------- auto-detect
  private final case class Sample(
      escape: EscapeMode,
      headerFields: Int,
      score: (Long, Long, Int),
      records: Vector[Vector[Array[Byte]]])

  private def effectiveFieldCount(r: Vector[Array[Byte]], headerFields: Int): Int =
    if (r.length <= headerFields) headerFields
    else if (r.drop(headerFields).forall(isBlankField)) headerFields
    else r.length

  private def normalizeForCompare(r: Vector[Array[Byte]], headerFields: Int): Vector[Array[Byte]] =
    if (r.length < headerFields) r ++ Vector.fill(headerFields - r.length)(Array.empty[Byte])
    else {
      var v = r
      while (v.length > headerFields && isBlankField(v.last)) v = v.dropRight(1)
      v
    }

  private def sampleWithEscape(input: Array[Byte], delimiter: Byte, escape: EscapeMode): Option[Sample] =
    readRecords(input, delimiter, escape) match {
      case Left(_) => None
      case Right(all) =>
        var headerFields = 0
        var seenHeader = false
        var dataRecords = 0
        var recordsParsed = 0L
        val histogram = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
        val sample = Vector.newBuilder[Vector[Array[Byte]]]
        val it = all.iterator
        var stop = false
        while (it.hasNext && !stop) {
          val r = it.next()
          if (!seenHeader) {
            seenHeader = true
            headerFields = r.length
            recordsParsed += 1
            histogram(effectiveFieldCount(r, headerFields)) += 1
            sample += normalizeForCompare(r, headerFields)
          } else if (!isBlankRecord(r)) {
            dataRecords += 1
            if (dataRecords > MaxDataRecords) stop = true
            else {
              recordsParsed += 1
              histogram(effectiveFieldCount(r, headerFields)) += 1
              sample += normalizeForCompare(r, headerFields)
            }
          }
        }
        var modeCount = 0L
        var modeFields = 0
        for ((fields, count) <- histogram)
          if (count > modeCount || (count == modeCount && fields > modeFields)) {
            modeCount = count; modeFields = fields
          }
        if (recordsParsed == 0) None
        else Some(Sample(escape, headerFields, (recordsParsed, modeCount, modeFields), sample.result()))
    }

  private def scoreGreater(a: (Long, Long, Int), b: (Long, Long, Int)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && (a._2 > b._2 || (a._2 == b._2 && a._3 > b._3)))

  sealed trait DetectResult
  final case class Detected(dialect: Dialect) extends DetectResult
  final case class Ambiguous(tied: Seq[Byte]) extends DetectResult
  final case class SingleColumn(delimiter: Byte) extends DetectResult
  case object NoHeader extends DetectResult
  case object ParseFailed extends DetectResult

  def autoDetect(inputFull: Array[Byte]): DetectResult = {
    // skip leading blank lines, cap the sample
    val lines = splitLines(inputFull)
    val firstIdx = lines.indexWhere(l => !isBlankField(stripCr(l)))
    if (firstIdx < 0) return NoHeader
    val offset = lines.take(firstIdx).map(_.length + 1).sum
    val fromHeader = java.util.Arrays.copyOfRange(inputFull, offset,
      math.min(inputFull.length, offset + MaxSampleBytes))

    val candidates = CandidateDelimiters.flatMap { d =>
      val rfc = sampleWithEscape(fromHeader, d, RfcEscape)
      val chosen = rfc match {
        case Some(s) => Some(s)
        case None =>
          val back = sampleWithEscape(fromHeader, d, BackslashEscape)
          back
      }
      chosen.map(s => (d, s))
    }
    if (candidates.isEmpty) return ParseFailed

    val best = candidates.map(_._2.score).reduce((a, b) => if (scoreGreater(b, a)) b else a)
    val tied = candidates.filter(_._2.score == best)
    val chosen =
      if (tied.length == 1) tied.head
      else {
        val first = tied.head._2.records
        val identical = tied.tail.forall(t => samplesEqual(t._2.records, first))
        if (identical) tied.head // already in candidate priority order
        else return Ambiguous(tied.map(_._1).toSeq)
      }
    if (chosen._2.headerFields == 1) return SingleColumn(chosen._1)
    Detected(Dialect(chosen._1, chosen._2.escape, chosen._2.headerFields, chosen._2.score))
  }

  private def samplesEqual(a: Vector[Vector[Array[Byte]]], b: Vector[Vector[Array[Byte]]]): Boolean =
    a.length == b.length && a.indices.forall { i =>
      a(i).length == b(i).length &&
        a(i).indices.forall(j => java.util.Arrays.equals(a(i)(j), b(i)(j)))
    }

  // ----------------------------------------------------------- front door
  private def refuse(code: RefusalCode, message: String, detail: Seq[String], next: String) =
    Left(Outcome.Refused(code, message, detail, next))

  /** Full parse: bytes → dialect + normalized headers + width-normalized
    * records, or a refusal. `forcedDelimiter` models the CLI flag. */
  def parse(bytes: Array[Byte], forcedDelimiter: Option[Byte] = None)
      : Either[Outcome.Refused, Parsed] = {
    // 1. encoding guard (shared with the html extractor)
    graft.pipeline.Extract.guard(bytes) match {
      case Some(_) =>
        return refuse(RefusalCode.Encoding,
          "unsupported byte encoding (UTF-16/32 BOM or NUL in first 8KB)",
          Seq.empty, "Next: re-export the file as UTF-8 without BOM.")
      case None =>
    }
    val noBom =
      if (bytes.length >= 3 && bytes(0) == 0xef.toByte && bytes(1) == 0xbb.toByte && bytes(2) == 0xbf.toByte)
        java.util.Arrays.copyOfRange(bytes, 3, bytes.length)
      else bytes

    // 2. sep= directive
    val lines = splitLines(noBom)
    val (sepDelim, bodyStart) = scanSep(lines) match {
      case SepDirective(d, idx) => (Some(d), lines.take(idx + 1).map(_.length + 1).sum)
      case FirstNonBlank(_) => (None, 0)
      case NoLines =>
        return refuse(RefusalCode.Headers, "no header line found",
          Seq.empty, "Next: add a header row.")
    }
    val body = java.util.Arrays.copyOfRange(noBom, math.min(bodyStart, noBom.length), noBom.length)

    // 3. delimiter precedence: forced > sep= > auto
    val (delimiter, escapeOpt) = forcedDelimiter.orElse(sepDelim) match {
      case Some(d) => (d, None)
      case None =>
        autoDetect(body) match {
          case Detected(dl) => (dl.delimiter, Some(dl.escape))
          case Ambiguous(tiedDelims) =>
            return refuse(RefusalCode.Dialect,
              s"delimiter ambiguous between ${tiedDelims.map(b => s"'${b.toChar}'").mkString(", ")}",
              tiedDelims.map(b => s"candidate=${b.toChar}"),
              "Next: rerun with an explicit delimiter.")
          case SingleColumn(d) =>
            return refuse(RefusalCode.Dialect,
              s"auto-detect produced a single-column header (delimiter '${d.toChar}')",
              Seq.empty, "Next: rerun with an explicit delimiter if single-column is intended.")
          case NoHeader =>
            return refuse(RefusalCode.Headers, "no header line found",
              Seq.empty, "Next: add a header row.")
          case ParseFailed =>
            return refuse(RefusalCode.CsvParse, "no candidate delimiter parses the sample",
              Seq.empty, "Next: check quoting, or force a delimiter.")
        }
    }

    // 4. parse: RFC first, backslash fallback only on hard failure
    val (records, escape) = escapeOpt match {
      case Some(e) =>
        readRecords(body, delimiter, e) match {
          case Right(rs) => (rs, e)
          case Left(line) =>
            return refuse(RefusalCode.CsvParse, s"CSV parse failure near line $line",
              Seq(s"line=$line"), "Next: fix the quoting at the reported line.")
        }
      case None =>
        readRecords(body, delimiter, RfcEscape) match {
          case Right(rs) => (rs, RfcEscape)
          case Left(line1) =>
            readRecords(body, delimiter, BackslashEscape) match {
              case Right(rs) => (rs, BackslashEscape)
              case Left(_) =>
                return refuse(RefusalCode.CsvParse, s"CSV parse failure near line $line1",
                  Seq(s"line=$line1"), "Next: fix the quoting at the reported line.")
            }
        }
    }

    // 5. header = first non-blank record
    val headerIdx = records.indexWhere(r => !isBlankRecord(r))
    if (headerIdx < 0)
      return refuse(RefusalCode.Headers, "no header line found",
        Seq.empty, "Next: add a header row.")
    val rawHeader = records(headerIdx)

    // 6a. header normalization: trim, empty -> __rvl_col_<n>, dup -> E_HEADERS
    val names = new scala.collection.mutable.ArrayBuffer[String](rawHeader.length)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    for ((h, idx0) <- rawHeader.zipWithIndex) {
      val trimmed = trimBytes(h)
      val name =
        if (trimmed.isEmpty) s"__rvl_col_${idx0 + 1}"
        else new String(trimmed, java.nio.charset.StandardCharsets.UTF_8)
      seen.get(name) match {
        case Some(first) =>
          return refuse(RefusalCode.Headers,
            s"duplicate header '$name' (columns $first and ${idx0 + 1})",
            Seq(s"name=$name"), "Next: rename or drop the duplicate column.")
        case None => seen(name) = idx0 + 1
      }
      names += name
    }

    // 6b. width normalization of data records
    val width = names.length
    val data = Vector.newBuilder[Vector[Array[Byte]]]
    var recNo = 0L
    for (r <- records.drop(headerIdx + 1) if !isBlankRecord(r)) {
      recNo += 1
      if (r.length > width) {
        val firstBad = (width until r.length).find(i => !isBlankField(r(i)))
        if (firstBad.isDefined)
          return refuse(RefusalCode.Headers,
            s"record $recNo has a non-blank extra field at index ${firstBad.get + 1}",
            Seq(s"record=$recNo"), "Next: fix the producer or widen the header.")
        data += r.take(width)
      } else if (r.length < width) {
        data += r ++ Vector.fill(width - r.length)(Array.empty[Byte])
      } else data += r
    }

    Right(Parsed(Dialect(delimiter, escape, width, (0L, 0L, 0)), names.toVector, data.result()))
  }

  /** Parsed CSV → DataFrame (all columns StringType; the verifier's typed
    * parse happens downstream via rvl_parse). Driver-side for small inputs;
    * large inputs would route the detected dialect into spark.read.csv. */
  def toDataFrame(spark: SparkSession, parsed: Parsed): DataFrame = {
    val schema = StructType(parsed.headers.map(StructField(_, StringType, nullable = false)))
    val rows = parsed.records.map(r =>
      org.apache.spark.sql.Row.fromSeq(r.map(f =>
        new String(f, java.nio.charset.StandardCharsets.UTF_8))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 10000)), schema)
  }
}
