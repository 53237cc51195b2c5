package graft.core

/** The verifier's outcome trinity and the machine-stable refusal code ADT.
  *
  * Re-expresses the reference contract:
  *  - 22 codes: /root/reference/src/refusal/codes.rs:6-29 (stable strings
  *    61-86, reasons 90-115)
  *  - exit-code trinity 0/1/2: /root/reference/src/cli/exit.rs:26-32
  *  - every refusal carries a concrete first example and a `Next:` rerun
  *    hint: /root/reference/src/refusal/details.rs:180-299
  *
  * rvl's rule, kept verbatim in spirit: never guess — when the evidence is
  * ambiguous, refuse with a precise machine-stable code.
  */
sealed abstract class RefusalCode(val code: String, val reason: String)

object RefusalCode {
  case object Io extends RefusalCode("E_IO", "file read error")
  case object Encoding extends RefusalCode("E_ENCODING", "unsupported text encoding")
  case object CsvParse extends RefusalCode("E_CSV_PARSE", "CSV parse failure")
  case object Headers extends RefusalCode("E_HEADERS", "invalid or duplicate headers")
  case object NoKey extends RefusalCode("E_NO_KEY", "key column missing")
  case object KeyEmpty extends RefusalCode("E_KEY_EMPTY", "empty key value")
  case object KeyDup extends RefusalCode("E_KEY_DUP", "duplicate key values")
  case object KeyMismatch extends RefusalCode("E_KEY_MISMATCH", "key sets differ")
  case object RowCount extends RefusalCode("E_ROWCOUNT", "row count mismatch")
  case object NeedKey extends RefusalCode("E_NEED_KEY", "cannot deterministically align without a key")
  case object Dialect extends RefusalCode("E_DIALECT", "delimiter ambiguous or undetectable")
  case object AmbiguousProfile extends RefusalCode("E_AMBIGUOUS_PROFILE", "ambiguous profile selectors")
  case object ProfileNotFound extends RefusalCode("E_PROFILE_NOT_FOUND", "profile could not be resolved")
  case object ProfileRegistry extends RefusalCode("E_PROFILE_REGISTRY", "profile column registry could not be loaded")
  case object KeyConflict extends RefusalCode("E_KEY_CONFLICT", "key flag conflicts with profile key")
  case object MixedTypes extends RefusalCode("E_MIXED_TYPES", "mixed numeric and non-numeric values")
  case object NoNumeric extends RefusalCode("E_NO_NUMERIC", "no numeric columns in common")
  case object Missingness extends RefusalCode("E_MISSINGNESS", "numeric-vs-missing mismatch (refusal)")
  case object Diffuse extends RefusalCode("E_DIFFUSE", "diffuse change below coverage threshold")
  case object AuditLimit extends RefusalCode("E_AUDIT_LIMIT", "audit output limit exceeded")
  case object AuditFieldsRequiresExhaustive
      extends RefusalCode("E_AUDIT_FIELDS_REQUIRES_EXHAUSTIVE", "field audit requires exhaustive mode")
  case object AuditFieldsRequiresProfile
      extends RefusalCode("E_AUDIT_FIELDS_REQUIRES_PROFILE", "field audit requires an active profile")

  val all: Seq[RefusalCode] = Seq(
    Io, Encoding, CsvParse, Headers, NoKey, KeyEmpty, KeyDup, KeyMismatch,
    RowCount, NeedKey, Dialect, AmbiguousProfile, ProfileNotFound,
    ProfileRegistry, KeyConflict, MixedTypes, NoNumeric, Missingness, Diffuse,
    AuditLimit, AuditFieldsRequiresExhaustive, AuditFieldsRequiresProfile)
}

/** One ranked contributor row of a REAL_CHANGE verdict. */
final case class Contributor(
    url: String,
    column: String,
    oldValue: Option[Double],
    newValue: Option[Double],
    delta: Double,
    contribution: Double,
    share: Double,
    cumulativeShare: Double)

/** A byte-level text difference surfaced by the field audit
  * (reference op 32, orchestrator.rs:2027-2094). */
final case class FieldChange(url: String, column: String, oldValue: String, newValue: String)

/** Aggregate counts block (reference op 33, orchestrator.rs:880-906). */
final case class DiffCounts(
    rowsRef: Long,
    rowsGot: Long,
    rowsAligned: Long,
    numericColumns: Int,
    textColumns: Int,
    cellsChecked: Long,
    cellsChanged: Long)

sealed abstract class Outcome(val exitCode: Int)

object Outcome {

  /** Proof of no change: every aligned numeric cell checked, max |delta| ≤ tol. */
  final case class NoRealChange(counts: DiffCounts, maxAbsDelta: Double, tolerance: Double)
      extends Outcome(0)

  /** The smallest prefix of ranked contributors covering ≥ threshold of the
    * total L1 change, plus any byte-level text differences. */
  final case class RealChange(
      counts: DiffCounts,
      totalChange: Double,
      maxAbsDelta: Double,
      coverage: Double,
      contributors: Seq[Contributor],
      fieldChanges: Seq[FieldChange])
      extends Outcome(1)

  /** Machine-stable refusal: code + concrete first example + rerun hint. */
  final case class Refused(code: RefusalCode, message: String, detail: Seq[String], next: String)
      extends Outcome(2)
}
