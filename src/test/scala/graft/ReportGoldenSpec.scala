package graft

import graft.core._
import graft.verify.{DiffConfig, Report}
import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact golden outputs for the three outcomes, human + JSON —
  * mirroring the reference's committed regression goldens
  * (/root/reference/tests/fixtures/regression/, tests/output_golden.rs).
  * Any rendering change must consciously update these strings.
  */
class ReportGoldenSpec extends AnyFunSuite {

  private val cfg = DiffConfig(
    numericCols = Seq("keep", "ppl"),
    textCols = Seq("scrubbed_text"),
    tolerance = 0.0,
    threshold = 0.95)

  private val counts = DiffCounts(
    rowsRef = 1842223, rowsGot = 1842223, rowsAligned = 1842223,
    numericColumns = 2, textColumns = 1,
    cellsChecked = 5526669, cellsChanged = 0)

  test("golden: NO_REAL_CHANGE human") {
    val out = Report.human(Outcome.NoRealChange(counts, 7e-10, 1e-9),
      cfg.copy(tolerance = 1e-9))
    val expected =
      """graft verify — keyed diff by 'url'
        |Alignment: key (url)
        |Columns: 3 in scope (2 numeric, 1 text)
        |Settings: tolerance 1e-9, threshold 95.0%, max contributors 25
        |Checked: 5,526,669 cells across 1,842,223 aligned rows
        |
        |NO REAL CHANGE
        |Max abs delta: 7e-10 (<= tolerance 1e-9)
        |""".stripMargin
    assert(out === expected)
  }

  private val realContributors = Seq(
    Contributor("https://host1.example.org/p/endoc-17", "keep",
      Some(1.0), Some(0.0), -1.0, 1.0, 0.9, 0.9),
    Contributor("https://host2.example.org/p/dedoc-4", "ppl",
      Some(120.5), Some(120.61111111), 0.11111111, 0.11111111, 0.1, 1.0))
  private val realFieldChanges = Seq(FieldChange("https://host1.example.org/p/endoc-17",
    "scrubbed_text", "a", "b"))
  private val realOutcome = Outcome.RealChange(
    counts.copy(cellsChanged = 3), 1.11111111, 1.0, 1.0, realContributors, realFieldChanges)

  test("golden: REAL_CHANGE human is REDACTED by default (direction + share)") {
    val out = Report.human(realOutcome, cfg)
    val expected =
      """graft verify — keyed diff by 'url'
        |Alignment: key (url)
        |Columns: 3 in scope (2 numeric, 1 text)
        |Settings: tolerance 0, threshold 95.0%, max contributors 25
        |Checked: 5,526,669 cells across 1,842,223 aligned rows
        |
        |REAL CHANGE — 2 contributor(s) cover 100.0% of total change 1.11111111
        |  1. https://host1.example.org/p/endoc-17 keep -90.0% of total change (cum 90.0%)
        |  2. https://host2.example.org/p/dedoc-4 ppl +10.0% of total change (cum 100.0%)
        |Field changes: 1
        |  https://host1.example.org/p/endoc-17 scrubbed_text: text differs
        |Max abs delta: 1
        |(values redacted; rerun with --explicit to print them)
        |""".stripMargin
    assert(out === expected)
  }

  test("golden: REAL_CHANGE human with --explicit prints ranked values") {
    val out = Report.human(realOutcome, cfg.copy(explicit = true))
    val expected =
      """graft verify — keyed diff by 'url'
        |Alignment: key (url)
        |Columns: 3 in scope (2 numeric, 1 text)
        |Settings: tolerance 0, threshold 95.0%, max contributors 25
        |Checked: 5,526,669 cells across 1,842,223 aligned rows
        |
        |REAL CHANGE — 2 contributor(s) cover 100.0% of total change 1.11111111
        |  1. https://host1.example.org/p/endoc-17 keep 1 -> 0 (-1, share 90.0%, cum 90.0%)
        |  2. https://host2.example.org/p/dedoc-4 ppl 120.5 -> 120.61111111 (+0.11111111, share 10.0%, cum 100.0%)
        |Field changes: 1
        |  https://host1.example.org/p/endoc-17 scrubbed_text: a -> b
        |Max abs delta: 1
        |""".stripMargin
    assert(out === expected)
  }

  test("golden: row-order mode names the alignment and id semantics") {
    val out = Report.human(Outcome.NoRealChange(counts, 0.0, 0.0),
      cfg.copy(key = graft.verify.DiffJob.RowKey, alignMode = "row_order"))
    assert(out.startsWith(
      """graft verify — row-order diff (positional)
        |Alignment: row-order; contributor ids are 1-based row indexes
        |""".stripMargin))
    val js = Report.json(Outcome.NoRealChange(counts, 0.0, 0.0),
      cfg.copy(key = graft.verify.DiffJob.RowKey, alignMode = "row_order"))
    assert(js.contains(""""mode":"row_order""""))
    assert(js.contains(""""contributor_id":"row_index""""))
    assert(!js.contains(""""key":"""))
  }

  test("golden: REFUSAL human with Next line") {
    val out = Report.human(Outcome.Refused(RefusalCode.KeyDup,
      "pipeline side has 2 duplicated key value(s) in column 'url'; first: https://a/1 (2 occurrences)",
      Seq("https://a/1 x2", "https://b/2 x3"),
      "Next: deduplicate 'url' on the pipeline side (every url must be unique)."), cfg)
    val expected =
      """graft verify — keyed diff by 'url'
        |Alignment: key (url)
        |Columns: 3 in scope (2 numeric, 1 text)
        |Settings: tolerance 0, threshold 95.0%, max contributors 25
        |
        |REFUSAL (E_KEY_DUP): duplicate key values
        |  pipeline side has 2 duplicated key value(s) in column 'url'; first: https://a/1 (2 occurrences)
        |  - https://a/1 x2
        |  - https://b/2 x3
        |Next: deduplicate 'url' on the pipeline side (every url must be unique).
        |""".stripMargin
    assert(out === expected)
  }

  test("golden: JSON envelope for all three outcomes") {
    val noChange = Report.json(Outcome.NoRealChange(counts, 0.0, 0.0), cfg)
    assert(noChange ===
      """{"version":"graft.v0","mode":"key","key":"url","explicit":false,"tolerance":0,"threshold":0.95,"outcome":"no_real_change","exit_code":0,"counts":{"rows_ref":1842223,"rows_got":1842223,"rows_aligned":1842223,"numeric_columns":2,"text_columns":1,"cells_checked":5526669,"cells_changed":0},"max_abs_delta":0}""")

    val realOut = Outcome.RealChange(counts.copy(cellsChanged = 1), 1.0, 1.0, 1.0,
      Seq(Contributor("https://a/1", "keep", Some(1.0), Some(0.0), -1.0, 1.0, 1.0, 1.0)),
      Seq(FieldChange("https://a/1", "scrubbed_text", "a", "b")))
    // redacted default: direction + shares only, no raw values anywhere
    val realRedacted = Report.json(realOut, cfg)
    assert(realRedacted ===
      """{"version":"graft.v0","mode":"key","key":"url","explicit":false,"tolerance":0,"threshold":0.95,"outcome":"real_change","exit_code":1,"counts":{"rows_ref":1842223,"rows_got":1842223,"rows_aligned":1842223,"numeric_columns":2,"text_columns":1,"cells_checked":5526669,"cells_changed":1},"total_change":1,"max_abs_delta":1,"coverage":1,"contributors":[{"url":"u8:https://a/1","column":"keep","direction":"-","share":1,"cumulative_share":1}],"field_changes":[{"url":"u8:https://a/1","column":"scrubbed_text"}]}""")

    val realExplicit = Report.json(realOut, cfg.copy(explicit = true))
    assert(realExplicit ===
      """{"version":"graft.v0","mode":"key","key":"url","explicit":true,"tolerance":0,"threshold":0.95,"outcome":"real_change","exit_code":1,"counts":{"rows_ref":1842223,"rows_got":1842223,"rows_aligned":1842223,"numeric_columns":2,"text_columns":1,"cells_checked":5526669,"cells_changed":1},"total_change":1,"max_abs_delta":1,"coverage":1,"contributors":[{"url":"u8:https://a/1","column":"keep","old":1,"new":0,"delta":-1,"contribution":1,"share":1,"cumulative_share":1}],"field_changes":[{"url":"u8:https://a/1","column":"scrubbed_text","old":"a","new":"b"}]}""")

    val refusal = Report.json(Outcome.Refused(RefusalCode.Diffuse,
      "change is diffuse: top 25 cover 2.5% < 95.0%",
      Seq("top_k_coverage=0.025000"),
      "Next: rerun with exhaustive=true to list every changed cell."), cfg)
    assert(refusal ===
      """{"version":"graft.v0","mode":"key","key":"url","explicit":false,"tolerance":0,"threshold":0.95,"outcome":"refusal","exit_code":2,"refusal":{"code":"E_DIFFUSE","reason":"diffuse change below coverage threshold","message":"change is diffuse: top 25 cover 2.5% < 95.0%","detail":["top_k_coverage=0.025000"],"next":"Next: rerun with exhaustive=true to list every changed cell."}}""")
  }

  test("ledger row ids are content-addressed and verify") {
    import graft.ledger.{LedgerRow, RunLedger}
    val row = LedgerRow("", "run-x", "2026-08-16T00:00:00Z", "pipeline", 3,
      100L, 80L, 20L, "sha256:abc", "sha256:def", "xxxor:0011223344556677", "ok")
    val stamped = row.copy(id = RunLedger.contentId(row))
    assert(RunLedger.verifyLine(RunLedger.render(stamped)))
    val tampered = RunLedger.render(stamped).replace("\"rows_kept\":80", "\"rows_kept\":81")
    assert(!RunLedger.verifyLine(tampered))
  }
}
