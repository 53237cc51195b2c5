package graft

import graft.core.{Outcome, RefusalCode}
import graft.ledger.{LedgerRow, RunLedger}
import graft.verify.{DiffConfig, DiffJob, Profile}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CLI-surface parity locked at the component layer: witness-query
  * filters, profile key-conflict refusal, numeric key columns, and the
  * CSV quote-violation line number. */
class CliParitySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def row(stage: String, ts: String, outcome: String, bucket: Int) =
    LedgerRow("", "run-q", ts, stage, bucket, 10, 8, 2,
      "sha256:p", "v1", s"xxhash:$stage-$bucket", outcome)

  test("ledger query filters: stage/since/until/outcome/hash/limit") {
    val path = Files.createTempDirectory("graft-ledger").resolve("l.jsonl").toString
    val stamped = RunLedger.append(path, Seq(
      row("pipeline", "2026-08-01T00:00:00Z", "ok", 1),
      row("pipeline", "2026-08-02T00:00:00Z", "refused", 2),
      row("verify", "2026-08-03T00:00:00Z", "OK", 3),
      row("pipeline", "2026-08-04T00:00:00Z", "ok", 4)))

    def q(f: RunLedger.Query) = RunLedger.query(path, f)
    assert(q(RunLedger.Query(stage = Some("verify"))).size === 1)
    assert(q(RunLedger.Query(since = Some("2026-08-02T00:00:00Z"))).size === 3)
    assert(q(RunLedger.Query(until = Some("2026-08-02T00:00:00Z"))).size === 2)
    assert(q(RunLedger.Query(
      since = Some("2026-08-02T00:00:00Z"),
      until = Some("2026-08-03T23:59:59Z"))).size === 2)
    // case-insensitive outcome (reference eq_ignore_ascii_case)
    assert(q(RunLedger.Query(outcome = Some("ok"))).size === 3)
    assert(q(RunLedger.Query(outcome = Some("REFUSED"))).size === 1)
    // hash substring matches content_hash or the content-addressed id
    assert(q(RunLedger.Query(hash = Some("verify-3"))).size === 1)
    val idSub = stamped.head.id.stripPrefix("sha256:").take(12)
    assert(q(RunLedger.Query(hash = Some(idSub))).size === 1)
    assert(q(RunLedger.Query(limit = 2)).size === 2)
  }

  test("profile key conflicting with explicit --key refuses E_KEY_CONFLICT") {
    val p = Profile.parse("key: url\ninclude_columns:\n  - a\n  - b\n")
    Profile.resolveKey(Some("id"), p) match {
      case Left(r) => assert(r.code === RefusalCode.KeyConflict)
      case Right(_) => fail("expected E_KEY_CONFLICT")
    }
    assert(Profile.resolveKey(Some("url"), p) === Right(Some("url")))
    assert(Profile.resolveKey(None, p) === Right(Some("url")))
  }

  test("numeric (non-string) key column diffs instead of throwing") {
    val ref = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    val got = Seq((1L, 10.0), (2L, 21.0), (3L, 30.0)).toDF("id", "v")
    val cfg = DiffConfig(key = "id", numericCols = Seq("v"))
    DiffJob.run(spark, ref, got, cfg) match {
      case rc: Outcome.RealChange =>
        assert(rc.contributors.map(_.url) === Seq("2"))
      case o => fail(s"expected RealChange, got $o")
    }
    // key health on a numeric key: duplicates still refuse with evidence
    val dup = Seq((1L, 1.0), (1L, 2.0)).toDF("id", "v")
    DiffJob.run(spark, dup, dup, cfg) match {
      case r: Outcome.Refused => assert(r.code === RefusalCode.KeyDup)
      case o => fail(s"expected E_KEY_DUP, got $o")
    }
  }

  test("CSV quote violation reports the offending line, not the last line") {
    val comma = Some(','.toByte)
    val bad = "a,b\n1,2\n3,\"oops\"x\n5,6\n7,8\n"
    graft.sources.CsvFrontDoor.parse(bad.getBytes("UTF-8"), comma) match {
      case Left(r) =>
        assert(r.code === RefusalCode.CsvParse)
        assert(r.message.contains("line 3"), s"message was: ${r.message}")
      case Right(_) => fail("expected E_CSV_PARSE")
    }
    // unterminated quote: report the line the quote OPENED on
    val unterminated = "a,b\n1,\"never closed\n3,4\n5,6\n"
    graft.sources.CsvFrontDoor.parse(unterminated.getBytes("UTF-8"), comma) match {
      case Left(r) =>
        assert(r.code === RefusalCode.CsvParse)
        assert(r.message.contains("line 2"), s"message was: ${r.message}")
      case Right(_) => fail("expected E_CSV_PARSE")
    }
  }
}
