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

  test("diff runs are witnessed: stage=diff row, input hashes, verifiable id") {
    val dir = Files.createTempDirectory("graft-witness")
    val refCsv = dir.resolve("ref.csv")
    val gotCsv = dir.resolve("got.csv")
    Files.writeString(refCsv, "url,v\nu1,1\nu2,2\n")
    Files.writeString(gotCsv, "url,v\nu1,1\nu2,3\n")
    val ledger = dir.resolve("ledger.jsonl").toString

    val ref = Seq(("u1", 1.0), ("u2", 2.0)).toDF("url", "v")
    val got = Seq(("u1", 1.0), ("u2", 3.0)).toDF("url", "v")
    val cfg = DiffConfig(numericCols = Seq("v"))
    val outcome = DiffJob.run(spark, ref, got, cfg)
    val refH = graft.ledger.Witness.inputHash(refCsv.toString)
    val gotH = graft.ledger.Witness.inputHash(gotCsv.toString)
    graft.ledger.Witness.recordDiff(ledger, "diff-test", refH, gotH, cfg, outcome)

    // `ledger query --stage diff` finds the row; its content address verifies
    val rows = RunLedger.query(ledger, RunLedger.Query(stage = Some("diff")))
    assert(rows.size === 1)
    val line = rows.head
    assert(RunLedger.verifyLine(line))
    assert(line.contains("\"outcome\":\"real_change\""))
    assert(line.contains("exit=1"))
    assert(line.contains(s"ref=$refH") && line.contains(s"got=$gotH"))
    assert(refH.startsWith("sha256:"))
    assert(refH !== gotH)

    // a byte change in an input changes its recorded identity
    Files.writeString(gotCsv, "url,v\nu1,1\nu2,4\n")
    assert(graft.ledger.Witness.inputHash(gotCsv.toString) !== gotH)

    // directory (parquet table) inputs hash their file manifest
    val pq = dir.resolve("t_parquet").toString
    ref.coalesce(1).write.parquet(pq)
    // directory hashes carry a visible scheme id, so a future manifest
    // scheme change can never be mistaken for an input change
    assert(graft.ledger.Witness.inputHash(pq).startsWith("manifest2:sha256:"))

    // refusals are witnessed too, and never change the verdict flow
    val refused = graft.core.Outcome.Refused(RefusalCode.KeyDup, "dup", Seq.empty, "Next: x")
    graft.ledger.Witness.recordDiff(ledger, "diff-test2", refH, gotH, cfg, refused)
    val all = RunLedger.query(ledger, RunLedger.Query(stage = Some("diff")))
    assert(all.size === 2)
    assert(all.last.contains("\"outcome\":\"refusal:E_KEY_DUP\""))
    assert(all.last.contains("exit=2"))
    // ledger-verify parity: every row's content address checks out
    assert(RunLedger.readAll(ledger).forall(RunLedger.verifyLine))

    // "--hash <input hash>" answers "which runs consumed this input?"
    val byInput = RunLedger.query(ledger,
      RunLedger.Query(hash = Some(refH.stripPrefix("sha256:").take(16))))
    assert(byInput.size === 2)

    // directory identity is CONTENT-sensitive even at identical file
    // sizes (the tail-bytes hash; name+size alone would attest a
    // same-size rewrite as the identical input)
    val tbl = dir.resolve("tbl")
    Files.createDirectories(tbl)
    Files.write(tbl.resolve("part-0"), "AAAA".getBytes("UTF-8"))
    val hTbl = graft.ledger.Witness.inputHash(tbl.toString)
    Files.write(tbl.resolve("part-0"), "AAAB".getBytes("UTF-8"))
    assert(graft.ledger.Witness.inputHash(tbl.toString) !== hTbl)
  }

  test("witness hash distinguishes same-size parquet rewrites (footer tail)") {
    // the exact scenario the tail-hash exists for: a numeric value change
    // that preserves every file's byte length still changes the parquet
    // footer (row-group stats), so the directory identity must change
    val dir = Files.createTempDirectory("graft-pqhash")
    val t1 = dir.resolve("t1").toString
    val t2 = dir.resolve("t2").toString
    Seq(("u1", 2L), ("u2", 5L)).toDF("url", "v").coalesce(1).write.parquet(t1)
    Seq(("u1", 3L), ("u2", 5L)).toDF("url", "v").coalesce(1).write.parquet(t2)
    val f1 = graft.io.TableIO.listDir(java.nio.file.Paths.get(t1))
      .filter(_.toString.endsWith(".parquet")).map(java.nio.file.Files.size(_))
    val f2 = graft.io.TableIO.listDir(java.nio.file.Paths.get(t2))
      .filter(_.toString.endsWith(".parquet")).map(java.nio.file.Files.size(_))
    assert(f1 === f2, "fixture invalid: file sizes differ, test proves nothing")
    // same sizes, different values -> identities must differ (rename the
    // part files to a common name so only CONTENT distinguishes them)
    def normalizeNames(t: String): Unit =
      graft.io.TableIO.listDir(java.nio.file.Paths.get(t)).foreach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".parquet"))
          Files.move(p, p.resolveSibling("part-0.parquet"))
        else if (n != "_SUCCESS") Files.deleteIfExists(p)
      }
    normalizeNames(t1)
    normalizeNames(t2)
    assert(graft.ledger.Witness.inputHash(t1) !== graft.ledger.Witness.inputHash(t2))
  }

  test("--deep-hash distinguishes early-page rewrites the tail hash misses") {
    // the documented limit of the default footer-and-tail scheme: a
    // same-size change confined to EARLY bytes (an early data page) with
    // the last 64 KiB untouched is invisible to manifest2 — and exactly
    // what manifest-full (--deep-hash) exists to catch
    val dir = Files.createTempDirectory("graft-deephash")
    val t1 = dir.resolve("t1"); val t2 = dir.resolve("t2")
    Files.createDirectories(t1); Files.createDirectories(t2)
    val bytes = Array.fill[Byte](128 * 1024)(0x41)
    Files.write(t1.resolve("part-0"), bytes)
    val mutated = bytes.clone()
    mutated(10) = 0x42 // 128 KiB file: offset 10 is outside the 64 KiB tail
    Files.write(t2.resolve("part-0"), mutated)
    assert(graft.ledger.Witness.inputHash(t1.toString)
      === graft.ledger.Witness.inputHash(t2.toString),
      "fixture invalid: the tail hash saw the early change, test proves nothing")
    val d1 = graft.ledger.Witness.inputHash(t1.toString, deep = true)
    val d2 = graft.ledger.Witness.inputHash(t2.toString, deep = true)
    assert(d1.startsWith("manifest-full:sha256:"), "deep scheme must be visible in-band")
    assert(d1 !== d2, "deep hash must distinguish the early-page rewrite")

    // the deep identity flows into the witness row and stays queryable:
    // a diff witnessed under --deep-hash answers `ledger query --hash`
    // by its manifest-full hash
    val ledger = dir.resolve("ledger.jsonl").toString
    val cfg = graft.verify.DiffConfig(numericCols = Seq("v"), textCols = Seq.empty)
    val outcome = graft.core.Outcome.NoRealChange(
      graft.core.DiffCounts(1, 1, 1, 1, 0, 1, 0), 0.0, 0.0)
    graft.ledger.Witness.recordDiff(ledger, "diff-deep", d1, d2, cfg, outcome)
    val hit = RunLedger.query(ledger,
      RunLedger.Query(hash = Some(d1.stripPrefix("manifest-full:sha256:").take(16))))
    assert(hit.size === 1 && hit.head.contains("manifest-full:sha256:"))
  }

  test("malformed flag values are usage errors (exit 2 path), never bare throws") {
    // a DEDICATED UsageError type: engine-internal IllegalArgumentExceptions
    // (Scala require, Spark) must never masquerade as clean usage refusals
    val e = intercept[Main.UsageError] {
      Main.runDiffCommand(spark, "/none/a.csv", "/none/b.csv",
        List("--tolerance", "abc"))
    }
    assert(e.getMessage.contains("--tolerance"))
    val e2 = intercept[Main.UsageError] {
      Main.runDiffCommand(spark, "/none/a.csv", "/none/b.csv",
        List("--delimiter", ""))
    }
    assert(e2.getMessage.contains("--delimiter"))
    val e3 = intercept[Main.UsageError] {
      Main.runDiffCommand(spark, "/none/a.csv", "/none/b.csv",
        List("--max-audit-changes", "1e4"))
    }
    assert(e3.getMessage.contains("--max-audit-changes"))
  }

  test("unresolvable-to-YAML profiles are never stored as diverging copies") {
    // ':' and '#' cannot survive the unquoted-YAML round-trip
    import graft.verify.Profile
    assert(Profile.renderableResolved(
      Profile(Some(Seq("keep")), Some("url"), Map("kept" -> "keep"))))
    assert(!Profile.renderableResolved(
      Profile(None, Some("url"), Map("a:b" -> "keep"))))
    assert(!Profile.renderableResolved(
      Profile(None, Some("col#1"), Map.empty)))
    assert(!Profile.renderableResolved(
      Profile(Some(Seq(" padded ")), None, Map.empty)))
    // and a renderable one genuinely round-trips through parse
    val p = Profile(Some(Seq("keep", "v")), Some("url"),
      Map("kept" -> "keep", "val" -> "v"))
    val back = Profile.parse(Profile.renderResolved(p))
    assert(back.key === p.key)
    assert(back.includeColumns === p.includeColumns)
    assert(back.aliases === p.aliases)
  }

  test("capsule from --profile-id survives deletion of the profile directory") {
    val dir = Files.createTempDirectory("graft-capsule-pid")
    val refCsv = dir.resolve("ref.csv")
    val gotCsv = dir.resolve("got.csv")
    Files.writeString(refCsv, "url,kept,v\nu1,1,10\nu2,0,20\n")
    Files.writeString(gotCsv, "url,kept,v\nu1,1,10\nu2,0,20\n")
    // profile resolved BY ID from a directory, with a column_registry
    val profDir = dir.resolve("profiles")
    val reg = profDir.resolve("reg")
    Files.createDirectories(reg)
    Files.writeString(reg.resolve("registry.json"), """{"version":1}""")
    Files.writeString(reg.resolve("cols.json"),
      """[{"canonical_type":"column_name","canonical":"keep","aliases":["kept"]}]""")
    Files.writeString(profDir.resolve("p.yaml"),
      "profile_id: demo.v1\nkey: url\ninclude_columns:\n  - keep\ncolumn_registry: reg\n")
    val capDir = dir.resolve("cap").toString
    val rest = List("--numeric", "keep,v", "--profile-id", "demo.v1",
      "--profile-dir", profDir.toString, "--capsule-out", capDir)

    val (outcome, cfg) = Main.runDiffCommand(spark, refCsv.toString, gotCsv.toString, rest)
    assert(outcome.isInstanceOf[graft.core.Outcome.NoRealChange], s"got $outcome")
    graft.verify.DiffCapsule.writeDiff(capDir, refCsv.toString, gotCsv.toString,
      rest, outcome, cfg)
    val m = graft.verify.DiffCapsule.readManifest(capDir).get
    // selector flags replaced by the capsule-local RESOLVED profile
    assert(!m.flags.contains("--profile-id") && !m.flags.contains("--profile-dir"))
    assert(m.flags.containsSlice(Seq("--profile", "inputs/profile.yaml")))
    val stored = Files.readString(java.nio.file.Paths.get(capDir, "inputs/profile.yaml"))
    assert(stored.contains("kept: keep"), s"registry alias not folded in:\n$stored")

    // delete the ORIGINAL profile machinery entirely; replay from the capsule
    def rmRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) graft.io.TableIO.listDir(p).foreach(rmRec)
      Files.deleteIfExists(p)
    }
    rmRec(profDir)
    Files.delete(refCsv)
    Files.delete(gotCsv)
    val flags = m.flags.map(f => if (f.startsWith("inputs/")) s"$capDir/$f" else f).toList
    val (outcome2, cfg2) =
      Main.runDiffCommand(spark, s"$capDir/${m.ref}", s"$capDir/${m.got}", flags)
    assert(graft.ledger.Witness.outcomeWord(outcome2) === m.outcome)
    assert(graft.io.TableIO.sha256(graft.verify.Report.json(outcome2, cfg2))
      === m.reportSha256)
  }

  test("diff capsule round-trips: self-contained inputs, replay reproduces report") {
    val dir = Files.createTempDirectory("graft-capsule")
    val refCsv = dir.resolve("ref.csv")
    val gotCsv = dir.resolve("got.csv")
    Files.writeString(refCsv, "url,v\nu1,1\nu2,2\n")
    Files.writeString(gotCsv, "url,v\nu1,1\nu2,3\n")
    val capDir = dir.resolve("cap").toString
    val rest = List("--key", "url", "--capsule-out", capDir, "--ledger", "unused.jsonl")

    val (outcome, cfg) = Main.runDiffCommand(spark, refCsv.toString, gotCsv.toString, rest)
    val cap = graft.verify.DiffCapsule.writeDiff(
      capDir, refCsv.toString, gotCsv.toString, rest, outcome, cfg)

    // manifest binds command, outcome, exit code, report hash; capsule and
    // ledger selectors are stripped from the replayable flags
    val m = graft.verify.DiffCapsule.readManifest(cap.toString).get
    assert(m.outcome === "real_change")
    assert(m.exitCode === 1)
    assert(m.flags === Seq("--key", "url"))
    assert(Files.exists(cap.resolve("report.json")))
    assert(Files.isExecutable(cap.resolve("replay.sh")))

    // self-containedness: delete the ORIGINAL inputs, replay from the copies
    Files.delete(refCsv)
    Files.delete(gotCsv)
    val flags = m.flags.map(f => if (f.startsWith("inputs/")) s"$cap/$f" else f).toList
    val (outcome2, cfg2) =
      Main.runDiffCommand(spark, s"$cap/${m.ref}", s"$cap/${m.got}", flags)
    assert(graft.ledger.Witness.outcomeWord(outcome2) === m.outcome)
    assert(graft.io.TableIO.sha256(graft.verify.Report.json(outcome2, cfg2))
      === m.reportSha256)

    // manifest artifact hashes verify the copies; a corrupted copy is
    // detected BEFORE replay (never misread as a code regression)
    assert(graft.verify.DiffCapsule.verifyInputs(cap.toString, m).isEmpty)
    Files.writeString(cap.resolve(m.got), "url,v\nu1,1\nu2,999\n")
    val bad = graft.verify.DiffCapsule.verifyInputs(cap.toString, m)
    assert(bad.exists(_.contains("got copy hash mismatch")), s"was: $bad")
  }

  test("diff capsule round-trips parquet inputs and a --profile copy") {
    val dir = Files.createTempDirectory("graft-capsule-pq")
    val refPq = dir.resolve("ref_tbl").toString
    val gotPq = dir.resolve("got_tbl").toString
    Seq(("u1", 10.0, 1), ("u2", 20.0, 2)).toDF("url", "v", "extra")
      .coalesce(1).write.parquet(refPq)
    Seq(("u1", 10.0, 9), ("u2", 20.0, 9)).toDF("url", "v", "extra")
      .coalesce(1).write.parquet(gotPq)
    // profile scopes the diff to v — the 'extra' difference must not count
    val prof = dir.resolve("p.yaml")
    Files.writeString(prof, "key: url\ninclude_columns:\n  - v\n")
    val capDir = dir.resolve("cap").toString
    val rest = List("--numeric", "v,extra", "--profile", prof.toString,
      "--capsule-out", capDir)

    val (outcome, cfg) = Main.runDiffCommand(spark, refPq, gotPq, rest)
    assert(outcome.isInstanceOf[graft.core.Outcome.NoRealChange],
      s"profile scoping failed: $outcome")
    graft.verify.DiffCapsule.writeDiff(capDir, refPq, gotPq, rest, outcome, cfg)

    val m = graft.verify.DiffCapsule.readManifest(capDir).get
    assert(m.outcome === "no_real_change")
    // the profile was copied in and the flag rewritten to the local copy
    assert(m.flags.containsSlice(Seq("--profile", "inputs/profile.yaml")))
    assert(Files.exists(java.nio.file.Paths.get(capDir, "inputs/profile.yaml")))

    // self-contained: delete originals (tables AND profile), replay
    def rmRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) graft.io.TableIO.listDir(p).foreach(rmRec)
      Files.deleteIfExists(p)
    }
    rmRec(java.nio.file.Paths.get(refPq))
    rmRec(java.nio.file.Paths.get(gotPq))
    Files.delete(prof)
    val flags = m.flags.map(f => if (f.startsWith("inputs/")) s"$capDir/$f" else f).toList
    val (outcome2, cfg2) =
      Main.runDiffCommand(spark, s"$capDir/${m.ref}", s"$capDir/${m.got}", flags)
    assert(graft.ledger.Witness.outcomeWord(outcome2) === m.outcome)
    assert(graft.io.TableIO.sha256(graft.verify.Report.json(outcome2, cfg2))
      === m.reportSha256)
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

  test("profile column_registry: loads aliases, refuses on broken registry") {
    val dir = Files.createTempDirectory("graft-profiles")
    val reg = dir.resolve("reg")
    Files.createDirectories(reg)
    Files.writeString(reg.resolve("registry.json"), """{"version":1}""")
    Files.writeString(reg.resolve("columns.json"),
      """[{"canonical_type":"column_name","canonical":"keep","aliases":["kept","keep_flag"]},
        |{"canonical_type":"other","canonical":"x","aliases":["y"]}]""".stripMargin)
    val profPath = dir.resolve("p.yaml")
    Files.writeString(profPath,
      "profile_id: csv.demo.v0\nkey: url\ncolumn_registry: reg\n")

    // load by path: registry aliases resolved (column_name entries only)
    val p = Profile.load(profPath.toString).toOption.get
    assert(p.aliases === Map("kept" -> "keep", "keep_flag" -> "keep"))

    // resolve by profile_id in the directory
    val byId = Profile.resolveId("csv.demo.v0", dir.toString).toOption.get
    assert(byId.key === Some("url"))
    assert(Profile.resolveId("no.such.id", dir.toString).isLeft)

    // aliases actually rename columns for the diff
    val df = Seq(("u1", 1)).toDF("url", "kept")
    assert(Profile.applyAliases(df, p).columns.toSeq === Seq("url", "keep"))

    // JSON objects are unordered: an entry written canonical-first must
    // load identically (the old parse required one exact key order)
    Files.writeString(reg.resolve("columns.json"),
      """[{"canonical":"keep","aliases":["kept","keep_flag"],"canonical_type":"column_name"},
        |{"aliases":["y"],"canonical_type":"other","canonical":"x"}]""".stripMargin)
    val reordered = Profile.load(profPath.toString).toOption.get
    assert(reordered.aliases === Map("kept" -> "keep", "keep_flag" -> "keep"))
    // an entry genuinely missing a required key refuses, naming the file
    Files.writeString(reg.resolve("columns.json"),
      """[{"canonical":"keep","aliases":["kept"]}]""")
    Profile.load(profPath.toString) match {
      case Left(r) =>
        assert(r.code === RefusalCode.ProfileRegistry)
        assert(r.detail.exists(_.contains("columns.json")))
      case Right(_) => fail("expected E_PROFILE_REGISTRY for missing key")
    }
    // restore the well-formed registry for the checks below
    Files.writeString(reg.resolve("columns.json"),
      """[{"canonical_type":"column_name","canonical":"keep","aliases":["kept","keep_flag"]},
        |{"canonical_type":"other","canonical":"x","aliases":["y"]}]""".stripMargin)

    // broken registry: missing dir, missing registry.json, bad mapping file
    Files.writeString(dir.resolve("broken1.yaml"),
      "profile_id: b1\ncolumn_registry: nope\n")
    Profile.resolveId("b1", dir.toString) match {
      case Left(r) => assert(r.code === RefusalCode.ProfileRegistry)
      case Right(_) => fail("expected E_PROFILE_REGISTRY")
    }
    val reg2 = dir.resolve("reg2")
    Files.createDirectories(reg2)
    Files.writeString(reg2.resolve("registry.json"), """{"version":1}""")
    Files.writeString(reg2.resolve("bad.json"), """{"not":"an array"}""")
    Files.writeString(dir.resolve("broken2.yaml"),
      "profile_id: b2\ncolumn_registry: reg2\n")
    Profile.resolveId("b2", dir.toString) match {
      case Left(r) =>
        assert(r.code === RefusalCode.ProfileRegistry)
        assert(r.detail.exists(_.contains("bad.json")))
      case Right(_) => fail("expected E_PROFILE_REGISTRY")
    }
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
