package graft.verify

import graft.core.{Json, Outcome}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Self-contained replay capsule for the DIFF path (reference
  * `--capsule-out`, src/orchestrator/capsule.rs:128-372): a directory with
  * copies of both inputs, the machine report, an executable `replay.sh`,
  * and a manifest binding the command line to the report's content hash —
  * so a verdict can be re-run and checked long after the original input
  * paths are gone.
  *
  * Layout:
  *   inputs/ref[.csv]   copy of the reference input (file or parquet dir)
  *   inputs/got[.csv]   copy of the candidate input
  *   [inputs/profile.yaml] copy of --profile, when one was used
  *   report.json        Report.json(outcome, cfg) — deterministic bytes
  *   manifest.json      flags + outcome word + exit code + report sha256
  *   replay.sh          executable re-run script (drives `replay-capsule`)
  */
object DiffCapsule {

  /** Capsule-relative name for an input: the CSV front door dispatches on
    * the `.csv` suffix, so it must survive the copy. */
  private def inputName(role: String, srcPath: String): String =
    if (srcPath.endsWith(".csv")) s"inputs/$role.csv" else s"inputs/$role"

  private def copyRec(src: Path, dst: Path): Unit = {
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      graft.io.TableIO.listDir(src).foreach(e => copyRec(e, dst.resolve(e.getFileName)))
    } else {
      if (dst.getParent != null) Files.createDirectories(dst.getParent)
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Write the capsule. `flags` are the diff's CLI flags with
    * --capsule-out/--ledger stripped and --profile rewritten to the
    * capsule-local copy. Returns the capsule dir. */
  def writeDiff(
      dir: String,
      refPath: String,
      gotPath: String,
      rawFlags: Seq[String],
      outcome: Outcome,
      cfg: DiffConfig): Path = {
    val root = Paths.get(dir)
    Files.createDirectories(root.resolve("inputs"))
    val refRel = inputName("ref", refPath)
    val gotRel = inputName("got", gotPath)
    copyRec(Paths.get(refPath), root.resolve(refRel))
    copyRec(Paths.get(gotPath), root.resolve(gotRel))
    // Self-containedness for profiles: RESOLVE the profile exactly like
    // the run did (path or id selector, column_registry folded in) and
    // store the resolved form — replay must never need the original
    // profile file, registry directory, or --profile-dir to still exist.
    // If resolution fails (the run refused on it), the flags pass through
    // verbatim: the capsule then reproduces the refusal only while the
    // broken environment persists, which is the refusal's own semantics.
    def flagVal(name: String): Option[String] =
      rawFlags.sliding(2).collectFirst { case Seq(n, v) if n == name => v }
    val resolvedProfile: Option[Profile] =
      ((flagVal("--profile"), flagVal("--profile-id")) match {
        case (Some(path), None) => Profile.load(path).toOption
        case (None, Some(id)) =>
          Profile.resolveId(id, flagVal("--profile-dir").getOrElse("profiles")).toOption
        case _ => None
      // a name the unquoted-YAML renderer cannot round-trip (':', '#',
      // edge whitespace) must NOT be stored as a silently-diverging copy
      }).filter(Profile.renderableResolved)
    resolvedProfile.foreach(p =>
      Files.write(root.resolve("inputs/profile.yaml"),
        Profile.renderResolved(p).getBytes(StandardCharsets.UTF_8)))
    // strip capsule/ledger selectors; replace any resolved profile
    // selector with the capsule-local resolved copy
    val flags = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < rawFlags.length) {
      rawFlags(i) match {
        case "--capsule-out" | "--ledger" => i += 2
        case "--profile" | "--profile-id" | "--profile-dir"
            if resolvedProfile.isDefined => i += 2
        case f => flags += f; i += 1
      }
    }
    if (resolvedProfile.isDefined) flags += "--profile" += "inputs/profile.yaml"
    val report = Report.json(outcome, cfg)
    Files.write(root.resolve("report.json"),
      report.getBytes(StandardCharsets.UTF_8))
    // artifact hashes are of the CAPSULE COPIES (reference manifests hash
    // their artifacts too, capsule.rs:128-372): replay verifies them
    // before re-running, separating "capsule corrupted" from "code
    // regressed"
    val manifest = Json.obj(
      "version" -> Json.esc("graft.capsule.v0"),
      "ref" -> Json.esc(refRel),
      "got" -> Json.esc(gotRel),
      "ref_hash" -> Json.esc(graft.ledger.Witness.inputHash(
        root.resolve(refRel).toString, rawFlags.contains("--deep-hash"))),
      "got_hash" -> Json.esc(graft.ledger.Witness.inputHash(
        root.resolve(gotRel).toString, rawFlags.contains("--deep-hash"))),
      "flags" -> Json.arr(flags.toSeq.map(Json.esc)),
      "outcome" -> Json.esc(graft.ledger.Witness.outcomeWord(outcome)),
      "exit_code" -> outcome.exitCode.toString,
      "report_sha256" -> Json.esc(graft.io.TableIO.sha256(report)))
    Files.write(root.resolve("manifest.json"),
      manifest.getBytes(StandardCharsets.UTF_8))
    val replaySh =
      """#!/bin/sh
        |# Replays this capsule: re-runs the captured diff against the capsule's
        |# own input copies and verifies the report hash (exit 0 = reproduced).
        |# Usage: replay.sh [path-to-graft-repo]
        |REPO="${1:-.}"
        |DIR="$(cd "$(dirname "$0")" && pwd)"
        |cd "$REPO" && exec sbt -batch "runMain graft.Main replay-capsule $DIR"
        |""".stripMargin
    val sh = root.resolve("replay.sh")
    Files.write(sh, replaySh.getBytes(StandardCharsets.UTF_8))
    try {
      import scala.jdk.CollectionConverters._
      Files.setPosixFilePermissions(sh,
        java.nio.file.attribute.PosixFilePermissions.fromString("rwxr-xr-x")
          .asScala.asJava)
    } catch { case _: UnsupportedOperationException => () }
    root
  }

  final case class Manifest(
      ref: String,
      got: String,
      flags: Seq[String],
      outcome: String,
      exitCode: Int,
      reportSha256: String,
      refHash: Option[String] = None,
      gotHash: Option[String] = None)

  /** The flags array's body, found by walking the characters with
    * string/escape state — a `]` INSIDE an escaped flag value (a column
    * list, a path) must not terminate the array, which the naive
    * `\[[^\]]*\]` regex got wrong (it silently dropped trailing flags and
    * replayed with a different config). */
  private def flagsArrayBody(s: String): Option[String] = {
    val start = s.indexOf("\"flags\":[")
    if (start < 0) return None
    val from = start + "\"flags\":[".length
    var i = from
    var inStr = false
    var esc = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (esc) esc = false
      else if (inStr && c == '\\') esc = true
      else if (c == '"') inStr = !inStr
      else if (!inStr && c == ']') return Some(s.substring(from, i))
      i += 1
    }
    None
  }

  def readManifest(dir: String): Option[Manifest] = {
    val p = Paths.get(dir, "manifest.json")
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    val flags = flagsArrayBody(s)
      .map(body => """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(body)
        .map(g => Json.unesc(g.group(1))).toSeq)
      .getOrElse(Seq.empty)
    for {
      ref <- Json.fieldStr(s, "ref"); got <- Json.fieldStr(s, "got")
      out <- Json.fieldStr(s, "outcome")
      ec <- Json.fieldNum(s, "exit_code")
      rh <- Json.fieldStr(s, "report_sha256")
    } yield Manifest(ref, got, flags, out, ec.toInt, rh,
      Json.fieldStr(s, "ref_hash"), Json.fieldStr(s, "got_hash"))
  }

  /** Integrity check of the capsule's own input copies against the
    * manifest's artifact hashes. None = manifest predates the hashes. */
  def verifyInputs(dir: String, m: Manifest): Option[String] = {
    def check(role: String, rel: String, expect: Option[String]): Option[String] =
      expect.flatMap { h =>
        // re-hash with the SCHEME the manifest recorded, so a capsule
        // written under --deep-hash verifies against the same identity
        val actual = graft.ledger.Witness.inputHash(
          s"$dir/$rel", deep = h.startsWith("manifest-full:"))
        if (actual == h) None
        else Some(s"$role copy hash mismatch: manifest $h, actual $actual")
      }
    check("ref", m.ref, m.refHash).orElse(check("got", m.got, m.gotHash))
  }
}
