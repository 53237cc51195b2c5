package graft.ledger

import graft.core.Outcome
import graft.verify.DiffConfig
import java.nio.file.{Files, Path, Paths}

/** Witness rows for diff/e2e verdict runs — the reference appends a
  * witness record for EVERY comparison run carrying content hashes of both
  * inputs (/root/reference/src/lib.rs:250-251, witness/record.rs:8-27),
  * and a witness failure never changes the verdict (witness/mod.rs:15-26).
  *
  * The grafted row: stage="diff", inputs=[ref=<hash>, got=<hash>,
  * exit=<code>], params_hash = sha256 of the full DiffConfig, outcome =
  * the report envelope's outcome word ("no_real_change" | "real_change" |
  * "refusal:E_CODE"), row counts from the diff's counts block when the
  * outcome carries one.
  */
object Witness {

  /** Content hash of a diff input: a file hashes its bytes (`sha256:`);
    * a directory (parquet table) hashes its sorted manifest of
    * (relative-name : size : tail-bytes sha) entries, prefixed
    * `manifest2:sha256:` so the scheme is visible in the recorded string
    * and a future scheme change can never be mistaken for an input
    * change. The tail hash makes the identity footer-sensitive without a
    * full scan: a parquet file's footer (row-group stats, offsets,
    * metadata) lives in its last bytes, so any rewrite that changes a
    * value visible to stats changes the manifest. HONEST LIMIT: a
    * same-size change confined to early data pages that leaves every
    * stat, offset, and tail byte identical is NOT detected — full-content
    * hashing is the trade-off rejected at table scale. When byte-level
    * certainty is wanted (small tables, audits), `deep = true`
    * (`--deep-hash` on the CLI) hashes every file's FULL content into the
    * manifest, recorded as `manifest-full:sha256:` — the scheme prefix
    * keeps the two identities unmistakable in the ledger. */
  def inputHash(path: String): String = inputHash(path, deep = false)

  def inputHash(path: String, deep: Boolean): String = {
    val p = Paths.get(path)
    try {
      if (Files.isDirectory(p)) {
        val listing = listRec(p, p, deep).sorted.mkString("\n")
        val scheme = if (deep) "manifest-full" else "manifest2"
        s"$scheme:sha256:" + graft.io.TableIO.sha256(listing)
      } else if (Files.isRegularFile(p)) {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        "sha256:" + md.digest(Files.readAllBytes(p))
          .map("%02x".format(_)).mkString
      } else "absent"
    } catch { case scala.util.control.NonFatal(_) => "unhashable" }
  }

  private def listRec(root: Path, dir: Path, deep: Boolean): Seq[String] =
    graft.io.TableIO.listDir(dir).flatMap { e =>
      if (Files.isDirectory(e)) listRec(root, e, deep)
      else if (e.getFileName.toString.endsWith(".crc")) Seq.empty
      else {
        val h = if (deep) fullHash(e) else tailHash(e)
        Seq(s"${root.relativize(e)}:${Files.size(e)}:$h")
      }
    }

  /** sha256 (first 16 hex chars) of the file's FULL bytes, streamed in
    * 1 MiB chunks — never the whole file in memory. */
  private def fullHash(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 20)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
      md.digest().map("%02x".format(_)).mkString.take(16)
    } finally in.close()
  }

  /** sha256 (first 16 hex chars) of the file's LAST 64 KiB; for small
    * files the tail is the whole file. */
  private def tailHash(p: Path): String = {
    val size = Files.size(p)
    val n = math.min(size, 65536L).toInt
    val ch = java.nio.channels.FileChannel.open(
      p, java.nio.file.StandardOpenOption.READ)
    try {
      val buf = java.nio.ByteBuffer.allocate(n)
      ch.position(size - n)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(java.util.Arrays.copyOf(buf.array(), buf.position()))
        .map("%02x".format(_)).mkString.take(16)
    } finally ch.close()
  }

  def outcomeWord(outcome: Outcome): String = outcome match {
    case _: Outcome.NoRealChange => "no_real_change"
    case _: Outcome.RealChange => "real_change"
    case r: Outcome.Refused => s"refusal:${r.code.code}"
  }

  /** Append the diff witness row; failures are swallowed — the ledger
    * must never change the verdict. `refH`/`gotH` are input identities:
    * `inputHash(path)` for file/table inputs, or a deterministic inline
    * descriptor (e.g. "synth:1000") for in-memory e2e inputs. */
  def recordDiff(
      ledgerPath: String,
      runId: String,
      refH: String,
      gotH: String,
      cfg: DiffConfig,
      outcome: Outcome): Unit =
    try {
      val counts = outcome match {
        case n: Outcome.NoRealChange => Some(n.counts)
        case r: Outcome.RealChange => Some(r.counts)
        case _ => None
      }
      val row = LedgerRow(
        id = "",
        runId = runId,
        ts = RunLedger.nowIso(),
        stage = "diff",
        bucket = -1,
        rowsIn = counts.map(_.rowsRef).getOrElse(0L),
        rowsKept = counts.map(_.rowsAligned).getOrElse(0L),
        rowsDropped = counts.map(c => c.rowsGot - c.rowsAligned).getOrElse(0L),
        paramsHash = "sha256:" + graft.io.TableIO.sha256(cfg.toString),
        scrubVersion = "-",
        contentHash = "sha256:" + graft.io.TableIO.sha256(s"$refH|$gotH"),
        outcome = outcomeWord(outcome),
        inputs = Seq(
          s"ref=$refH",
          s"got=$gotH",
          s"exit=${outcome.exitCode}"))
      RunLedger.append(ledgerPath, Seq(row))
      ()
    } catch { case scala.util.control.NonFatal(_) => () }
}
