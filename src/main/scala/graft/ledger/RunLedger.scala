package graft.ledger

import graft.core.Json
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Append-only run ledger — the grafted witness (reference op 38,
  * /root/reference/src/witness/: canonical JSON with sorted keys, a
  * content-addressed id = sha256 of the record with id="", append+fsync,
  * and the rule that ledger failures never change the verdict).
  *
  * One row per (run_id, stage, bucket) — this is the per-partition lineage
  * + metrics the north rule demands: at 10^12 docs every bucket's outcome
  * is auditable and the checkpoint layer can prove idempotent resume.
  */
final case class LedgerRow(
    id: String, // content-addressed, filled by append
    runId: String,
    ts: String, // ISO-8601 UTC
    stage: String, // "synth" | "pipeline" | "verify" | "diff"
    bucket: Int, // -1 = whole-run row
    rowsIn: Long,
    rowsKept: Long,
    rowsDropped: Long,
    paramsHash: String,
    scrubVersion: String,
    contentHash: String, // order-independent hash of the bucket's output
    outcome: String,
    // diff-stage provenance: input content hashes + exit code (reference
    // witnesses EVERY comparison run with hashes of both inputs,
    // /root/reference/src/lib.rs:250-251, witness/record.rs:8-27)
    inputs: Seq[String] = Seq.empty)

object RunLedger {

  def render(r: LedgerRow): String = Json.obj(
    // alphabetical field order = canonical form (id first, like the reference)
    "id" -> Json.esc(r.id),
    "bucket" -> r.bucket.toString,
    "content_hash" -> Json.esc(r.contentHash),
    "inputs" -> Json.arr(r.inputs.map(Json.esc)),
    "outcome" -> Json.esc(r.outcome),
    "params_hash" -> Json.esc(r.paramsHash),
    "rows_dropped" -> r.rowsDropped.toString,
    "rows_in" -> r.rowsIn.toString,
    "rows_kept" -> r.rowsKept.toString,
    "run_id" -> Json.esc(r.runId),
    "scrub_version" -> Json.esc(r.scrubVersion),
    "stage" -> Json.esc(r.stage),
    "ts" -> Json.esc(r.ts))

  /** Content-addressed id: sha256 of the record rendered with id="". */
  def contentId(r: LedgerRow): String =
    "sha256:" + graft.io.TableIO.sha256(render(r.copy(id = "")))

  /** Append rows to the JSONL ledger (append + force, like the reference's
    * append+fsync, ledger.rs:27-40). Failures are swallowed by callers —
    * the verdict never depends on the ledger write succeeding. */
  def append(path: String, rows: Seq[LedgerRow]): Seq[LedgerRow] = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val stamped = rows.map(r => r.copy(id = contentId(r)))
    val payload = stamped.map(render).mkString("", "\n", "\n")
    val ch = java.nio.channels.FileChannel.open(p,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE, StandardOpenOption.APPEND)
    try {
      ch.write(java.nio.ByteBuffer.wrap(payload.getBytes(StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
    stamped
  }

  /** Read every row (driver-side audit queries; small by construction). */
  def readAll(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(p)).asScala.toSeq
  }

  /** Witness-query filters (reference src/witness/query.rs:24): stage
    * equality, ISO-8601 ts range (lexicographic), outcome equality
    * (case-insensitive), content-hash/id substring, limit. */
  final case class Query(
      stage: Option[String] = None,
      since: Option[String] = None,
      until: Option[String] = None,
      outcome: Option[String] = None,
      hash: Option[String] = None,
      limit: Int = Int.MaxValue)

  private def field(line: String, name: String): Option[String] =
    Json.fieldStr(line, name)

  /** The inputs array's HASH entries only: elements of the form
    * `ref=<hash>` / `got=<hash>`, with the prefix stripped. Non-hash
    * entries (`exit=N`) are excluded so `--hash 0` cannot match every
    * diff row through its exit code. */
  private def inputHashes(line: String): Seq[String] =
    """"inputs":\[([^\]]*)\]""".r.findFirstMatchIn(line).map(_.group(1)) match {
      case None => Seq.empty
      case Some(body) =>
        """"(?:ref|got)=((?:[^"\\]|\\.)*)"""".r
          .findAllMatchIn(body).map(_.group(1)).toSeq
    }

  def matches(line: String, q: Query): Boolean =
    q.stage.forall(s => field(line, "stage").contains(s)) &&
      q.since.forall(s => field(line, "ts").exists(_ >= s)) &&
      q.until.forall(u => field(line, "ts").exists(_ <= u)) &&
      q.outcome.forall(o => field(line, "outcome").exists(_.equalsIgnoreCase(o))) &&
      // --hash matches the output content hash, the row id, or (diff rows)
      // either INPUT's hash — "which runs consumed this input?" is the
      // audit question the diff witness exists to answer
      q.hash.forall(h => field(line, "content_hash").exists(_.contains(h)) ||
        field(line, "id").exists(_.contains(h)) ||
        inputHashes(line).exists(_.contains(h)))

  def query(path: String, q: Query): Seq[String] =
    readAll(path).filter(matches(_, q)).take(q.limit)

  /** Verify a row's content-addressed id (the auditability contract). */
  def verifyLine(line: String): Boolean = {
    val idRe = """"id":"([^"]+)"""".r
    idRe.findFirstMatchIn(line) match {
      case Some(m) =>
        val claimed = m.group(1)
        val blanked = line.replaceFirst(
          """"id":"[^"]+"""", "\"id\":\"\"")
        claimed == "sha256:" + graft.io.TableIO.sha256(blanked)
      case None => false
    }
  }

  def nowIso(): String =
    java.time.format.DateTimeFormatter.ISO_INSTANT
      .format(java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
}
