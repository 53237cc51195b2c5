package graft.ledger

import graft.core.Json
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Per-bucket checkpoint manifests (the grafted replay capsule, reference
  * op 39): a bucket is COMPLETE when a manifest exists whose params hash
  * matches the current run config. Resume = process only buckets without a
  * verifying manifest; re-running a completed range is a no-op (idempotent
  * by construction — outputs are written with dynamic partition overwrite,
  * so even a crash between write and manifest commit re-converges).
  */
object Checkpoint {

  /** A bucket's replay capsule (reference src/orchestrator/capsule.rs:
    * 128-372): counts + content hash PLUS the exact replay command line and
    * the artifact files the bucket produced, so an auditor can re-run and
    * verify the range without knowing the layout. */
  final case class BucketManifest(
      bucket: Int,
      paramsHash: String,
      rowsIn: Long,
      rowsKept: Long,
      contentHash: String,
      replayCommand: Option[String] = None,
      artifacts: Seq[String] = Seq.empty)

  private def dir(outRoot: String) = Paths.get(outRoot, "checkpoints")

  private def path(outRoot: String, bucket: Int) =
    dir(outRoot).resolve(f"bucket-$bucket%05d.json")

  def write(outRoot: String, m: BucketManifest): Unit = {
    Files.createDirectories(dir(outRoot))
    val body = Json.obj(
      "bucket" -> m.bucket.toString,
      "params_hash" -> Json.esc(m.paramsHash),
      "rows_in" -> m.rowsIn.toString,
      "rows_kept" -> m.rowsKept.toString,
      "content_hash" -> Json.esc(m.contentHash),
      "replay_command" -> Json.optStr(m.replayCommand),
      "artifacts" -> Json.arr(m.artifacts.map(Json.esc)))
    Files.write(path(outRoot, m.bucket), body.getBytes(StandardCharsets.UTF_8))
  }

  def read(outRoot: String, bucket: Int): Option[BucketManifest] = {
    val p = path(outRoot, bucket)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      def grpS(k: String) = Json.fieldStr(s, k)
      def grpN(k: String) = Json.fieldNum(s, k)
      val artifacts = """"artifacts":\[([^\]]*)\]""".r.findFirstMatchIn(s)
        .map(m => """"([^"]*)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
        .getOrElse(Seq.empty)
      for {
        ph <- grpS("params_hash"); ch <- grpS("content_hash")
        ri <- grpN("rows_in"); rk <- grpN("rows_kept")
      } yield BucketManifest(bucket, ph, ri, rk, ch,
        grpS("replay_command"), artifacts)
    }
  }

  /** Relative paths of a bucket's output files under outRoot. */
  def bucketArtifacts(outRoot: String, bucket: Int): Seq[String] = {
    val d = Paths.get(outRoot, "data", s"warc_bucket=$bucket")
    if (!Files.isDirectory(d)) Seq.empty
    else graft.io.TableIO.listDir(d) // closes the Files.list stream
      .map(p => s"data/warc_bucket=$bucket/${p.getFileName}")
      .filterNot(_.endsWith(".crc"))
      .sorted
  }

  /** Buckets whose manifest verifies against the given params hash. */
  def completed(outRoot: String, buckets: Seq[Int], paramsHash: String): Set[Int] =
    buckets.filter(b => read(outRoot, b).exists(_.paramsHash == paramsHash)).toSet

  def invalidate(outRoot: String, bucket: Int): Unit =
    Files.deleteIfExists(path(outRoot, bucket))
}
