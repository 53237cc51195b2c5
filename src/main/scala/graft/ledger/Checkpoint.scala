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

  final case class BucketManifest(
      bucket: Int,
      paramsHash: String,
      rowsIn: Long,
      rowsKept: Long,
      contentHash: String)

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
      "content_hash" -> Json.esc(m.contentHash))
    Files.write(path(outRoot, m.bucket), body.getBytes(StandardCharsets.UTF_8))
  }

  def read(outRoot: String, bucket: Int): Option[BucketManifest] = {
    val p = path(outRoot, bucket)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      def grpS(k: String) = (s""""$k":"([^"]*)"""").r.findFirstMatchIn(s).map(_.group(1))
      def grpN(k: String) = (s""""$k":(-?\\d+)""").r.findFirstMatchIn(s).map(_.group(1).toLong)
      for {
        ph <- grpS("params_hash"); ch <- grpS("content_hash")
        ri <- grpN("rows_in"); rk <- grpN("rows_kept")
      } yield BucketManifest(bucket, ph, ri, rk, ch)
    }
  }

  /** Buckets whose manifest verifies against the given params hash. */
  def completed(outRoot: String, buckets: Seq[Int], paramsHash: String): Set[Int] =
    buckets.filter(b => read(outRoot, b).exists(_.paramsHash == paramsHash)).toSet

  def invalidate(outRoot: String, bucket: Int): Unit =
    Files.deleteIfExists(path(outRoot, bucket))
}
