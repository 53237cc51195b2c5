package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY plus typed
  * metadata, processed in batch form inside mapPartitions (the Scala
  * analogue of mapInPandas — one decoder instance per partition, rows
  * streamed through it).
  *
  * The actual codecs are STUBBED: no image/audio libraries exist in this
  * offline container, so `decode*` parse a deterministic synthetic
  * container format ("IMG1" magic + big-endian width/height + payload).
  * Everything Spark-side — schema, partitioning, batch shape, null
  * handling — is real and tested; swapping in javax.imageio/ffmpeg is a
  * kernel-local change.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, format: String, n_frames: Int)

  val Magic: Array[Byte] = "IMG1".getBytes("US-ASCII")

  /** Build a synthetic media payload (the test-data generator). */
  def synthMedia(seed: Long): Array[Byte] = {
    val width = (math.floorMod(seed, 640) + 16).toInt
    val height = (math.floorMod(seed * 31, 480) + 16).toInt
    val frames = (math.floorMod(seed, 7) + 1).toInt
    val payload = new Array[Byte]((math.floorMod(seed, 64) + 8).toInt)
    var i = 0
    while (i < payload.length) { payload(i) = ((seed + i) % 251).toByte; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 4 + payload.length)
    bb.put(Magic).putInt(width).putInt(height).putInt(frames).put(payload)
    bb.array()
  }

  /** STUB decoder — ??? in spirit: a real build replaces the body with
    * javax.imageio; the synthetic container keeps the contract testable. */
  def decodeMeta(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes == null || bytes.length < 16) return None
    var i = 0
    while (i < 4) { if (bytes(i) != Magic(i)) return None; i += 1 }
    val bb = java.nio.ByteBuffer.wrap(bytes, 4, 12)
    Some(MediaMeta(bb.getInt, bb.getInt, "img1", bb.getInt))
  }

  /** STUB resize: rewrites the header dims, keeps payload (a real impl
    * resamples pixels). Deterministic, shape-preserving. */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    decodeMeta(bytes) match {
      case Some(_) =>
        val out = bytes.clone()
        val bb = java.nio.ByteBuffer.wrap(out, 4, 8)
        bb.putInt(w).putInt(h)
        out
      case None => null
    }

  /** STUB feature extractor: deterministic hashed projection of the payload
    * into a dense vector (a real impl runs a vision tower here). */
  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      val h = graft.synth.SplitMix64.mix(bytes(i).toLong * 1315423911L + i)
      out(math.floorMod(h, dim).toInt) += 1.0f
      i += 1
    }
    out
  }

  /** STUB frame sampler: splits the payload into n_frames contiguous
    * slices (a real decoder seeks keyframes) and keeps every k-th frame —
    * the video analogue of the resize stub; the Spark-side plumbing
    * (binary → array<binary>, per-frame byte accounting) is real. */
  def sampleFrames(bytes: Array[Byte], everyK: Int): Array[Array[Byte]] =
    decodeMeta(bytes) match {
      case None => Array.empty
      case Some(m) =>
        val payload = java.util.Arrays.copyOfRange(bytes, 16, bytes.length)
        val n = m.n_frames
        (0 until n by everyK).map { i =>
          java.util.Arrays.copyOfRange(payload,
            i * payload.length / n, (i + 1) * payload.length / n)
        }.toArray
    }

  /** Batch metadata extraction over a binary column — one pass, no shuffle,
    * refusal-style null metadata for undecodable payloads. */
  def withMeta(spark: SparkSession, df: DataFrame, binCol: String): DataFrame = {
    import spark.implicits._
    val decodeUdf = udf((b: Array[Byte]) => decodeMeta(b))
    df.withColumn("media_meta", decodeUdf(col(binCol)))
      .withColumn("media_ok", $"media_meta".isNotNull)
  }
}
