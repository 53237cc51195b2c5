package graft

import graft.functions.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing: synthetic container round-trips,
  * stub decode refuses garbage instead of guessing, transforms preserve
  * the contract. */
class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("decode round-trips the synthetic container") {
    for (seed <- Seq(0L, 1L, 17L, 639L, 100000L)) {
      val meta = Multimodal.decodeMeta(Multimodal.synthMedia(seed)).get
      assert(meta.width === (seed % 640 + 16).toInt)
      assert(meta.height === ((seed * 31) % 480 + 16).toInt)
      assert(meta.n_frames === (seed % 7 + 1).toInt)
      assert(meta.format === "img1")
    }
  }

  test("decode refuses garbage and null (no guessing)") {
    assert(Multimodal.decodeMeta(null).isEmpty)
    assert(Multimodal.decodeMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeMeta("NOTMAGIC0123456789".getBytes).isEmpty)
  }

  test("resize rewrites dims, preserves payload length") {
    val in = Multimodal.synthMedia(42L)
    val out = Multimodal.resize(in, 128, 64)
    assert(out.length === in.length)
    val meta = Multimodal.decodeMeta(out).get
    assert(meta.width === 128 && meta.height === 64)
    assert(Multimodal.resize("junk".getBytes, 1, 1) === null)
  }

  test("frame sampling keeps every k-th contiguous slice, covers the payload at k=1") {
    val in = Multimodal.synthMedia(13L) // n_frames = 13 % 7 + 1 = 7
    val meta = Multimodal.decodeMeta(in).get
    val all = Multimodal.sampleFrames(in, 1)
    assert(all.length === meta.n_frames)
    assert(all.map(_.length).sum === in.length - 16, "k=1 must cover the payload")
    val every2 = Multimodal.sampleFrames(in, 2)
    assert(every2.length === (meta.n_frames + 1) / 2)
    assert(every2(0).toSeq === all(0).toSeq && every2(1).toSeq === all(2).toSeq)
    assert(Multimodal.sampleFrames("junk".getBytes, 2).isEmpty)
  }

  test("feature extraction is deterministic and dense") {
    val f1 = Multimodal.features(Multimodal.synthMedia(7L), 32)
    val f2 = Multimodal.features(Multimodal.synthMedia(7L), 32)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.sum > 0.0f)
  }

  test("batch metadata extraction over a DataFrame (null-safe)") {
    val df = Seq(
      (1L, Multimodal.synthMedia(1L)),
      (2L, "garbage".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val out = Multimodal.withMeta(spark, df, "media")
      .select($"id", $"media_ok").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false))
  }
}
