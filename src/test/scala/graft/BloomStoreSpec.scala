package graft

import graft.functions.BloomSketch
import graft.io.BloomStore
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Persisted per-shard Bloom sidecars: build/update/load round-trips, the
  * incremental-merge ≡ rebuild bit-identity that makes the store safe to
  * maintain across crawl batches, and the saturation accounting that keeps
  * the capacity discipline honest. */
class BloomStoreSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def digests(ids: Range): org.apache.spark.sql.DataFrame =
    ids.toDF("id").selectExpr("md5(CAST(id AS STRING)) AS h")

  test("build + update equals a fresh build over the union, bit for bit") {
    val rootA = Files.createTempDirectory("blooms-a").toString
    val rootB = Files.createTempDirectory("blooms-b").toString
    val m1 = BloomStore.build(spark, digests(0 until 800), rootA,
      numShards = 8, capacityPerShard = 1024)
    val m2 = BloomStore.update(spark, digests(800 until 1000), rootA)
    val mU = BloomStore.build(spark, digests(0 until 1000), rootB,
      numShards = 8, capacityPerShard = 1024)
    // Bloom insertion and OR-merge commute: the content address of the
    // incrementally-updated store must EQUAL the from-scratch union build
    assert(m2.sha === mU.sha, "incremental update diverged from rebuild")
    assert(m2.parent === Some(m1.sha), "update must chain to its parent")
    assert(m2.totalKeys === 1000L && mU.totalKeys === 1000L)
  }

  test("no false negatives after reload; pruning works on fresh keys") {
    val root = Files.createTempDirectory("blooms-c").toString
    BloomStore.build(spark, digests(0 until 500), root,
      numShards = 4, capacityPerShard = 1024)
    val filters = BloomStore.loadDf(spark, root).collect()
      .map(r => r.getInt(0) -> BloomSketch.fromBytes(r.getAs[Array[Byte]](1)))
      .toMap
    assert(filters.size === 4)
    // every inserted digest must hit its shard's filter (Bloom property)
    val rows = digests(0 until 500)
      .withColumn("shard", BloomSketch.shardCol(org.apache.spark.sql.functions.col("h"), 4))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    rows.foreach { case (h, s) =>
      assert(filters(s).mightContainString(h), s"false negative for $h in shard $s")
    }
    // fresh keys should mostly miss (fpp ~1%)
    val fresh = digests(100000 until 101000)
      .withColumn("shard", BloomSketch.shardCol(org.apache.spark.sql.functions.col("h"), 4))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val hits = fresh.count { case (h, s) => filters(s).mightContainString(h) }
    assert(hits < 50, s"$hits/1000 fresh keys hit — fpp far above nominal")
  }

  test("saturation accounting flags capacity overrun; manifest round-trips") {
    val root = Files.createTempDirectory("blooms-d").toString
    val m = BloomStore.build(spark, digests(0 until 100), root,
      numShards = 2, capacityPerShard = 128)
    assert(!BloomStore.saturated(m))
    val m2 = BloomStore.update(spark, digests(100 until 400), root)
    assert(BloomStore.saturated(m2), "400 keys > 2×128 capacity must flag")
    val read = BloomStore.manifest(root).get
    assert(read === m2, "manifest must round-trip")
  }
}
