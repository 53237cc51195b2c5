package graft.io

import graft.core.Json
import graft.functions.BloomSketch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Persisted per-shard Bloom filters — the PRODUCTION shape of the
  * incremental-dedup state: a crawl ingest builds the filters from its
  * historical digests ONCE, merges each new batch's digests in (bitwise
  * OR — Bloom insertions commute, so update(build(A), B) is bit-identical
  * to build(A ∪ B) at equal capacity), and every later batch prunes
  * against the sidecars instead of re-aggregating 10^12 history rows.
  *
  * Layout (next to the data the filters index, like Iceberg puffin
  * sidecars):
  *   root/blooms/shard=<s>.bloom      (BloomFilter wire format)
  *   root/blooms/manifest.json        (content-addressed: shard count,
  *                                     capacity, fpp, total keys, sha256
  *                                     over the sorted per-shard file
  *                                     hashes, parent chain)
  *
  * Capacity discipline: a Bloom's bit width is fixed at build, so updates
  * SATURATE fpp as keys grow past capacity. The manifest carries
  * totalKeys vs capacityPerShard × shards; [[saturated]] flags when a
  * rebuild (larger capacity or more shards) is due — the filter never
  * lies (no false negatives), it just prunes less.
  */
object BloomStore {

  final case class Manifest(
      numShards: Int,
      capacityPerShard: Long,
      fpp: Double,
      totalKeys: Long,
      sha: String,
      parent: Option[String])

  private def dir(root: String) = Paths.get(root, "blooms")
  private def shardPath(root: String, s: Int) =
    dir(root).resolve(f"shard=$s%05d.bloom")
  private def manifestPath(root: String) = dir(root).resolve("manifest.json")

  /** Build per-shard filters from a one-column (`h`) digest frame in ONE
    * grouped aggregation and persist them. A shard with no digests gets
    * an EMPTY filter (so probing is total). */
  def build(spark: SparkSession, digests: DataFrame, root: String,
      numShards: Int, capacityPerShard: Long, fpp: Double = 0.01): Manifest = {
    import spark.implicits._
    val agg = udaf(new BloomSketch.BloomAgg(capacityPerShard, fpp))
    // bounded collect: exactly ≤ numShards rows of filter bytes
    val built = digests
      .withColumn("shard", BloomSketch.shardCol(col("h"), numShards))
      .groupBy($"shard")
      .agg(agg($"h").as("filter"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1), r.getLong(2)))
      .sortBy(_._1)
    val byShard = built.map(b => b._1 -> b._2).toMap
    val empty = BloomSketch.toBytes(BloomFilter.create(capacityPerShard, fpp))
    Files.createDirectories(dir(root))
    val bytes = (0 until numShards)
      .map(s => s -> byShard.getOrElse(s, empty))
    bytes.foreach { case (s, b) => Files.write(shardPath(root, s), b) }
    writeManifest(root, numShards, capacityPerShard, fpp,
      built.map(_._3).sum, bytes, parent = None)
  }

  /** Merge a new batch's digests into the persisted filters: per-shard
    * batch filters are built at the SAME capacity/fpp (read from the
    * manifest — merge requires equal bit width) and OR-ed into the stored
    * bytes. Bit-identical to rebuilding from the union. */
  def update(spark: SparkSession, digests: DataFrame, root: String): Manifest = {
    import spark.implicits._
    val m = manifest(root).getOrElse(
      throw new IllegalStateException(s"no bloom manifest at $root — build first"))
    val agg = udaf(new BloomSketch.BloomAgg(m.capacityPerShard, m.fpp))
    // bounded collect: ≤ numShards rows
    val batch = digests
      .withColumn("shard", BloomSketch.shardCol(col("h"), m.numShards))
      .groupBy($"shard")
      .agg(agg($"h").as("filter"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1), r.getLong(2)))
      .sortBy(_._1)
    val merged = batch.map { case (s, b, _) =>
      val cur = BloomSketch.fromBytes(Files.readAllBytes(shardPath(root, s)))
      cur.mergeInPlace(BloomSketch.fromBytes(b))
      s -> BloomSketch.toBytes(cur)
    }.toMap
    merged.toSeq.sortBy(_._1)
      .foreach { case (s, b) => Files.write(shardPath(root, s), b) }
    val all = (0 until m.numShards)
      .map(s => s -> merged.getOrElse(s, Files.readAllBytes(shardPath(root, s))))
    writeManifest(root, m.numShards, m.capacityPerShard, m.fpp,
      m.totalKeys + batch.map(_._3).sum, all, parent = Some(m.sha))
  }

  private def writeManifest(root: String, numShards: Int, cap: Long,
      fpp: Double, totalKeys: Long, bytes: Seq[(Int, Array[Byte])],
      parent: Option[String]): Manifest = {
    // content address: sha256 over the SORTED per-shard file hashes, so
    // the id is a pure function of the filter contents
    val sha = TableIO.sha256(bytes.sortBy(_._1)
      .map { case (s, b) => s"$s:${TableIO.sha256(b.map(x => f"$x%02x").mkString)}" }
      .mkString("\n"))
    val m = Manifest(numShards, cap, fpp, totalKeys, s"sha256:$sha", parent)
    val body = Json.obj(
      "num_shards" -> m.numShards.toString,
      "capacity_per_shard" -> m.capacityPerShard.toString,
      "fpp" -> m.fpp.toString,
      "total_keys" -> m.totalKeys.toString,
      "sha" -> Json.esc(m.sha),
      "parent" -> m.parent.map(Json.esc).getOrElse("null"))
    Files.write(manifestPath(root), body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    m
  }

  def manifest(root: String): Option[Manifest] = {
    val p = manifestPath(root)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      for {
        ns <- Json.fieldNum(s, "num_shards")
        cap <- Json.fieldNum(s, "capacity_per_shard")
        keys <- Json.fieldNum(s, "total_keys")
        sha <- Json.fieldStr(s, "sha")
      } yield Manifest(ns.toInt, cap,
        """"fpp":"?([0-9.]+)"?""".r.findFirstMatchIn(s).map(_.group(1).toDouble)
          .getOrElse(0.01),
        keys, sha, Json.fieldStr(s, "parent"))
    }
  }

  /** Keys past which the nominal fpp no longer holds (rebuild advised). */
  def saturated(m: Manifest): Boolean =
    m.totalKeys > m.capacityPerShard * m.numShards

  /** The persisted filters as a (shard, filter) frame for the partition-
    * wise cogroup application (CorpusQueries.qDedupIncrementalSharded's
    * shape) — built from the sidecar files, not re-aggregated. */
  def loadDf(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val m = manifest(root).getOrElse(
      throw new IllegalStateException(s"no bloom manifest at $root"))
    (0 until m.numShards)
      .map(s => (s, Files.readAllBytes(shardPath(root, s))))
      .toDF("shard", "filter")
  }
}
