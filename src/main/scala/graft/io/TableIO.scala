package graft.io

import graft.core.Json
import graft.synth.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Iceberg-layout emulation over Parquet (SURVEY §7.4: no Iceberg runtime
  * jar exists offline, so the three behaviors the north rule exercises are
  * provided behind this seam — bucket-partitioned scans with pruning,
  * content-addressed snapshot manifests, and snapshot-scoped reads — and a
  * real Iceberg catalog can drop in later).
  *
  * Layout:
  *   root/data/warc_bucket=<b>/part-*.parquet   (hash-bucketed on warc_ts,
  *                                               Iceberg `bucket(N, col)` transform)
  *   root/manifests/<snapshot_id>.json          (bucket list, row counts,
  *                                               parent pointer, params)
  *   root/metadata.json                         (current snapshot pointer)
  */
object TableIO {

  val DefaultBuckets = 64

  /** Iceberg-style bucket transform: positive hash of the timestamp micros.
    * (xxhash64 is Spark-native and stable across sessions/executors.) */
  def bucketCol(nBuckets: Int) =
    pmod(xxhash64(col("warc_ts").cast("timestamp").cast("long")), lit(nBuckets)).cast("int")

  final case class Snapshot(
      snapshotId: String,
      parentId: Option[String],
      buckets: Map[Int, Long], // bucket -> CUMULATIVE row count
      totalRows: Long,
      deltaRows: Long) // rows this snapshot appended

  /** Append a pages dataset as a new snapshot; returns the snapshot id.
    * `rowGroupBytes`: keep parquet row groups SMALLER than the reader's
    * maxPartitionBytes, or splits land between row-group midpoints and run
    * empty (A/B measured +7% scan throughput at 2MB vs the 128MB default
    * at this table scale; production sizes both knobs up together). */
  def writePages(spark: SparkSession, pages: Dataset[Page], root: String,
      nBuckets: Int = DefaultBuckets,
      rowGroupBytes: Long = 2L * 1024 * 1024): String = {
    import spark.implicits._
    val withBucket = pages.toDF().withColumn("warc_bucket", bucketCol(nBuckets))
    // repartition on the bucket key first: without it every input partition
    // writes a sliver into every bucket dir (observed 16k × 15KB files for a
    // 250MB table — a scan-killer at scale); with it, one file per bucket
    val staged = withBucket
      .repartition(nBuckets, col("warc_bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // manifest counts come from the BATCH being appended (one pass over the
    // staged batch), merged with the parent manifest — appending 1 GB to a
    // 100 TB table must never rescan the table (IcebergResumeSpec asserts
    // the record-read bound)
    val delta = staged.groupBy("warc_bucket").count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    staged.write
      .mode("append")
      .option("parquet.block.size", rowGroupBytes.toString)
      .partitionBy("warc_bucket")
      .parquet(s"$root/data")
    staged.unpersist(false)
    commitSnapshot(root, delta)
  }

  /** Content-addressed snapshot commit (id = sha256 of the manifest body —
    * the witness-record discipline, /root/reference/src/witness/record.rs:180-184).
    * The manifest records BOTH the appended delta and the merged cumulative
    * per-bucket counts (delta + parent manifest — no data rescan). */
  private def commitSnapshot(root: String, delta: Map[Int, Long]): String = {
    val parentSnap = snapshot(root)
    val parent = parentSnap.map(_.snapshotId)
    val cumulative = parentSnap.map(_.buckets).getOrElse(Map.empty[Int, Long])
      .foldLeft(delta) { case (acc, (b, n)) => acc.updated(b, acc.getOrElse(b, 0L) + n) }
    val body = Json.obj(
      "parent" -> parent.map(Json.esc).getOrElse("null"),
      "delta_rows" -> delta.values.sum.toString,
      "total_rows" -> cumulative.values.sum.toString,
      "buckets_delta" -> Json.obj(delta.toSeq.sortBy(_._1)
        .map { case (b, n) => b.toString -> n.toString }: _*),
      "buckets" -> Json.obj(cumulative.toSeq.sortBy(_._1)
        .map { case (b, n) => b.toString -> n.toString }: _*))
    val id = "sha256:" + sha256(body)
    val mdir = Paths.get(root, "manifests")
    Files.createDirectories(mdir)
    Files.write(mdir.resolve(s"${id.replace(':', '-')}.json"),
      Json.obj("snapshot_id" -> Json.esc(id), "manifest" -> body)
        .getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(root, "metadata.json"),
      Json.obj("current_snapshot" -> Json.esc(id)).getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    id
  }

  def currentSnapshotId(root: String): Option[String] = {
    val p = Paths.get(root, "metadata.json")
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val m = """"current_snapshot":"([^"]+)"""".r.findFirstMatchIn(s)
      m.map(_.group(1))
    }
  }

  def snapshot(root: String): Option[Snapshot] = currentSnapshotId(root).map { id =>
    val p = Paths.get(root, "manifests", s"${id.replace(':', '-')}.json")
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    // the CUMULATIVE section is keyed exactly "buckets" (not "buckets_delta")
    val bucketsBlock = """"buckets":\{([^}]*)\}""".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
    val buckets = """"(\d+)":"?(\d+)"?""".r.findAllMatchIn(bucketsBlock)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    val parent = """"parent":"([^"]+)"""".r.findFirstMatchIn(s).map(_.group(1))
    val deltaRows = """"delta_rows":"?(\d+)"?""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong).getOrElse(buckets.values.sum)
    Snapshot(id, parent, buckets, buckets.values.sum, deltaRows)
  }

  /** Bucket-pruned scan: only the named warc_bucket directories are read
    * (visible as PartitionFilters in the physical plan). */
  def readBuckets(spark: SparkSession, root: String, buckets: Seq[Int]): DataFrame = {
    val df = spark.read.parquet(s"$root/data")
    if (buckets.isEmpty) df
    else df.filter(col("warc_bucket").isin(buckets: _*))
  }

  def readAll(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/data")

  def sha256(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
  }

  /** Files.list leaks a file descriptor unless the stream is closed —
    * materialize and close (round-2 ADVICE). */
  def listDir(d: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(d)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala.toSeq
    finally s.close()
  }

  /** Recursive delete with the same closed-stream discipline as
    * [[listDir]] (Files.walk leaks an fd unless closed; the lint routes
    * every walk through here). Deepest paths first; a path that refuses
    * to delete (already gone, concurrent writer) is skipped, not fatal. */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      val all =
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala.toVector
        finally s.close()
      all.sortBy(_.getNameCount)(Ordering[Int].reverse).foreach(f =>
        try { java.nio.file.Files.deleteIfExists(f); () }
        catch { case scala.util.control.NonFatal(_) => () })
    }
}
