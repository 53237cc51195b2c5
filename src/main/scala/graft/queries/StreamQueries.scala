package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operators answered through the DRIVER'S ORACLE GATE (not just
  * scalatest): each query drives a real Structured Streaming job over the
  * test tables via MemoryStream micro-batches and returns its sink, so the
  * DuckDB compare checks streaming semantics — watermark finalization,
  * append-mode emission — against an independent batch SQL re-derivation.
  *
  * The MemoryStream feed collects the (bounded) test table on the driver:
  * that is the sandbox stand-in for the Kafka/file source a production
  * stream reads; the operator under test — the watermarked windowed
  * aggregation — is identical either way.
  */
object StreamQueries {

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Watermarked 5-minute tumbling windows over the events stream,
    * APPEND mode — rows emit exactly once, when the 10-minute watermark
    * passes the window end. Events are fed time-ordered in four
    * micro-batches (so nothing is ever late-dropped and the result is
    * batch-boundary-independent), then one far-future flush sentinel
    * advances the watermark past every real window so all of them
    * finalize. The sentinel's own window never finalizes and therefore
    * never emits — the output covers exactly the real events, which is
    * what the batch GROUP BY oracle recomputes. */
  def qStreamWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, dir)
      .select($"ts".cast("timestamp").as("ts"), $"event_type", $"value")
      .orderBy($"ts")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    val n = seq.incrementAndGet()
    val name = s"stream_windows_$n"
    if (n > 1) spark.catalog.dropTempView(s"stream_windows_${n - 1}")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Double)]
    // State-store partition count is snapshotted at query start from
    // spark.sql.shuffle.partitions; every micro-batch then commits one
    // state store PER PARTITION. A stateful stream's partition count must
    // be sized to its state volume — on a cluster you set this per job;
    // inheriting the batch engine's 32 here multiplies micro-batch commit
    // overhead for a keyspace of a few thousand (window × type) keys.
    // 4 partitions keep per-store state far below any memory concern
    // (results identical under any partitioning) at 1/8 the per-batch
    // commit count.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // No-data micro-batches OFF for this job: with them on, every data
    // batch whose max event time moved the watermark is followed by an
    // extra empty batch that exists only to emit newly-finalized windows
    // — per-partition state commits and WAL writes included, roughly
    // DOUBLING the micro-batch count (measured ~10 batches for 5 feeds).
    // Emission instead rides the NEXT data batch (watermarks update
    // between batches either way), and a SECOND flush sentinel below
    // provides that next batch after the first sentinel's watermark jump,
    // so every real window still finalizes and emits exactly once. The
    // result is batch-boundary-independent by construction — the windowed
    // counts are identical, only the commit overhead changes.
    val prevNoData = spark.conf.get(
      "spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // per-micro-batch state/offset commits are shuffle-class ephemeral
    // I/O: put the (auto-deleted) checkpoint on the same local scratch
    // dir the shuffle uses instead of the java tmpdir default
    val ckpt = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(spark.sparkContext.getConf
        .get("spark.local.dir", System.getProperty("java.io.tmpdir"))
        .split(",").head), s"ckpt_$name").toString
    val query =
      try graft.streaming.StreamPipeline
        .windowedCounts(input.toDF().toDF("ts", "event_type", "value"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set(
          "spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
      }
    try {
      val chunk = math.max(1, events.length / 4)
      events.grouped(chunk).foreach { batch =>
        input.addData(batch.toSeq)
        query.processAllAvailable()
      }
      // two flush sentinels: the first advances the watermark past every
      // real window; with no-data batches disabled the emission of the
      // windows it finalized needs one more batch, which the second
      // sentinel provides. Neither sentinel's own window ever finalizes
      // (nothing later moves the watermark past it), so the output covers
      // exactly the real events — same contract as before.
      val flushTs = new java.sql.Timestamp(
        events.last._1.getTime + 24L * 3600 * 1000)
      input.addData((flushTs, "__flush__", 0.0))
      query.processAllAvailable()
      val flushTs2 = new java.sql.Timestamp(
        events.last._1.getTime + 48L * 3600 * 1000)
      input.addData((flushTs2, "__flush__", 0.0))
      query.processAllAvailable()
    } finally {
      query.stop()
      // explicit checkpoint locations are not auto-deleted on stop
      graft.io.TableIO.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
    spark.table(name)
      .select($"window.start".cast("timestamp").cast("long").as("win_start"),
        $"event_type", $"n_events", $"value_cents")
      .filter($"event_type" =!= "__flush__")
      .orderBy($"win_start", $"event_type")
  }

  /** Batch re-derivation of the same windows (values are non-negative in
    * this table, so per-row floor(value*100) == Spark's cast-truncate). */
  val qStreamWindowsSql: String =
    """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start,
      |  event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_windows" -> qStreamWindows)

  val oracleSql: Map[String, String] = Map(
    "q_stream_windows" -> qStreamWindowsSql)
}
