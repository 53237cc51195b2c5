package graft.pipeline

import graft.io.TableIO
import graft.ledger.{Checkpoint, LedgerRow, RunLedger}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The production shape of the quality filter: checkpointed bucket-range
  * processing over the Iceberg-style pages table.
  *
  * Scale posture (north rule: 10^12 docs):
  *  - the scan is PRUNED to pending buckets (partition filters — only those
  *    directories are listed/read);
  *  - the pipeline stage itself is shuffle-free (mapPartitions);
  *  - output is written with DYNAMIC partition overwrite so a retried range
  *    re-converges instead of duplicating rows;
  *  - per-bucket lineage rows (counts + order-independent content hash) go
  *    to the run ledger, and a checkpoint manifest marks the bucket done —
  *    resume skips every verifying bucket (idempotence is testable: re-run
  *    => zero new rows, identical hashes).
  */
object PipelineJob {

  final case class BucketStats(bucket: Int, rowsIn: Long, rowsKept: Long, contentHash: String)

  final case class RunResult(processed: Seq[BucketStats], skipped: Seq[Int])

  /** Stable hash of the run configuration — config changes invalidate
    * checkpoints (like rvl's params in the witness record). */
  def paramsHash(cfg: PipelineConfig): String =
    "sha256:" + TableIO.sha256(
      s"$cfg|scrub=${Scrub.version}|langdim=${LangId.Dim}|kn=${Perplexity.CorpusTokens}")

  def run(spark: SparkSession, tableRoot: String, outRoot: String,
      ledgerPath: String, cfg: PipelineConfig = PipelineConfig(),
      runId: String = java.util.UUID.randomUUID().toString): RunResult = {
    import spark.implicits._

    val snap = TableIO.snapshot(tableRoot).getOrElse(
      throw new IllegalStateException(s"no snapshot at $tableRoot"))
    val allBuckets = snap.buckets.keys.toSeq.sorted
    val ph = paramsHash(cfg)
    val done = Checkpoint.completed(outRoot, allBuckets, ph)
    val pending = allBuckets.filterNot(done)

    if (pending.isEmpty) return RunResult(Seq.empty, allBuckets)

    // pruned scan of exactly the pending buckets; InternalRow decode (see
    // QualityPipeline.runDf — the tuple deserializer costs 10–25% at scale)
    val src = TableIO.readBuckets(spark, tableRoot, pending)
      .select($"warc_bucket", $"url", $"html", $"text")

    val bcLang = spark.sparkContext.broadcast(LangId.default)
    val bcKn = spark.sparkContext.broadcast(Perplexity.models)
    val resultRdd = src.queryExecution.toRdd.mapPartitions { iter =>
      val langModel = bcLang.value
      val knModels = bcKn.value
      val scratch = new LangIdScratch(langModel.langs.length)
      iter.map { row =>
        val bucket = row.getInt(0)
        val url = if (row.isNullAt(1)) null else row.getUTF8String(1).toString
        val html = if (row.isNullAt(2)) null else row.getBinary(2)
        val text = if (row.isNullAt(3)) null else row.getUTF8String(3).toString
        (bucket, QualityPipeline.decide(url, html, text, langModel, knModels, scratch, cfg))
      }
    }
    val results = spark.createDataset(resultRdd)
      .select($"_1".as("warc_bucket"), $"_2.*")

    // idempotent write: only the touched warc_bucket partitions are replaced;
    // repartition on the key first so each bucket lands in one file
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    results
      .repartition(math.max(pending.size, 1), $"warc_bucket")
      .write.mode("overwrite").partitionBy("warc_bucket")
      .parquet(s"$outRoot/data")

    // per-bucket lineage: counts + order-independent content hash
    val statsRows = spark.read.parquet(s"$outRoot/data")
      .filter($"warc_bucket".isin(pending: _*))
      .select($"warc_bucket", $"keep",
        xxhash64(concat_ws("\u0001", $"url", $"keep", $"reason", $"lang_pred",
          $"lang_score".cast("string"), $"ppl".cast("string"),
          $"n_tokens", $"scrubbed_text")).as("h"))
      .groupBy($"warc_bucket")
      .agg(count(lit(1)).as("rows_in"),
        sum($"keep".cast("long")).as("rows_kept"),
        // XOR: order-independent, overflow-free (ANSI mode is on in Spark 4)
        expr("bit_xor(h)").as("content_xor"))
      .collect()
      .map(r => BucketStats(r.getInt(0), r.getLong(1), r.getLong(2),
        f"xxxor:${r.getLong(3)}%016x"))
      .sortBy(_.bucket)

    val now = RunLedger.nowIso()
    val ledgerRows = statsRows.map(s => LedgerRow(
      id = "", runId = runId, ts = now, stage = "pipeline", bucket = s.bucket,
      rowsIn = s.rowsIn, rowsKept = s.rowsKept, rowsDropped = s.rowsIn - s.rowsKept,
      paramsHash = ph, scrubVersion = Scrub.version,
      contentHash = s.contentHash, outcome = "ok"))
    try RunLedger.append(ledgerPath, ledgerRows.toSeq)
    catch { case scala.util.control.NonFatal(_) =>
      /* ledger failure never affects the verdict — but a dying JVM
       * (OOM, interrupt) must not be masked as a swallowed write */ }

    statsRows.foreach { s =>
      Checkpoint.write(outRoot,
        Checkpoint.BucketManifest(s.bucket, ph, s.rowsIn, s.rowsKept, s.contentHash,
          replayCommand =
            Some(s"graft.Main replay $tableRoot $outRoot ${s.bucket}"),
          artifacts = Checkpoint.bucketArtifacts(outRoot, s.bucket)))
      // no-op unless the crash-resume harness armed it (CrashResumeSpec)
      CrashHooks.onCheckpointWritten()
    }

    // per-host quality stats over the full output (salted two-level agg —
    // hot hosts are Zipf-skewed); recomputed from the table so resume runs
    // converge to the same snapshot
    HostStats.compute(spark.read.parquet(s"$outRoot/data"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outRoot/host_stats")

    RunResult(statsRows.toSeq, done.toSeq.sorted)
  }
}
