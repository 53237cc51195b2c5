package graft

import graft.io.TableIO
import graft.ledger.{Checkpoint, RunLedger}
import graft.pipeline.{PipelineConfig, PipelineJob}
import graft.synth.SynthSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Iceberg-layout table + checkpointed bucket-range pipeline:
  * snapshot manifests, bucket-pruned scans, per-partition lineage, and the
  * north rule's idempotent-resume proof (re-run a completed range => zero
  * new output, identical content hashes).
  */
class IcebergResumeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val N = 1500L
  private val NBuckets = 16

  private lazy val root = {
    val dir = Files.createTempDirectory("graft-table").toString
    TableIO.writePages(spark, SynthSpark.pages(spark, N, partitions = 4), dir, NBuckets)
    dir
  }

  test("snapshot manifest is content-addressed and complete") {
    val snap = TableIO.snapshot(root).get
    assert(snap.snapshotId.startsWith("sha256:"))
    assert(snap.totalRows === N)
    assert(snap.deltaRows === N)
    assert(snap.buckets.keys.forall(b => b >= 0 && b < NBuckets))
  }

  test("append counts the batch, not the table (no full-table rescan)") {
    val dir = Files.createTempDirectory("graft-table-append").toString
    TableIO.writePages(spark, SynthSpark.pages(spark, N, partitions = 4), dir, NBuckets)
    val first = TableIO.snapshot(dir).get

    // track records read by Spark tasks during the second append: the
    // manifest must come from the staged batch + parent manifest, never
    // from re-scanning previously written data
    val read = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val m = 300L
    try {
      TableIO.writePages(spark,
        SynthSpark.pages(spark, m, partitions = 4, idOffset = N), dir, NBuckets)
      Thread.sleep(1000) // listener bus drains asynchronously
    } finally spark.sparkContext.removeSparkListener(listener)

    // generation reads nothing from disk; count job + write job may each
    // touch the staged batch (and its cache) but never the N-row table
    assert(read.get() <= 4 * m,
      s"append read ${read.get()} records — looks like a table rescan (N=$N)")

    val second = TableIO.snapshot(dir).get
    assert(second.parentId === Some(first.snapshotId))
    assert(second.deltaRows === m)
    assert(second.totalRows === N + m)
    // cumulative counts must match what a full read sees
    assert(spark.read.parquet(s"$dir/data").count() === N + m)
  }

  test("bucket scan is partition-pruned (PartitionFilters in the plan)") {
    val some = TableIO.snapshot(root).get.buckets.keys.toSeq.sorted.take(3)
    val df = TableIO.readBuckets(spark, root, some)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("warc_bucket"),
      s"expected partition pruning in plan:\n$plan")
    val expected = TableIO.snapshot(root).get.buckets.filter(kv => some.contains(kv._1)).values.sum
    assert(df.count() === expected)
  }

  test("pipeline run processes every bucket; resume is a no-op; outputs stable") {
    val out = Files.createTempDirectory("graft-out").toString
    val ledger = s"$out/ledger.jsonl"

    val first = PipelineJob.run(spark, root, out, ledger, runId = "run-1")
    val nBuckets = TableIO.snapshot(root).get.buckets.size
    assert(first.processed.size === nBuckets)
    assert(first.skipped.isEmpty)
    assert(first.processed.map(_.rowsIn).sum === N)

    val outCount1 = spark.read.parquet(s"$out/data").count()
    assert(outCount1 === N)

    // resume: everything checkpointed -> zero work, zero new rows
    val second = PipelineJob.run(spark, root, out, ledger, runId = "run-2")
    assert(second.processed.isEmpty)
    assert(second.skipped.size === nBuckets)
    assert(spark.read.parquet(s"$out/data").count() === N)

    // invalidate two buckets -> exactly those reprocess, hashes unchanged
    val redo = first.processed.take(2).map(_.bucket)
    redo.foreach(b => Checkpoint.invalidate(out, b))
    val third = PipelineJob.run(spark, root, out, ledger, runId = "run-3")
    assert(third.processed.map(_.bucket) === redo)
    val hashesBefore = first.processed.filter(s => redo.contains(s.bucket))
      .map(s => s.bucket -> s.contentHash).toMap
    third.processed.foreach(s => assert(s.contentHash === hashesBefore(s.bucket),
      s"bucket ${s.bucket} content changed on re-run"))
    assert(spark.read.parquet(s"$out/data").count() === N)

    // ledger rows: appended for runs 1 and 3, content-addressed ids verify
    val lines = RunLedger.readAll(ledger)
    assert(lines.size === nBuckets + redo.size)
    assert(lines.forall(RunLedger.verifyLine), "every ledger id must verify")

    // capsule completeness: the manifest carries the replay command line
    // and the bucket's artifact list (reference capsule.rs:128-372)
    val m = Checkpoint.read(out, first.processed.head.bucket).get
    assert(m.replayCommand ===
      Some(s"graft.Main replay $root $out ${m.bucket}"))
    assert(m.artifacts.nonEmpty)
    m.artifacts.foreach { a =>
      assert(a.startsWith(s"data/warc_bucket=${m.bucket}/"))
      assert(Files.exists(java.nio.file.Paths.get(out, a)), s"artifact $a missing")
    }
  }

  test("config change invalidates checkpoints (params hash discipline)") {
    val out = Files.createTempDirectory("graft-out2").toString
    val ledger = s"$out/ledger.jsonl"
    val cfgA = PipelineConfig()
    val cfgB = PipelineConfig(maxPpl = 4999.0)
    assert(PipelineJob.paramsHash(cfgA) !== PipelineJob.paramsHash(cfgB))
    val a = PipelineJob.run(spark, root, out, ledger, cfgA)
    assert(a.processed.nonEmpty)
    val b = PipelineJob.run(spark, root, out, ledger, cfgB)
    assert(b.processed.size === a.processed.size, "changed config must reprocess all buckets")
  }
}
