package graft.tools

import graft.pipeline.{CrashHooks, PipelineJob}
import org.apache.spark.sql.SparkSession

/** Child-process half of the crash-resume proof (CrashResumeSpec): runs
  * ONE PipelineJob over an existing pages table, optionally arming a
  * crash —
  *
  *   clean <tableRoot> <outRoot> <ledger>           run to completion
  *   ckpt  <tableRoot> <outRoot> <ledger> <k>       halt(137) after the
  *                                                  k-th checkpoint
  *                                                  manifest write
  *   write <tableRoot> <outRoot> <ledger> <k>       halt(137) from the
  *                                                  listener bus after the
  *                                                  k-th task that wrote
  *                                                  output records —
  *                                                  mid-write, partial
  *                                                  staging on disk
  *
  * On a clean finish, prints one parseable line:
  *   RESULT processed=<b,b,...> skipped=<b,b,...>
  * then per-bucket content hashes:
  *   HASH <bucket>=<contentHash>
  */
object CrashResumeChild {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: CrashResumeChild <mode> <tableRoot> <outRoot> <ledger> [k]")
    val (mode, tableRoot, outRoot, ledger) = (args(0), args(1), args(2), args(3))
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-crash-$mode")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mode match {
      case "clean" => ()
      case "ckpt" => CrashHooks.haltAfterCheckpoints = args(4).toInt
      case "write" =>
        val k = args(4).toInt
        val writes = new java.util.concurrent.atomic.AtomicInteger()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null &&
                te.taskMetrics.outputMetrics.recordsWritten > 0 &&
                writes.incrementAndGet() >= k)
              Runtime.getRuntime.halt(137)
        })
      case other => sys.error(s"unknown mode $other")
    }
    val res = PipelineJob.run(spark, tableRoot, outRoot, ledger,
      runId = s"crash-$mode")
    println(s"RESULT processed=${res.processed.map(_.bucket).mkString(",")} " +
      s"skipped=${res.skipped.mkString(",")}")
    res.processed.foreach(s => println(s"HASH ${s.bucket}=${s.contentHash}"))
    spark.stop()
    sys.exit(0)
  }
}
