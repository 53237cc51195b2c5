package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Run ONE battery query with a stage-metrics listener: per-stage wall,
  * executor-cpu, GC, shuffle bytes — the instrument for separating "the
  * machine was slow" from "this stage did more work than we think".
  *
  * Usage: runMain graft.tools.OneQuery <queryName> <dir> [reps]
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OneQuery <queryName> <dir> [reps]")
    val (name, dir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-onequery")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // concurrent queue, not synchronized-on-a-rebound-var: synchronizing on
    // a reassigned Seq locks different objects across calls (round-4
    // ADVICE) — benign with one bus thread, but the queue makes it true
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Long, Long, Long, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for (a <- i.submissionTime; b <- i.completionTime) yield b - a).getOrElse(-1L)
        rows.add((i.stageId, wall, m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten,
          i.numTasks))
      }
    })
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      rows.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[onequery] $name rep$r: $dt%.2f s total")
      println(f"[onequery] ${"stage"}%6s ${"wall_ms"}%9s ${"run_ms"}%9s ${"cpu_ms"}%9s ${"gc_ms"}%7s ${"shuf_MB"}%8s tasks")
      scala.jdk.CollectionConverters.CollectionHasAsScala(rows).asScala.toSeq
        .sortBy(-_._2).take(12).foreach { case (id, wall, run, cpu, gc, shuf, nt) =>
          println(f"[onequery] $id%6d $wall%9d $run%9d $cpu%9d $gc%7d ${shuf / 1e6}%8.1f $nt%5d")
        }
    }
    spark.stop()
  }
}
