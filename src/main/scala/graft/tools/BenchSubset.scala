package graft.tools

import org.apache.spark.sql.SparkSession

/** Warmed subset battery for optimization A/B runs: same methodology as
  * graft.Bench (full-table noop warmup, noop-sink timing, clearCache
  * between reps, best-of-N) over a comma-separated query list.
  * Usage: runMain graft.tools.BenchSubset <dir> <q1,q2,...> [reps]
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchSubset <dir> <q1,q2,...> [reps]")
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.util.control.NonFatal
    for ((_, tbl) <- graft.queries.Tables.all)
      try tbl(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () }
    locally {
      import org.apache.spark.sql.functions._
      try graft.queries.Tables.documents(spark, dir)
        .select(md5(col("text"))).groupBy(col("md5(text)")).count()
        .write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () }
    }
    val qs = graft.SparkEntry.queries
    for (n <- names) qs.get(n) match {
      case Some(fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          graft.queries.TextQueries.clearComponentMemo()
          dt
        }
        println(f"[subset] $n%-32s best=${times.min}%7.3f  reps=" +
          times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      case None => println(s"[subset] unknown query: $n")
    }
    spark.stop()
  }
}
