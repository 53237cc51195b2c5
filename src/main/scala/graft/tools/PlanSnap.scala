package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named queries into per-query files —
  * the before/after plan evidence for optimization rounds.
  * Usage: runMain graft.tools.PlanSnap <outDir> <suffix> <query>...
  * writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <suffix> <query>...")
    val (outDir, suffix) = (args(0), args(1))
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    for (n <- names) qs.get(n) match {
      case Some(fn) =>
        val plan = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val capped = if (plan.length <= 60000) plan
          else plan.take(60000) + s"\n... [truncated ${plan.length - 60000} chars]\n"
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), capped)
        println(s"wrote $outDir/${n}_$suffix.txt (${capped.length} chars)")
        // cache() registers plans in the shared CacheManager at
        // construction; without this a later query whose subtree matches
        // an earlier query's cached frame would snapshot an
        // InMemoryRelation shape the isolated battery never plans
        spark.catalog.clearCache()
        graft.queries.TextQueries.clearComponentMemo()
      case None => println(s"unknown query: $n")
    }
    spark.stop()
  }
}
