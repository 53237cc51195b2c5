package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: dump executed plans for named queries (pushdown/pruning audit). */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    for (n <- names; fn <- qs.get(n)) {
      println(s"===== $n =====")
      println(fn(spark, dir).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
