package graft.tools
import graft.pipeline._
import graft.synth._
import org.apache.spark.sql.SparkSession
object Spark32 {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QualityPipeline.run(spark, SynthSpark.pages(spark, 20000, cores*2)).toDF().count()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans).asScala
    val cpu0 = osBean.getProcessCpuTime
    val gc0 = gcBeans.map(_.getCollectionTime).sum
    val t0 = System.nanoTime()
    QualityPipeline.run(spark, SynthSpark.pages(spark, n, cores*4)).toDF().selectExpr("sum(keep)").collect()
    val wall = (System.nanoTime()-t0)/1e9
    val cpu = (osBean.getProcessCpuTime - cpu0)/1e9
    val gcMs = gcBeans.map(_.getCollectionTime).sum - gc0
    println(f"cores=$cores docs/s=${n/wall}%.0f wall=$wall%.1f cpu=$cpu%.1f util=${cpu/wall}%.1f gc_s=${gcMs/1000.0}%.1f")
    spark.stop()
  }
}
