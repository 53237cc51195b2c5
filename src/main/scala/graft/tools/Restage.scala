package graft.tools
import org.apache.spark.sql.SparkSession
import graft.io.TableIO
import graft.synth.SynthSpark
object Restage {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong; val root = args(1); val blockMb = args(2).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.parquet.block.size", (blockMb * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TableIO.writePages(spark, SynthSpark.pages(spark, n, 128), root)
    spark.stop()
  }
}
