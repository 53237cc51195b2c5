package graft.tools
import graft.pipeline._
import graft.synth._
import org.apache.spark.sql.SparkSession
/** Dev probe: gen+decide fused in one mapPartitions, minimal output encode. */
object SparkFused {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def job(count: Long, parts: Int): Long = {
      val bcLang = spark.sparkContext.broadcast(LangId.default)
      val bcKn = spark.sparkContext.broadcast(Perplexity.models)
      val cfg = PipelineConfig()
      spark.range(0, count, 1, parts).mapPartitions { it =>
        val lang = bcLang.value; val kn = bcKn.value
        val scratch = new LangIdScratch(lang.langs.length)
        var kept = 0L
        it.foreach { i =>
          val p = PageGen.generate(i)
          kept += QualityPipeline.decide(p.url, p.html, p.text, lang, kn, scratch, cfg).keep
        }
        Iterator.single(kept)
      }.reduce(_ + _)
    }
    job(20000, cores * 2) // warmup
    val t0 = System.nanoTime()
    job(n, cores * 4)
    println(f"FUSED cores=$cores docs/s=${n / ((System.nanoTime() - t0) / 1e9)}%.0f")
    spark.stop()
  }
}
