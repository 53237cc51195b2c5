package graft.tools

import graft.io.TableIO
import graft.pipeline._
import graft.synth.SynthSpark
import org.apache.spark.sql.SparkSession

/** A/B the typed-boundary decode cost: tuple-encoder path (runDf) vs
  * direct InternalRow access (toRdd + UTF8String/binary getters). */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val root = java.nio.file.Files.createTempDirectory("graft-decode").toString
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    TableIO.writePages(spark, SynthSpark.pages(spark, n, partitions = cores * 4), root)
    val df = TableIO.readAll(spark, root)
    df.count()

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name: $s%.2f s (${n / s}%.0f docs/s)")
      s
    }

    val bcLang = spark.sparkContext.broadcast(LangId.default)
    val bcKn = spark.sparkContext.broadcast(Perplexity.models)

    // warmup both paths once
    QualityPipeline.runDf(spark, df.limit(50000)).toDF().selectExpr("sum(keep)").collect()

    for (round <- 1 to 3) {
      time(s"r$round tuple-encoder runDf") {
        QualityPipeline.runDf(spark, df).toDF().selectExpr("sum(keep)").collect()
      }
      time(s"r$round internalrow") {
        val pruned = df.select("url", "html", "text")
        val kept = spark.sparkContext.longAccumulator("kept")
        val nDone = spark.sparkContext.longAccumulator("n")
        pruned.queryExecution.toRdd.foreachPartition { iter =>
          val langModel = bcLang.value
          val knModels = bcKn.value
          val scratch = new LangIdScratch(langModel.langs.length)
          var k = 0L
          var c = 0L
          while (iter.hasNext) {
            val row = iter.next()
            val url = row.getUTF8String(0).toString
            val html = if (row.isNullAt(1)) null else row.getBinary(1)
            val text = if (row.isNullAt(2)) null else row.getUTF8String(2).toString
            val r = QualityPipeline.decide(url, html, text, langModel, knModels, scratch, PipelineConfig())
            k += r.keep; c += 1
          }
          kept.add(k); nDone.add(c)
        }
        require(nDone.value == n, s"decoded ${nDone.value} of $n")
      }
      time(s"r$round kernels-only (no spark, 1 pass gen)") {
        // driver-side single-thread baseline scaled: skip (kernel bench exists)
      }
    }
    spark.stop()
  }
}
