package graft.synth

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed page generation: pure function of row index, so the Dataset
  * is byte-identical under any partitioning (generation itself is the
  * scale-out story: 10^12 docs = spark.range partitioned across executors,
  * zero shuffle). */
object SynthSpark {
  def pages(spark: SparkSession, n: Long, partitions: Int = 0,
      idOffset: Long = 0L): Dataset[Page] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(idOffset, idOffset + n, 1, partitions)
      else spark.range(idOffset, idOffset + n)
    base.mapPartitions(_.map(i => PageGen.generate(i)))
  }
}
