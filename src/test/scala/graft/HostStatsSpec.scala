package graft

import graft.pipeline.{HostStats, QualityPipeline}
import graft.synth.SynthSpark
import org.scalatest.funsuite.AnyFunSuite

/** Salted per-host aggregation: identical to the direct groupBy, on data
  * whose host distribution is genuinely Zipf-skewed. */
class HostStatsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private lazy val results =
    QualityPipeline.run(spark, SynthSpark.pages(spark, 4000, partitions = 8))
      .toDF().cache()

  test("salted two-level aggregation equals the direct aggregation") {
    val salted = HostStats.compute(results).orderBy($"host").collect()
    val direct = HostStats.computeDirect(results).orderBy($"host").collect()
    assert(salted.length === direct.length)
    salted.zip(direct).foreach { case (a, b) => assert(a === b) }
  }

  test("the corpus is actually skewed (Zipf hosts) — salting is load-bearing") {
    val counts = HostStats.compute(results)
      .select($"n_docs").as[Long].collect().sorted
    val top = counts.last
    val median = counts(counts.length / 2)
    assert(top >= 20 * median,
      s"expected hot-host skew, got top=$top median=$median")
  }
}
