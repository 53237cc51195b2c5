package graft.queries

import graft.pipeline.{QualityPipeline, PipelineConfig}
import graft.synth.{Oracle, SynthSpark}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline queries over the synthesized pages corpus. These are
  * NOT SQL-expressible (hashed n-gram langid, KN perplexity) so they ship
  * without DuckDB oracles — the driver records rows-only checks. Their real
  * correctness gate is graft.verify.DiffJob against the independent oracle
  * labeler (PipelineSpec + Main e2e, exit-code trinity).
  */
object PipelineQueries {

  private val N = 2000L

  /** Full per-document verdicts (keep, reason, lang, ppl, scrubbed text). */
  def qPipelineVerdicts(spark: SparkSession, dir: String): DataFrame = {
    QualityPipeline.run(spark, SynthSpark.pages(spark, N)).toDF()
      .orderBy(col("url"))
  }

  /** Drop-reason histogram — the pipeline's refusal-style accounting. */
  def qPipelineReasons(spark: SparkSession, dir: String): DataFrame = {
    QualityPipeline.run(spark, SynthSpark.pages(spark, N)).toDF()
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("reason"))
  }

  /** Pipeline-vs-oracle agreement counts: the F1 inputs as a query (the
    * driver can see TP/FP/FN directly; F1 = 1.0 when pipeline == oracle). */
  def qPipelineAgreement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val got = QualityPipeline.run(spark, SynthSpark.pages(spark, N)).toDF()
      .select($"url", $"keep".as("keep_got"))
    val ref = spark.createDataset(Oracle.labelRange(0L, N)).toDF()
      .select($"url", $"keep".as("keep_ref"))
    got.join(ref, "url")
      .agg(
        sum(($"keep_got" === 1 && $"keep_ref" === 1).cast("long")).as("tp"),
        sum(($"keep_got" === 1 && $"keep_ref" === 0).cast("long")).as("fp"),
        sum(($"keep_got" === 0 && $"keep_ref" === 1).cast("long")).as("fn"),
        sum(($"keep_got" === 0 && $"keep_ref" === 0).cast("long")).as("tn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_verdicts" -> qPipelineVerdicts,
    "q_pipeline_reasons" -> qPipelineReasons,
    "q_pipeline_agreement" -> qPipelineAgreement)

  /** No DuckDB equivalents (langid/ppl are model-driven) — rows-only. */
  val oracleSql: Map[String, String] = Map.empty
}
