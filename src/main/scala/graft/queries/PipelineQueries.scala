package graft.queries

import graft.pipeline.{QualityPipeline, PipelineConfig}
import graft.synth.{Oracle, SynthSpark}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline queries over the synthesized pages corpus. The
  * kernels (hashed n-gram langid, KN perplexity) are not SQL-expressible,
  * so the DuckDB oracle reads a MATERIALIZED labels table instead:
  * graft.Verify dumps the independent driver-side labeler's output
  * (synth.Oracle.labelRange — single-threaded, no Spark) to
  * `outDir/oracle_labels`, and the oracle SQL below compares the Spark
  * pipeline's dumped verdicts against it. `__OUT__` is substituted with
  * the absolute verify output dir by Verify when writing oracle_sql.json.
  */
object PipelineQueries {

  /** Corpus size for the pipeline queries; Verify labels the same range. */
  val N = 2000L

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

  private val Labels = "read_parquet('__OUT__/oracle_labels/*.parquet')"

  /** DuckDB oracles over the materialized independent labels (see object
    * doc). Sums are CAST to BIGINT — DuckDB widens sum(BIGINT) to HUGEINT.
    * The verdicts oracle is the labels table itself: every column of every
    * row (including the scrubbed text bytes and the double-typed
    * lang_score/ppl) must hash-match the Spark pipeline's output. The
    * agreement oracle recomputes TP/FP/FN/TN in SQL from the DUMPED Spark
    * verdicts joined against the labels — an independent re-derivation,
    * not a copy of the Spark aggregate. */
  val oracleSql: Map[String, String] = Map(
    "q_pipeline_verdicts" ->
      s"""SELECT url, keep, reason, lang_pred, lang_score, ppl, n_tokens,
         |       scrubbed_text
         |FROM $Labels ORDER BY url""".stripMargin,
    "q_pipeline_reasons" ->
      s"""SELECT reason, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM $Labels GROUP BY reason ORDER BY reason""".stripMargin,
    "q_pipeline_agreement" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN g.keep = 1 AND r.keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN g.keep = 1 AND r.keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN g.keep = 0 AND r.keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(sum(CASE WHEN g.keep = 0 AND r.keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |FROM read_parquet('__OUT__/q_pipeline_verdicts/*.parquet') g
         |JOIN $Labels r USING (url)""".stripMargin)
}
