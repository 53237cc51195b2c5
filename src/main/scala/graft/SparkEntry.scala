package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped by family under graft.queries; each entry has a
  * DuckDB-equivalent oracle in `oracleSql` (column names match exactly;
  * money as integer cents so float summation order can't flip a hash).
  */
object SparkEntry {

  /** Flagship: the full web-text quality pipeline (extract → langid →
    * perplexity → heuristics → scrub) over synthesized pages; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.QualityPipeline
      .run(spark, graft.synth.SynthSpark.pages(spark, 2000))
      .toDF()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextQueries.queries ++ CorpusQueries.queries ++
      CrawlQueries.queries ++ OpsQueries.queries ++ SearchQueries.queries ++
      CleanQueries.queries ++ VectorQueries.queries ++
      VerifierQueries.queries ++ PipelineQueries.queries ++
      StreamQueries.queries ++ MiscQueries.queries ++
      StatsQueries.queries ++ ExtraQueries.queries ++ WebQueries.queries ++
      HygieneQueries.queries ++ AnalyticsQueries.queries ++
      EventsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextQueries.oracleSql ++ CorpusQueries.oracleSql ++
      CrawlQueries.oracleSql ++ OpsQueries.oracleSql ++ SearchQueries.oracleSql ++
      CleanQueries.oracleSql ++ VectorQueries.oracleSql ++
      VerifierQueries.oracleSql ++ PipelineQueries.oracleSql ++
      StreamQueries.oracleSql ++ MiscQueries.oracleSql ++
      StatsQueries.oracleSql ++ ExtraQueries.oracleSql ++
      WebQueries.oracleSql ++ HygieneQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ EventsQueries.oracleSql
}
