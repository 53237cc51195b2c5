package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-host quality stats with hot-host skew protection (north rule /
  * SURVEY §2.7): hosts follow a Zipf — a plain groupBy(host) sends the
  * hottest host's entire traffic to one reducer. The salted two-level
  * shape (`host#salt` partial agg → merge) bounds any single task at
  * 1/SaltFactor of the hot key and produces IDENTICAL results (asserted
  * by HostStatsSpec against the direct aggregation).
  */
object HostStats {

  val SaltFactor = 32

  /** Host from the url (scheme://host/...). */
  def hostOf(urlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(urlCol, "^[a-z]+://([^/]+)/", 1)

  /** Salted two-level aggregation: keep-rate + token stats per host. */
  def compute(results: DataFrame): DataFrame = {
    val withHost = results.select(
      hostOf(col("url")).as("host"), col("keep"), col("n_tokens"),
      pmod(xxhash64(col("url")), lit(SaltFactor)).as("salt"))
    withHost
      .groupBy(col("host"), col("salt")) // level 1: hot keys split 32 ways
      .agg(count(lit(1)).as("c"),
        sum(col("keep").cast("long")).as("k"),
        sum(col("n_tokens")).as("t"))
      .groupBy(col("host")) // level 2: ≤32 rows per host to merge
      .agg(sum(col("c")).as("n_docs"),
        sum(col("k")).as("n_kept"),
        sum(col("t")).as("total_tokens"))
      .withColumn("keep_rate_x1000",
        floor(col("n_kept") * 1000.0 / col("n_docs")).cast("long"))
  }

  /** Unsalted reference implementation (test oracle; do NOT use at scale). */
  def computeDirect(results: DataFrame): DataFrame =
    results
      .select(hostOf(col("url")).as("host"), col("keep"), col("n_tokens"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum(col("n_tokens")).as("total_tokens"))
      .withColumn("keep_rate_x1000",
        floor(col("n_kept") * 1000.0 / col("n_docs")).cast("long"))
}
