package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical aggregates with exact-arithmetic oracles: interpolated
  * percentiles on integral values (both engines interpolate linearly, so
  * halves are exactly representable) and moments derived from exact
  * integer power sums (variance/stddev computed the same way in both
  * engines from the same two BIGINTs — no float-order drift).
  */
object StatsQueries {

  /** Quartiles of l_quantity per return flag (integral doubles). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        min($"l_quantity").as("q_min"),
        max($"l_quantity").as("q_max"))
      .orderBy($"l_returnflag")
  }

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  min(l_quantity) AS q_min,
      |  max(l_quantity) AS q_max
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Mean/variance of order totals per status from exact integer power
    * sums (whole dollars keep the sum of squares inside int64). */
  def qStatsMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dollars = floor($"o_totalprice").cast("long")
    Tables.orders(spark, dir)
      .select($"o_orderstatus", dollars.as("d"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"d").as("sum_d"),
        sum($"d" * $"d").as("sumsq_d"))
      .withColumn("mean_x1000",
        floor($"sum_d" * 1000.0 / $"n").cast("long"))
      .withColumn("var_x1000",
        floor(($"sumsq_d" * 1000.0 / $"n") - ($"sum_d" * 1.0 / $"n") * ($"sum_d" * 1000.0 / $"n")).cast("long"))
      .orderBy($"o_orderstatus")
  }

  val qStatsMomentsSql: String =
    """SELECT o_orderstatus, n, sum_d, sumsq_d,
      |  CAST(floor(sum_d * 1000.0 / n) AS BIGINT) AS mean_x1000,
      |  CAST(floor((sumsq_d * 1000.0 / n) - (sum_d * 1.0 / n) * (sum_d * 1000.0 / n)) AS BIGINT) AS var_x1000
      |FROM (
      |  SELECT o_orderstatus, count(*) AS n,
      |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_d,
      |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT) * CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sumsq_d
      |  FROM orders GROUP BY o_orderstatus) t
      |ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_percentiles" -> qPercentiles,
    "q_stats_moments" -> qStatsMoments)

  val oracleSql: Map[String, String] = Map(
    "q_percentiles" -> qPercentilesSql,
    "q_stats_moments" -> qStatsMomentsSql)
}
