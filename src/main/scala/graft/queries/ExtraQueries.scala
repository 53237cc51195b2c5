package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Remaining analytics breadth: edit distance (dedup-adjacent), calendar
  * rollups, ranking functions, ordered list aggregation — all with exact
  * oracles (ints/strings only). */
object ExtraQueries {

  /** Levenshtein distance between consecutive docs' 40-char prefixes —
    * the classic DP yields identical integers in both engines. */
  def qEditDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"text")
    val a = d.select($"doc_id".as("id_a"), substring($"text", 1, 40).as("pref_a"))
    val b = d.select(($"doc_id" - 1).as("id_a"), substring($"text", 1, 40).as("pref_b"))
    a.join(b, "id_a")
      .select($"id_a", levenshtein($"pref_a", $"pref_b").as("edit_distance"))
      .orderBy($"id_a")
  }

  val qEditDistanceSql: String =
    """SELECT a.doc_id AS id_a,
      |  levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS edit_distance
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY id_a""".stripMargin

  /** Calendar rollup: revenue by (year, month). */
  def qMonthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Relational.cents($"o_totalprice")).as("revenue_cents"))
      .orderBy($"y", $"m")
  }

  val qMonthlyRevenueSql: String =
    """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
      |ORDER BY y, m""".stripMargin

  /** Ranking family: rank / dense_rank / ntile(4) per order status over a
    * total order (price desc, key) — deterministic tiles. */
  def qOrderRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"price_cents".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_orderstatus", $"o_orderkey",
        Relational.cents($"o_totalprice").as("price_cents"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .filter($"rnk" <= 5)
      .orderBy($"o_orderstatus", $"rnk")
  }

  val qOrderRanksSql: String =
    """SELECT o_orderstatus, o_orderkey, price_cents, rnk, drnk, quartile
      |FROM (
      |  SELECT o_orderstatus, o_orderkey,
      |    CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents,
      |    rank() OVER w AS rnk,
      |    dense_rank() OVER w AS drnk,
      |    ntile(4) OVER w AS quartile
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderstatus
      |    ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT) DESC, o_orderkey)) t
      |WHERE rnk <= 5
      |ORDER BY o_orderstatus, rnk""".stripMargin

  /** Ordered list aggregation: each customer's order keys as a sorted
    * comma-joined string (deterministic collect). */
  def qCollectOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(concat_ws(",", sort_array(collect_list($"o_orderkey"))).as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  val qCollectOrdersSql: String =
    """SELECT o_custkey,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edit_distance" -> qEditDistance,
    "q_monthly_revenue" -> qMonthlyRevenue,
    "q_order_ranks" -> qOrderRanks,
    "q_collect_orders" -> qCollectOrders)

  val oracleSql: Map[String, String] = Map(
    "q_edit_distance" -> qEditDistanceSql,
    "q_monthly_revenue" -> qMonthlyRevenueSql,
    "q_order_ranks" -> qOrderRanksSql,
    "q_collect_orders" -> qCollectOrdersSql)
}
