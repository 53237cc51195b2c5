package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core queries over the TPC-H-ish test tables.
  *
  * Determinism discipline for the DuckDB oracle compare: money aggregates are
  * emitted as exact integer cents (`round(x*100) :: long`) so Spark and
  * DuckDB hash identically regardless of float summation order; every result
  * carries an explicit total ORDER BY. At 100 TB these shapes rely on
  * partial aggregation + AQE; small dimension joins are broadcast.
  */
object Relational {

  /** Exact integer cents from a 2-decimal money double. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** TPC-H Q1-style pricing summary: single shuffle, map-side partial agg. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum(cents($"l_extendedprice")).as("sum_base_cents"),
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_cents"),
        count(lit(1)).as("count_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q3-style: revenue per order for a market segment, top 10 by revenue.
    * customer is small → broadcast; top-N is TakeOrderedAndProject. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_cents"))
      .orderBy($"revenue_cents".desc, $"l_orderkey")
      .limit(10)
  }

  /** Q5-style: revenue by nation for one region (joins across 5 tables;
    * dims broadcast, fact-fact join shuffles on the key). */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_cents"))
      .orderBy($"revenue_cents".desc, $"n_name")
  }

  /** Anti-join: customers with no big (>400k) order (NOT EXISTS). The filter
    * is pushed below the anti-join build side. */
  def qCustomersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val bigOrders = Tables.orders(spark, dir).filter($"o_totalprice" > 400000.0)
    cust.join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Window top-N: two largest orders per customer (row_number, total order
    * tie-broken by orderkey so the result is deterministic). */
  def qWindowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"price_cents".desc, $"o_orderkey")
    ord.select($"o_custkey", $"o_orderkey", cents($"o_totalprice").as("price_cents"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .orderBy($"o_custkey", $"rn")
  }

  /** Sessionization over the events stream table: a session break is a >30min
    * gap per user (lag + running sum of break flags — the batch shape of the
    * streaming stateful op). */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        $"ts".cast("timestamp").cast("long").as("ts_sec"))
    val byUser = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val withBreaks = ev
      .withColumn("prev_ts", lag($"ts_sec", 1).over(byUser))
      .withColumn("brk", when($"prev_ts".isNull || $"ts_sec" - $"prev_ts" > 1800, 1).otherwise(0))
      .withColumn("session_id", sum($"brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBreaks.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_sec").as("session_start"),
        max($"ts_sec").as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg,
    "q3_top_orders" -> q3TopOrders,
    "q5_region_revenue" -> q5RegionRevenue,
    "q_customers_no_orders" -> qCustomersNoOrders,
    "q_window_top_orders" -> qWindowTopOrders,
    "q_sessionize" -> qSessionize)

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  count(*) AS count_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, price_cents, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT) DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |brk AS (
        |  SELECT user_id, event_id, ts_sec,
        |    CASE WHEN lag(ts_sec) OVER w IS NULL
        |              OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |sess AS (
        |  SELECT user_id, ts_sec,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM brk)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_sec) AS session_start, max(ts_sec) AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)
}
