package graft.queries

import graft.functions.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Remaining operator coverage: multimodal binary metadata, cube/rollup,
  * set ops, semi-join, as-of (most-recent-prior) over the events stream. */
object MiscQueries {

  /** Binary media column → typed metadata through the real decode path
    * (synthetic container; the oracle recomputes the header arithmetic). */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val synthUdf = udf((id: Long) => Multimodal.synthMedia(id))
    val withBin = Tables.documents(spark, dir)
      .select($"doc_id", synthUdf($"doc_id").as("media"))
    Multimodal.withMeta(spark, withBin, "media")
      .select($"doc_id",
        $"media_meta.width".as("width"),
        $"media_meta.height".as("height"),
        $"media_meta.n_frames".as("n_frames"),
        octet_length($"media").as("n_bytes"))
      .orderBy($"doc_id")
  }

  val qMediaMetaSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 640 + 16 AS INT) AS width,
      |  CAST((doc_id * 31) % 480 + 16 AS INT) AS height,
      |  CAST(doc_id % 7 + 1 AS INT) AS n_frames,
      |  CAST(16 + doc_id % 64 + 8 AS INT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling through the real plumbing (binary → array<binary> of
    * every-2nd-frame slices), accounted as counts + byte totals the SQL
    * oracle re-derives from the deterministic media layout. */
  def qMediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val synthUdf = udf((id: Long) => Multimodal.synthMedia(id))
    val framesUdf = udf((b: Array[Byte]) => Multimodal.sampleFrames(b, 2))
    Tables.documents(spark, dir)
      .select($"doc_id", framesUdf(synthUdf($"doc_id")).as("frames"))
      .select($"doc_id",
        size($"frames").as("n_sampled"),
        expr("aggregate(frames, 0, (acc, x) -> acc + octet_length(x))").as("total_bytes"))
      .orderBy($"doc_id")
  }

  val qMediaFramesSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(doc_id % 64 + 8 AS BIGINT) AS p,
      |    CAST(doc_id % 7 + 1 AS BIGINT) AS n,
      |    unnest(range(0, CAST(doc_id % 7 + 1 AS BIGINT))) AS i
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS INT) AS n_sampled,
      |  CAST(sum(CASE WHEN i % 2 = 0
      |       THEN CAST(floor((i+1)*p/n) AS BIGINT) - CAST(floor(i*p/n) AS BIGINT)
      |       ELSE 0 END) AS INT) AS total_bytes
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** PIVOT: per-source doc counts spread across a FIXED language column
    * set (explicit pivot values — never inferred, so the output schema is
    * stable and the plan needs no extra distinct-values job; at 10^12
    * rows an inferred pivot would scan the table twice). */
  def qPivotLangSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val langs = Seq("de", "en", "es", "fr", "zh")
    Tables.documents(spark, dir)
      .groupBy($"source")
      .pivot("lang", langs)
      .agg(count(lit(1)))
      .na.fill(0L, langs)
      .orderBy($"source")
  }

  val qPivotLangSourceSql: String =
    """SELECT source,
      |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
      |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
      |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
      |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
      |  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** CUBE aggregation (dims coalesced to 'ALL' so both engines emit the
    * same shape without grouping_id bit-order differences). */
  def qCubeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(Relational.cents($"l_extendedprice")).as("base_cents"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n_rows", $"base_cents")
      .orderBy($"returnflag", $"linestatus")
  }

  val qCubeAggSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n_rows,
      |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS base_cents
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Set operators: customers that ordered INTERSECT customers with account
    * balance above zero, and EXCEPT below. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ordered = Tables.orders(spark, dir).select($"o_custkey".as("custkey")).distinct()
    val positive = Tables.customer(spark, dir).filter($"c_acctbal" > 0)
      .select($"c_custkey".as("custkey"))
    val both = ordered.intersect(positive).withColumn("set_op", lit("intersect"))
    val onlyOrdered = ordered.except(positive).withColumn("set_op", lit("except"))
    both.unionAll(onlyOrdered).select($"set_op", $"custkey")
      .orderBy($"set_op", $"custkey")
  }

  val qSetOpsSql: String =
    """SELECT * FROM (
      |  SELECT 'intersect' AS set_op, custkey FROM (
      |    SELECT DISTINCT o_custkey AS custkey FROM orders
      |    INTERSECT
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 0)
      |  UNION ALL
      |  SELECT 'except' AS set_op, custkey FROM (
      |    SELECT DISTINCT o_custkey AS custkey FROM orders
      |    EXCEPT
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 0)) t
      |ORDER BY set_op, custkey""".stripMargin

  /** Semi-join (EXISTS): orders containing at least one line with
    * quantity >= 49. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigLines = Tables.lineitem(spark, dir).filter($"l_quantity" >= 49.0)
    Tables.orders(spark, dir)
      .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .select($"o_orderkey")
      .orderBy($"o_orderkey")
  }

  val qSemiJoinSql: String =
    """SELECT o_orderkey FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
      |ORDER BY o_orderkey""".stripMargin

  /** As-of shape: for each purchase event, the most recent PRIOR event of
    * the same user (lag over the user's event-time order). */
  def qAsofPrior(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        $"ts".cast("timestamp").cast("long").as("ts_sec"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    ev.withColumn("prev_event_id", lag($"event_id", 1).over(w))
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"event_type" === "purchase" && $"prev_event_id".isNotNull)
      .select($"user_id", $"event_id", $"prev_event_id", $"prev_type")
      .orderBy($"user_id", $"event_id")
  }

  val qAsofPriorSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      |  FROM events),
      |lagged AS (
      |  SELECT user_id, event_id, event_type,
      |    lag(event_id) OVER w AS prev_event_id,
      |    lag(event_type) OVER w AS prev_type
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
      |SELECT user_id, event_id, prev_event_id, prev_type
      |FROM lagged
      |WHERE event_type = 'purchase' AND prev_event_id IS NOT NULL
      |ORDER BY user_id, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> qMediaMeta,
    "q_media_frames" -> qMediaFrames,
    "q_pivot_lang_source" -> qPivotLangSource,
    "q_cube_agg" -> qCubeAgg,
    "q_set_ops" -> qSetOps,
    "q_semi_join" -> qSemiJoin,
    "q_asof_prior" -> qAsofPrior)

  val oracleSql: Map[String, String] = Map(
    "q_media_meta" -> qMediaMetaSql,
    "q_media_frames" -> qMediaFramesSql,
    "q_pivot_lang_source" -> qPivotLangSourceSql,
    "q_cube_agg" -> qCubeAggSql,
    "q_set_ops" -> qSetOpsSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_asof_prior" -> qAsofPriorSql)
}
