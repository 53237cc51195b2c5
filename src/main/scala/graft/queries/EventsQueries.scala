package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-telemetry operators over the events stream — the job-event
  * analytics a 10^12-document crawl runs over its OWN telemetry (task
  * lifecycles, retries, failures): ordered funnel conversion, JSON
  * property extraction (the semi-structured payload every event bus
  * carries), and day-offset retention cohorts. Timestamps follow the
  * repo's parquet-NTZ contract: `ts.cast("timestamp").cast("long")` on
  * the Spark side, `CAST(floor(epoch(ts)) AS BIGINT)` in DuckDB — the
  * one bit-exact recipe across both engines (TESTDATA.md gotcha).
  */
object EventsQueries {

  // ---------------------------------------------------------------- funnel

  /** Attribution window: a purchase converts only within this many
    * seconds of the first signup (the industry-standard window clause —
    * without it this dense synthetic stream converts every user and the
    * flag is inert). */
  val FunnelWindowSec = 86400L

  /** ORDERED FUNNEL (signup → purchase conversion with the ORDER
    * constraint naive event-count joins get wrong: a purchase BEFORE the
    * signup must not count): per user, the first signup time, the first
    * purchase STRICTLY AFTER it, the windowed conversion flag, and the
    * lag. Users whose first eligible purchase lands outside the
    * [[FunnelWindowSec]] window report converted = 0 with the lag still
    * carried — the attribution-miss class.
    *
    * Scale shape: one user-keyed aggregate computes the first-signup
    * time; the second pass needs events again filtered against each
    * user's t1, which is a user-keyed co-partitioned join (both sides
    * hash on user_id — on a bucketed event store the exchange
    * disappears). No windows, no per-user sort. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type",
        $"ts".cast("timestamp").cast("long").as("ts_sec"))
    val step1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_sec").as("t_signup"))
    val allUsers = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"))
    val step2 = ev.filter($"event_type" === "purchase")
      .join(step1, Seq("user_id"))
      .filter($"ts_sec" > $"t_signup")
      .groupBy($"user_id").agg(min($"ts_sec").as("t_purchase"))
    allUsers
      .join(step1, Seq("user_id"), "left")
      .join(step2, Seq("user_id"), "left")
      .select($"user_id", $"n_events",
        coalesce($"t_signup", lit(-1L)).as("t_signup"),
        coalesce($"t_purchase", lit(-1L)).as("t_purchase"),
        ($"t_signup".isNotNull && $"t_purchase".isNotNull &&
          $"t_purchase" - $"t_signup" <= FunnelWindowSec)
          .cast("int").cast("long").as("converted"),
        when($"t_purchase".isNotNull, $"t_purchase" - $"t_signup")
          .otherwise(lit(-1L)).as("lag_seconds"))
      .orderBy($"user_id")
  }

  val qFunnelSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
       |  FROM events),
       |s1 AS (SELECT user_id, CAST(min(ts_sec) AS BIGINT) AS t_signup
       |       FROM ev WHERE event_type = 'signup' GROUP BY user_id),
       |au AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
       |       FROM ev GROUP BY user_id),
       |s2 AS (
       |  SELECT e.user_id, CAST(min(e.ts_sec) AS BIGINT) AS t_purchase
       |  FROM ev e JOIN s1 ON s1.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts_sec > s1.t_signup
       |  GROUP BY e.user_id)
       |SELECT au.user_id, au.n_events,
       |  COALESCE(s1.t_signup, -1) AS t_signup,
       |  COALESCE(s2.t_purchase, -1) AS t_purchase,
       |  CAST(CASE WHEN s1.user_id IS NOT NULL AND s2.user_id IS NOT NULL
       |        AND s2.t_purchase - s1.t_signup <= $FunnelWindowSec
       |       THEN 1 ELSE 0 END AS BIGINT) AS converted,
       |  CASE WHEN s2.user_id IS NOT NULL
       |       THEN s2.t_purchase - s1.t_signup ELSE -1 END AS lag_seconds
       |FROM au
       |LEFT JOIN s1 ON s1.user_id = au.user_id
       |LEFT JOIN s2 ON s2.user_id = au.user_id
       |ORDER BY au.user_id""".stripMargin

  // -------------------------------------------------- JSON props extraction

  /** SEMI-STRUCTURED PAYLOAD EXTRACTION (every event bus carries a JSON
    * props blob; the engine must read typed fields out of it without a
    * schema pass): `$.k` extracted per event (Spark get_json_object ↔
    * DuckDB json_extract — both return the raw scalar for a flat key),
    * rolled up per event_type: event count, distinct k values, k sum,
    * and min/max — the profile a payload column gets before promotion to
    * a real column.
    *
    * Scale shape: extraction is a per-row scalar fused into the scan;
    * one event_type-cardinality rollup with map-side partials. The
    * distinct count is exact over a bounded k domain (the same
    * value-domain argument as q_length_mad). */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Tables.spread: the JSON extraction is the per-row cost (a Jackson
    // parse per event) and the local events scan is one split
    Tables.spread(Tables.events(spark, dir).select($"event_type", $"props"))
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"k").as("n_distinct_k"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val qJsonPropsSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(min(k) AS BIGINT) AS min_k,
      |  CAST(max(k) AS BIGINT) AS max_k
      |FROM e WHERE k IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------ retention cohorts

  /** DAY-OFFSET RETENTION COHORTS (the activity-decay table every
    * long-running ingestion dashboard carries): cohort = each user's
    * first active day (epoch-day, exact integer); per (cohort_day,
    * day_offset) the count of distinct users from that cohort active at
    * that offset. offset 0 row = cohort size by construction — the
    * invariant the spec asserts.
    *
    * Scale shape: first-day is a user-keyed aggregate; activity days a
    * (user, day) distinct with map-side partials; the cohort join is
    * user-keyed co-partitioned; the final rollup is (cohort ×
    * offset)-sized. Nothing holds per-event state. */
  def qRetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, dir)
      .select($"user_id",
        expr("CAST(ts AS TIMESTAMP)").cast("long").as("ts_sec"))
      .select($"user_id", expr("ts_sec DIV 86400").as("day"))
      .distinct()
    val cohorts = days.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    days.join(cohorts, Seq("user_id"))
      .select($"cohort_day", ($"day" - $"cohort_day").as("day_offset"),
        $"user_id")
      .groupBy($"cohort_day", $"day_offset")
      .agg(countDistinct($"user_id").as("n_active"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val qRetentionCohortsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |cohorts AS (SELECT user_id, CAST(min(day) AS BIGINT) AS cohort_day
      |            FROM days GROUP BY user_id)
      |SELECT c.cohort_day, CAST(d.day - c.cohort_day AS BIGINT)
      |    AS day_offset,
      |  CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_active
      |FROM days d JOIN cohorts c ON c.user_id = d.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------------- event transitions

  /** EVENT-TYPE TRANSITION MATRIX (the first-order Markov profile of the
    * telemetry stream — the table behind "what usually follows an error?"
    * dashboards and anomalous-sequence detectors): per user, events in
    * (ts, event_id) order; consecutive pairs rolled up globally to
    * (from_type, to_type) with the row-conditional transition probability
    * in exact ‰ of each from_type's outgoing total.
    *
    * Scale shape: ONE user-keyed window (lag) — the stream's natural
    * partitioning — then a types²-sized rollup with map-side partials;
    * the from-totals ride a second tiny rollup joined back broadcast. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val pairs = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        $"ts".cast("timestamp").cast("long").as("ts_sec"))
      .withColumn("from_type", lag($"event_type", 1).over(w))
      .filter($"from_type".isNotNull)
      .groupBy($"from_type", $"event_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy($"from_type").agg(sum($"n").as("from_total"))
    pairs.join(totals, Seq("from_type"))
      .withColumn("p_permille", expr("n * 1000 DIV from_total"))
      .select($"from_type", $"to_type", $"n", $"from_total", $"p_permille")
      .orderBy($"from_type", $"to_type")
  }

  val qEventTransitionsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      |  FROM events),
      |lagged AS (
      |  SELECT event_type AS to_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts_sec, event_id) AS from_type
      |  FROM ev),
      |pairs AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM lagged WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total
      |        FROM pairs GROUP BY from_type)
      |SELECT p.from_type, p.to_type, p.n, t.from_total,
      |  p.n * 1000 // t.from_total AS p_permille
      |FROM pairs p JOIN tot t ON t.from_type = p.from_type
      |ORDER BY p.from_type, p.to_type""".stripMargin

  // ------------------------------------------------------ error-spike days

  /** ERROR-RATE SPIKE DETECTION (the incident-day finder run over job
    * telemetry — median + MAD on DAILY error counts, the robust cut mean
    * ± stddev gets wrong when the incident itself drags the baseline):
    * daily error counts with planted incident days (every day ≡ 3 mod 11
    * replays its error events twice more — the duplicate-delivery storm
    * an at-least-once bus produces; ×3 because at the smallest SF a mere
    * doubling of a ~7-error day sits exactly on the 3×MAD boundary and
    * the flag would be luck, not signal), lower-median and MAD over the day
    * series from value-domain histograms, per-day deviation and the
    * 3×MAD spike flag.
    *
    * Scale shape: the day rollup collapses the stream to ~days rows with
    * map-side partials; both medians are windows over that tiny table;
    * the two scalars broadcast back. Same histogram-median machinery as
    * q_length_mad, pointed at telemetry. */
  def qEventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val errs = Tables.events(spark, dir)
      .filter($"event_type" === "error")
      .select(expr("CAST(ts AS TIMESTAMP)").cast("long").as("ts_sec"))
      .select(expr("ts_sec DIV 86400").as("day"))
    val replayed = errs.filter($"day" % 11 === 3)
    val daily = errs.unionAll(replayed).unionAll(replayed)
      .groupBy($"day").agg(count(lit(1)).as("n_errors"))
    def histMedianVal(df: org.apache.spark.sql.DataFrame, c: String) =
      df.groupBy(expr(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum($"cnt").over(
          Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nn", sum($"cnt").over())
        .filter($"cum" >= expr("(nn + 1) DIV 2"))
        .agg(min($"v").as("med"))
    val med = histMedianVal(daily, "n_errors")
    val withDev = daily.crossJoin(broadcast(med))
      .withColumn("dev", abs($"n_errors" - $"med"))
    val mad = histMedianVal(withDev, "dev").withColumnRenamed("med", "mad")
    withDev.crossJoin(broadcast(mad))
      .withColumn("spike",
        ($"dev" > lit(3L) * greatest($"mad", lit(1L)))
          .cast("int").cast("long").as("spike"))
      .select($"day", $"n_errors", $"med", $"dev", $"mad", $"spike")
      .orderBy($"day")
  }

  val qEventAnomalySql: String =
    """WITH e AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events WHERE event_type = 'error'),
      |e2 AS (
      |  SELECT day FROM e
      |  UNION ALL SELECT day FROM e WHERE day % 11 = 3
      |  UNION ALL SELECT day FROM e WHERE day % 11 = 3),
      |daily AS (SELECT day, CAST(count(*) AS BIGINT) AS n_errors
      |          FROM e2 GROUP BY day),
      |m1 AS (
      |  SELECT CAST(min(v) AS BIGINT) AS med FROM (
      |    SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
      |    FROM (SELECT n_errors AS v, count(*) AS c FROM daily GROUP BY 1) h
      |  ) t WHERE cum >= (n + 1) // 2),
      |d AS (SELECT day, n_errors, med, abs(n_errors - med) AS dev
      |      FROM daily CROSS JOIN m1),
      |m2 AS (
      |  SELECT CAST(min(v) AS BIGINT) AS mad FROM (
      |    SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
      |    FROM (SELECT dev AS v, count(*) AS c FROM d GROUP BY 1) h
      |  ) t WHERE cum >= (n + 1) // 2)
      |SELECT day, n_errors, med, CAST(dev AS BIGINT) AS dev, mad,
      |  CAST(CASE WHEN dev > 3 * greatest(mad, 1) THEN 1 ELSE 0 END
      |    AS BIGINT) AS spike
      |FROM d CROSS JOIN m2 ORDER BY day""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> qFunnel,
    "q_json_props" -> qJsonProps,
    "q_retention_cohorts" -> qRetentionCohorts,
    "q_event_transitions" -> qEventTransitions,
    "q_event_anomaly" -> qEventAnomaly)

  val oracleSql: Map[String, String] = Map(
    "q_funnel" -> qFunnelSql,
    "q_json_props" -> qJsonPropsSql,
    "q_retention_cohorts" -> qRetentionCohortsSql,
    "q_event_transitions" -> qEventTransitionsSql,
    "q_event_anomaly" -> qEventAnomalySql)
}
