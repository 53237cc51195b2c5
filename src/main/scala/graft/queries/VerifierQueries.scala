package graft.queries

import graft.core.RvlNumeric
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-checkable projections of the rvl verifier operators (SURVEY §2.3/2.4)
  * over a deterministically perturbed old/new pair built from `orders`:
  *
  *   old = orders
  *   new = orders with totalprice shifted by (o_orderkey % 13 + 1) dollars
  *         for keys divisible by 97
  *
  * Deltas are exact integer cents so the top-K ordering, L1 totals and
  * coverage prefix agree bit-for-bit with the DuckDB oracle. These queries
  * are the *distributed plan shapes* used inside graft.verify.DiffJob
  * (key-health aggregation, anti-join key mismatch, TakeOrderedAndProject
  * top-K, window running-coverage) expressed as standalone checks.
  */
object VerifierQueries {

  // codegen'd native expression — not a UDF (graft.functions.RvlNumericParse)
  private def parseCents(spark: SparkSession, c: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.rvlParse(spark, c).cast("long")

  /** Perturbed pair columns: (key, old_cents, new_cents). */
  private def pair(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir).select(
      $"o_orderkey",
      round($"o_totalprice" * 100, 0).cast("long").as("old_cents"),
      (round($"o_totalprice" * 100, 0).cast("long") +
        when($"o_orderkey" % 97 === 0, ($"o_orderkey" % 13 + 1) * 100).otherwise(0L))
        .as("new_cents"))
  }

  private val pairSql =
    """pair AS (
      |  SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS old_cents,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |      + CASE WHEN o_orderkey % 97 = 0 THEN (o_orderkey % 13 + 1) * 100 ELSE 0 END AS new_cents
      |  FROM orders)""".stripMargin

  /** Top-25 contributors by (contribution desc, key asc) — the distributed
    * analogue of rvl's bounded heap (TakeOrderedAndProject). */
  def qDiffTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pair(spark, dir)
      .withColumn("delta_cents", $"new_cents" - $"old_cents")
      .filter($"delta_cents" =!= 0)
      .withColumn("contribution", abs($"delta_cents"))
      .orderBy($"contribution".desc, $"o_orderkey")
      .limit(25)
      .select($"o_orderkey", $"old_cents", $"new_cents", $"delta_cents", $"contribution")
  }

  val qDiffTopkSql: String =
    s"""WITH $pairSql
       |SELECT o_orderkey, old_cents, new_cents,
       |  new_cents - old_cents AS delta_cents,
       |  abs(new_cents - old_cents) AS contribution
       |FROM pair WHERE new_cents != old_cents
       |ORDER BY contribution DESC, o_orderkey LIMIT 25""".stripMargin

  /** Counts assembly (reference op 33): one row of exact totals. */
  def qDiffCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pair(spark, dir)
      .withColumn("contribution", abs($"new_cents" - $"old_cents"))
      .agg(
        count(lit(1)).as("rows_aligned"),
        sum(($"contribution" > 0).cast("long")).as("cells_changed"),
        sum($"contribution").as("total_change_cents"),
        max($"contribution").as("max_abs_delta_cents"))
  }

  val qDiffCountsSql: String =
    s"""WITH $pairSql
       |SELECT count(*) AS rows_aligned,
       |  CAST(sum(CASE WHEN new_cents != old_cents THEN 1 ELSE 0 END) AS BIGINT) AS cells_changed,
       |  CAST(sum(abs(new_cents - old_cents)) AS BIGINT) AS total_change_cents,
       |  CAST(max(abs(new_cents - old_cents)) AS BIGINT) AS max_abs_delta_cents
       |FROM pair""".stripMargin

  /** Coverage prefix (reference op 29): the smallest ranked prefix of the
    * TOP-25 contributors whose cumulative contribution reaches 95% of the
    * total — all 25 rows emitted when even the full cap can't cover it
    * (rvl's E_DIFFUSE). Distributed shape: the total is a plain
    * `agg(sum)`, the candidates come through TakeOrderedAndProject
    * (bounded, per-partition heaps — never a global sort), and the
    * running sum folds ≤25 rows on the driver. No WindowExec anywhere:
    * the previous global no-partition window serialized every changed
    * cell through one task. The 95% test is exact integer math
    * (`(cum-c)*100 < total*95`) so the DuckDB oracle agrees bit-for-bit. */
  def qDiffCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val changed = pair(spark, dir)
      .withColumn("contribution", abs($"new_cents" - $"old_cents"))
      .filter($"contribution" > 0)
    val totalRow = changed.agg(sum($"contribution")).head
    val totalCents = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val top = changed.orderBy($"contribution".desc, $"o_orderkey").limit(25)
      .select($"o_orderkey", $"contribution").as[(Long, Long)].collect()
    var cum = 0L
    val rows = top.toSeq.zipWithIndex.map { case ((key, c), i) =>
      cum += c
      (i + 1, key, c, cum, totalCents)
    }.filter { case (_, _, c, cm, tot) => (cm - c) * 100 < tot * 95 }
    spark.createDataset(rows)
      .toDF("rank", "o_orderkey", "contribution", "cum_cents", "total_cents")
  }

  val qDiffCoverageSql: String =
    s"""WITH $pairSql,
       |changed AS (
       |  SELECT o_orderkey, abs(new_cents - old_cents) AS contribution
       |  FROM pair WHERE new_cents != old_cents),
       |ranked AS (
       |  SELECT o_orderkey, contribution,
       |    row_number() OVER (ORDER BY contribution DESC, o_orderkey) AS rank,
       |    CAST(sum(contribution) OVER (ORDER BY contribution DESC, o_orderkey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
       |    CAST(sum(contribution) OVER () AS BIGINT) AS total_cents
       |  FROM changed)
       |SELECT CAST(rank AS INT) AS rank, o_orderkey, contribution, cum_cents, total_cents
       |FROM ranked
       |WHERE rank <= 25 AND (cum_cents - contribution) * 100 < total_cents * 95
       |ORDER BY rank""".stripMargin

  /** E_KEY_DUP evidence: injected duplicates, first-10 sorted (op 19). */
  def qKeyDupEvidence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_orderkey")
    val withDups = o.unionAll(o.filter($"o_orderkey" % 501 === 0))
    withDups.groupBy($"o_orderkey").count()
      .filter($"count" > 1)
      .select($"o_orderkey", $"count".as("n_occurrences"))
      .orderBy($"o_orderkey")
      .limit(10)
  }

  val qKeyDupEvidenceSql: String =
    """WITH side AS (
      |  SELECT o_orderkey FROM orders
      |  UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 501 = 0)
      |SELECT o_orderkey, count(*) AS n_occurrences
      |FROM side GROUP BY o_orderkey HAVING count(*) > 1
      |ORDER BY o_orderkey LIMIT 10""".stripMargin

  /** E_KEY_MISMATCH evidence: both anti-join directions, sorted samples
    * (op 20 — EXCEPT semantics). */
  def qKeyMismatchEvidence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select($"o_orderkey")
    val oldSide = o.filter($"o_orderkey" % 211 =!= 0)
    val newSide = o.filter($"o_orderkey" % 199 =!= 0)
    val missing = oldSide.join(newSide, Seq("o_orderkey"), "left_anti")
      .select(lit("missing_in_new").as("direction"), $"o_orderkey")
    val extra = newSide.join(oldSide, Seq("o_orderkey"), "left_anti")
      .select(lit("extra_in_new").as("direction"), $"o_orderkey")
    missing.unionAll(extra).orderBy($"direction", $"o_orderkey").limit(20)
  }

  val qKeyMismatchEvidenceSql: String =
    """WITH old_side AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 211 != 0),
      |new_side AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 199 != 0)
      |SELECT * FROM (
      |  SELECT 'missing_in_new' AS direction, o_orderkey FROM old_side
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM new_side)
      |  UNION ALL
      |  SELECT 'extra_in_new' AS direction, o_orderkey FROM new_side
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM old_side)) t
      |ORDER BY direction, o_orderkey LIMIT 20""".stripMargin

  /** E_MISSINGNESS first offender: min key where null-ness differs (op 12
    * first-offender discipline, distributed as a min aggregation). */
  def qMissingnessFirst(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        $"o_totalprice".as("old_v"),
        when($"o_orderkey" % 401 === 0, lit(null).cast("double"))
          .otherwise($"o_totalprice").as("new_v"))
      .filter($"old_v".isNull =!= $"new_v".isNull)
      .agg(min($"o_orderkey").as("first_offender"),
        count(lit(1)).as("n_offenders"))
  }

  val qMissingnessFirstSql: String =
    """SELECT min(o_orderkey) AS first_offender, count(*) AS n_offenders
      |FROM (
      |  SELECT o_orderkey, o_totalprice AS old_v,
      |    CASE WHEN o_orderkey % 401 = 0 THEN NULL ELSE o_totalprice END AS new_v
      |  FROM orders) t
      |WHERE (old_v IS NULL) != (new_v IS NULL)""".stripMargin

  /** Field audit (op 32): byte-exact text comparison on a perturbed column. */
  def qFieldAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        $"o_orderpriority".as("old_s"),
        when($"o_orderkey" % 173 === 0, lower($"o_orderpriority"))
          .otherwise($"o_orderpriority").as("new_s"))
      .filter(!($"old_s" <=> $"new_s"))
      .orderBy($"o_orderkey")
  }

  val qFieldAuditSql: String =
    """SELECT o_orderkey, old_s, new_s FROM (
      |  SELECT o_orderkey, o_orderpriority AS old_s,
      |    CASE WHEN o_orderkey % 173 = 0 THEN lower(o_orderpriority)
      |         ELSE o_orderpriority END AS new_s
      |  FROM orders) t
      |WHERE old_s IS DISTINCT FROM new_s
      |ORDER BY o_orderkey""".stripMargin

  /** Finance-format numeric parse (op 11): rvl's parser vs independently
    * constructed expected values. */
  def qNumericParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = round($"o_totalprice" * 100, 0).cast("long")
    Tables.orders(spark, dir)
      .select($"o_orderkey", cents.as("cents"),
        when($"o_orderkey" % 4 === 0, concat(lit("$"), cents.cast("string")))
          .when($"o_orderkey" % 4 === 1, concat(lit("("), cents.cast("string"), lit(")")))
          .when($"o_orderkey" % 4 === 2, concat(lit("+"), cents.cast("string")))
          .otherwise(concat(lit("  "), cents.cast("string"), lit("\t"))).as("raw"))
      .select($"o_orderkey", parseCents(spark, $"raw").as("parsed_cents"))
      .orderBy($"o_orderkey")
  }

  val qNumericParseSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 4 = 1
      |       THEN -CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |       ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END AS parsed_cents
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_diff_topk" -> qDiffTopk,
    "q_diff_counts" -> qDiffCounts,
    "q_diff_coverage" -> qDiffCoverage,
    "q_key_dup_evidence" -> qKeyDupEvidence,
    "q_key_mismatch_evidence" -> qKeyMismatchEvidence,
    "q_missingness_first" -> qMissingnessFirst,
    "q_field_audit" -> qFieldAudit,
    "q_numeric_parse" -> qNumericParse)

  val oracleSql: Map[String, String] = Map(
    "q_diff_topk" -> qDiffTopkSql,
    "q_diff_counts" -> qDiffCountsSql,
    "q_diff_coverage" -> qDiffCoverageSql,
    "q_key_dup_evidence" -> qKeyDupEvidenceSql,
    "q_key_mismatch_evidence" -> qKeyMismatchEvidenceSql,
    "q_missingness_first" -> qMissingnessFirstSql,
    "q_field_audit" -> qFieldAuditSql,
    "q_numeric_parse" -> qNumericParseSql)
}
