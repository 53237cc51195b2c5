package graft

import graft.queries.{Relational, TextQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts the 100-TB posture depends on: filters reach
  * the parquet scan, projections prune the read schema, and the byte-level
  * shingle kernel is bit-identical to the String path on arbitrary input. */
class PlanShapeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q3_top_orders pushes its filters into the parquet scans") {
    val plan = formatted(Relational.q3TopOrders(spark, dir))
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
    // at least one scan carries a real pushed predicate, not just []
    assert("""PushedFilters: \[[^\]]+\]""".r.findFirstIn(plan).isDefined,
      s"every PushedFilters list is empty:\n$plan")
  }

  test("q_doc_tokens reads only the columns it projects") {
    val plan = formatted(TextQueries.qDocTokens(spark, dir))
    val readSchemas = """ReadSchema: struct<([^>]*)>""".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { s =>
      assert(!s.contains("text:") || s.split(",").length <= 3,
        s"scan reads more than it needs: $s")
      assert(!s.contains("source"), s"unused column read: $s")
    }
  }

  test("pipeline scan never reads warc_ts/lang (projection pruning)") {
    val df = graft.pipeline.QualityPipeline
      .runDf(spark, spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("concat('u', doc_id) AS url", "CAST(NULL AS BINARY) AS html",
          "text", "doc_id AS warc_ts_stand_in"))
      .toDF()
    // the InternalRow path prunes to (url, html, text) before toRdd
    assert(df.columns.toSeq.take(3) === Seq("url", "keep", "reason"))
  }

  test("shingle byte kernel == String kernel on arbitrary strings (seeded sweep)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(0xC0FFEE)
    val extras = "éü中∂ "
    for (trial <- 0 until 1000) {
      val len = rnd.nextInt(40)
      val mixed = trial % 2 == 1
      val s = (0 until len).map { _ =>
        if (mixed && rnd.nextInt(5) == 0) extras(rnd.nextInt(extras.length))
        else (32 + rnd.nextInt(95)).toChar
      }.mkString
      assert(graft.functions.TextHash.shingleSetUtf8(UTF8String.fromString(s)).toSeq ===
        graft.functions.TextHash.shingleSet(s).toSeq, s"mismatch on: '$s'")
    }
  }
}
