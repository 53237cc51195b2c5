package graft

import graft.streaming.StreamPipeline
import graft.streaming.StreamPipeline.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Structured Streaming shapes (beyond the batch-only reference):
  * watermarked windowed aggregation + mapGroupsWithState sessionization,
  * driven through MemoryStream with processAllAvailable. */
class StreamingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1767225600000L + min * 60000L)

  test("watermarked windowed counts aggregate by 5-minute windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamPipeline.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1, ts(0), "click", 1.0),
        Event(2, ts(1), "click", 2.0),
        Event(1, ts(6), "view", 3.5))
      query.processAllAvailable()
      val rows = spark.table("win_counts")
        .selectExpr("event_type", "n_events", "value_cents")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set(("click", 2L, 300L), ("view", 1L, 350L)))
    } finally query.stop()
  }

  test("streaming quality filter decides identically to the batch path") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[graft.synth.Page]
    val query = StreamPipeline.qualityStream(spark, input.toDS())
      .writeStream.format("memory").queryName("quality_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val pages = (0L until 200L).map(graft.synth.PageGen.generate)
      input.addData(pages)
      query.processAllAvailable()
      val streamed = spark.table("quality_stream")
        .as[graft.pipeline.QualityResult].collect().sortBy(_.url)
      val batch = graft.pipeline.QualityPipeline
        .run(spark, graft.synth.SynthSpark.pages(spark, 200L))
        .collect().sortBy(_.url)
      assert(streamed.length === 200)
      assert(streamed.toSeq === batch.toSeq)
    } finally query.stop()
  }

  test("q_stream_verdicts (oracle-facing) equals the batch verdicts on the full oracle corpus") {
    val cols = Seq("url", "keep", "reason", "lang_pred", "lang_score", "ppl",
      "n_tokens", "scrubbed_text")
    val streamed = graft.queries.PipelineQueries
      .qStreamVerdicts(spark, "/root/testdata/sf0.001").collect()
    val batch = graft.queries.PipelineQueries
      .qPipelineVerdicts(spark, "/root/testdata/sf0.001")
      .selectExpr(cols: _*).collect()
    assert(streamed.length === graft.queries.PipelineQueries.N)
    assert(streamed.toSeq === batch.toSeq,
      "streaming verdicts diverged from the batch pipeline")
  }

  test("streaming dedup drops same-content docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val query = StreamPipeline.dedupStream(docs)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts(0), "alpha body"),
        (2L, ts(1), "alpha body"), // exact dup of doc 1 -> dropped
        (3L, ts(2), "beta body"))
      query.processAllAvailable()
      input.addData(
        (4L, ts(3), "alpha body"), // still within watermark -> dropped
        (5L, ts(4), "gamma body"))
      query.processAllAvailable()
      val out = spark.table("dedup_stream").select("doc_id").as[Long].collect().sorted
      assert(out === Array(1L, 3L, 5L))
    } finally query.stop()
  }

  test("streaming incremental dedup vs static history: only new docs pass") {
    implicit val sqlCtx = spark.sqlContext
    // static history: docs 0..49 of the test corpus
    val history = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 50).select($"doc_id", $"text").cache()
    val histTexts = history.collect().map(_.getString(1))
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = StreamPipeline.dedupAgainstHistory(spark, docs, history)
      .writeStream.format("memory").queryName("incr_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (100L, histTexts(3)),          // re-crawl of history doc -> dropped
        (101L, "genuinely new page"),  // Bloom miss fast path -> kept
        (102L, histTexts(7)),          // re-crawl -> dropped
        (103L, "another new page"))    // kept
      query.processAllAvailable()
      val out = spark.table("incr_stream").select("doc_id").as[Long].collect().sorted
      assert(out === Array(101L, 103L),
        "history re-crawls must be dropped, new docs kept")
    } finally { query.stop(); history.unpersist() }
  }

  test("streaming FUZZY dedup vs history (foreachBatch) decides identically to the batch transform") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val history = graft.queries.Tables.documents(spark, dir)
      .filter($"doc_id" < 50).select($"doc_id", $"text").cache()
    val histTexts = history.collect().map(_.getString(1))
    val sink = java.nio.file.Files.createTempDirectory("fuzzy_sink").toString
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("batch_id", "text")
    val query = StreamPipeline.fuzzyVerdictStream(spark, docs, history, sink)
    // two micro-batches: exact recrawl, near-dup edit, genuinely new
    val rows = Seq(
      (100L, histTexts(3)),                               // dup_exact
      (101L, histTexts(7) + " nearly duplicate tail"),    // dup_near (long doc)
      (102L, "genuinely new page about something else"))  // new
    val rows2 = Seq(
      (103L, histTexts(3).toUpperCase),                   // new (case-changed)
      (104L, histTexts(11)))                              // dup_exact
    try {
      input.addData(rows: _*); query.processAllAvailable()
      input.addData(rows2: _*); query.processAllAvailable()
      val streamed = spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val batchOnce = graft.queries.CleanQueries.fuzzyVerdicts(spark,
          (rows ++ rows2).toDF("batch_id", "text"), history)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(streamed === batchOnce,
        "micro-batched verdicts must equal one batch run over the same rows")
      val verdicts = streamed.map(t => t._1 -> t._2).toMap
      assert(verdicts(100L) === "dup_exact")
      assert(verdicts(102L) === "new")
      assert(verdicts(104L) === "dup_exact")
    } finally { query.stop(); history.unpersist() }
  }

  test("mapGroupsWithState sessionization accumulates per-user counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamPipeline.sessionize(spark, input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Event(7, ts(0), "click", 1.0), Event(7, ts(2), "view", 1.0))
      query.processAllAvailable()
      input.addData(Event(7, ts(4), "click", 1.0), Event(9, ts(4), "signup", 1.0))
      query.processAllAvailable()
      val rows = spark.table("sessions").as[StreamPipeline.SessionUpdate]
        .collect().filter(!_.closed)
      val byUser = rows.groupBy(_.user_id).map { case (u, rs) => u -> rs.map(_.n_events).max }
      assert(byUser(7L) === 3L)
      assert(byUser(9L) === 1L)
    } finally query.stop()
  }
}
