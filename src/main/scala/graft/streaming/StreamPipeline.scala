package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is explicitly batch-only
  * ("no streaming mode in v0", /root/reference/README.md:551; SURVEY §2.6),
  * so these are engine capabilities BEYOND the reference: the streaming
  * shapes a web-scale ingest would bolt onto the same kernels —
  * watermarked windowed aggregation and custom sessionization state.
  * Batch/streaming share the DataFrame API, so the quality-filter kernels
  * (pure functions in mapPartitions) lift unchanged onto readStream.
  */
object StreamPipeline {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionUpdate(user_id: Long, n_events: Long, closed: Boolean)

  /** Watermarked tumbling-window counts per event type (late data beyond
    * 10 minutes is dropped deterministically). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") * 100).cast("long")).as("value_cents"))

  /** The quality filter itself on a stream: the SAME pure kernels the
    * batch pipeline broadcasts (langid weights, KN models) run per-row in
    * a stateless streaming map — ingest-side filtering with identical
    * decisions to the batch path (StreamingSpec proves equality). */
  def qualityStream(spark: SparkSession,
      pages: Dataset[graft.synth.Page]): Dataset[graft.pipeline.QualityResult] = {
    import spark.implicits._
    val bcLang = spark.sparkContext.broadcast(graft.pipeline.LangId.default)
    val bcKn = spark.sparkContext.broadcast(graft.pipeline.Perplexity.models)
    pages.mapPartitions { iter =>
      val langModel = bcLang.value
      val knModels = bcKn.value
      val scratch = new graft.pipeline.LangIdScratch(langModel.langs.length)
      iter.map(p => graft.pipeline.QualityPipeline.decide(
        p.url, p.html, p.text, langModel, knModels, scratch,
        graft.pipeline.PipelineConfig()))
    }
  }

  /** Streaming exact dedup for a training-data ingest: documents are
    * deduped on their content hash within the watermark horizon —
    * `dropDuplicates` keeps bounded state because expired keys age out
    * with the 10-minute watermark (unbounded-state dedup would OOM a
    * 10^12-doc stream; the horizon is the ingest's dedup window, and
    * cross-horizon dups fall to the batch q_dedup_exact pass). */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming INCREMENTAL dedup against a static historical corpus — the
    * ingest-side counterpart of q_dedup_incremental: a Bloom filter built
    * once over history digests is broadcast and gates every micro-batch
    * row; definitely-new rows (Bloom miss — the common case for fresh
    * crawl content) bypass the join entirely, and only might-contain
    * candidates flow into an exact stream-static LEFT ANTI join for
    * verification. False positives therefore never drop a genuinely new
    * document, false negatives are impossible (Bloom property), and the
    * join's stream side is the candidate fraction, not the stream.
    * Output: the documents NOT present in history (the rows an ingest
    * would append). Within-stream dups are [[dedupStream]]'s job;
    * at 10^12-doc history shard the Bloom by the table's warc_ts bucket
    * (one filter per partition) instead of one giant broadcast. */
  def dedupAgainstHistory(spark: SparkSession, docs: DataFrame,
      history: DataFrame): DataFrame = {
    val hashes = history.select(md5(col("text")).as("h"))
    // filter capacity from the actual history cardinality (one cheap
    // count on the STATIC side, before the stream starts) — a fixed
    // capacity would quietly blow the fpp once history outgrows it
    // (round-4 ADVICE); correctness never depends on fpp (anti-join
    // verifies), only the pruning ratio does
    val bloom = hashes.stat.bloomFilter("h", math.max(1024L, hashes.count()), 0.01)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: String) => bloomBc.value.mightContainString(h))
    val hashed = docs.withColumn("h", md5(col("text")))
    val fresh = hashed.filter(!mightContain(col("h")))
    val verified = hashed.filter(mightContain(col("h")))
      .join(hashes, Seq("h"), "left_anti")
    fresh.unionByName(verified).drop("h")
  }

  /** Streaming FUZZY dedup against a static historical corpus — the
    * ingest-side counterpart of q_dedup_incremental_fuzzy. Near-dup
    * verdicts need a per-document argmax over verified candidates, which
    * is a batch-grained aggregation, so the production shape is
    * foreachBatch: every micro-batch (a crawl snapshot — FineWeb dedups
    * exactly at this grain) runs the SAME CleanQueries.fuzzyVerdicts
    * transform the batch oracle checks, and appends its verdicts to the
    * sink. Identical decisions to the batch path by construction —
    * StreamingSpec proves the union of micro-batch outputs row-equal to
    * one batch run over the same rows. The streamed side must carry
    * (batch_id, text). */
  def fuzzyVerdictStream(spark: SparkSession, docs: DataFrame,
      history: DataFrame, sinkPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the micro-batch DF belongs to a CLONED session — resolve the
        // registered expressions (shingle_set) against that session, not
        // the outer one, or analysis fails with UNRESOLVED_ROUTINE
        graft.queries.CleanQueries.fuzzyVerdicts(batch.sparkSession, batch, history)
          .write.mode("append").parquet(sinkPath)
      }
      .start()

  /** Custom session state: counts per user, session closes after 30 idle
    * minutes of event time (mapGroupsWithState — the streaming analogue of
    * the batch sessionize query q_sessionize). */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[SessionUpdate] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long), SessionUpdate](GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, _) = state.get
            state.remove()
            SessionUpdate(userId, n, closed = true)
          } else {
            val events = batch.toSeq
            val maxTs = events.map(_.ts.getTime).maxOption.getOrElse(0L)
            val (n0, lastTs) = state.getOption.getOrElse((0L, 0L))
            val newState = (n0 + events.size, math.max(lastTs, maxTs))
            state.update(newState)
            state.setTimeoutTimestamp(newState._2 + 30 * 60 * 1000)
            SessionUpdate(userId, newState._1, closed = false)
          }
      }
  }
}
