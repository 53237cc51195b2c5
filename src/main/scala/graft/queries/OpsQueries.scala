package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline-assembly operators: the glue shapes a production corpus stack
  * runs BETWEEN the per-document scorers and the final corpus — attribute
  * stores mixed into keep/drop decisions (Dolma, Soldaini et al. '24),
  * domain-level reputation gates (RefinedWeb/Dolma run URL+domain filters
  * before any content look), crawl politeness budgeting (Mercator, Heydon
  * & Najork '99 §4), and keyword topic routing (the pre-classifier corpus
  * partitioning of C4/WebOrganizer-style mixes). Like every family here,
  * each operator is a deterministic in-query derivation both engines
  * replicate bit-for-bit, so the DuckDB oracle checks the OPERATOR.
  *
  *  - q_attribute_mixer — independent tagger relations joined by doc_id,
  *    boolean mix rule with first-failing-attribute attribution;
  *  - q_host_reputation — per-host keep-rate rollup broadcast back as a
  *    page-level gate (the domain-level filter channel);
  *  - q_crawl_politeness — per-host fetch-delay drain times folded into
  *    politeness queues, bottleneck host + hot-queue accounting;
  *  - q_topic_keywords — lexicon hit-count argmax with pinned tie order.
  */
object OpsQueries {

  /** Deterministic host derivation — the SAME host contract as
    * CrawlQueries.qUrlBlocklist (20 host labels × 4 registrable domains,
    * both pinned by doc_id so 20 distinct hosts result), so the
    * crawl-side queries share one host space. */
  private val hostExprSql =
    """'h' || CAST(doc_id % 20 AS STRING) || '.' ||
      |element_at(array('example.com', 'test.org', 'sample.net', 'tracker.xyz'),
      |           CAST(doc_id % 4 AS INT) + 1)""".stripMargin

  private val hostExprDuck =
    """'h' || CAST(doc_id % 20 AS VARCHAR) || '.' ||
      |list_extract(['example.com', 'test.org', 'sample.net', 'tracker.xyz'],
      |             CAST(doc_id % 4 AS INT) + 1)""".stripMargin

  // -------------------------------------------------------- attribute mixer

  /** Toxicity stand-in lexicon over the synthetic vocabulary. A real list
    * (a few thousand terms) arrives as a broadcast array feeding the same
    * filter lambda. */
  val ToxLexicon: Seq[String] = Seq("slow", "dup")

  /** ATTRIBUTE MIXER — the Dolma architecture (Soldaini et al. '24): each
    * tagger writes its own attribute relation keyed by document id, and
    * the mixer is a multi-way equi-join that applies a boolean rule with
    * per-document provenance (WHICH attribute dropped the doc, in a fixed
    * evaluation order: language → quality → toxicity). Taggers stay
    * independent — adding one never recomputes the others — which is the
    * operational reason production stacks store attributes out-of-band
    * instead of widening the page table.
    *
    * Scale shape: three tagger relations derived in separate plan branches
    * (in production: separately-materialized parquet bucketed by doc_id,
    * so the mixer join is co-partitioned and shuffle-free); here each
    * branch scans only the columns its tagger reads, and the joins key on
    * doc_id alone — no text enters any Exchange. The mix rule itself is a
    * projection over the joined row. */
  def qAttributeMixer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val attLang = docs.select($"doc_id",
      $"lang".isin("en", "es").cast("int").as("lang_ok"))
    val attQuality = docs
      .select($"doc_id",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1).as("n_words"),
        length(regexp_replace($"text", " ", "")).as("word_chars"))
      .select($"doc_id",
        ($"n_words" >= 25 &&
          floor($"word_chars" * 100L / $"n_words").between(200, 1200))
          .cast("int").as("quality_ok"))
    val lex = ToxLexicon.map(w => s"'$w'").mkString(", ")
    val attTox = docs
      .select($"doc_id",
        expr(s"""CAST(size(filter(split(lower(text), ' '),
                |  x -> array_contains(array($lex), x))) AS BIGINT)""".stripMargin)
          .as("tox_hits"))
      .select($"doc_id", $"tox_hits", ($"tox_hits" <= 2).cast("int").as("tox_ok"))
    attLang.join(attQuality, "doc_id").join(attTox, "doc_id")
      .select($"doc_id", $"lang_ok", $"quality_ok", $"tox_hits", $"tox_ok",
        ($"lang_ok" === 1 && $"quality_ok" === 1 && $"tox_ok" === 1)
          .cast("int").as("keep"),
        when($"lang_ok" === 0, "language")
          .when($"quality_ok" === 0, "quality")
          .when($"tox_ok" === 0, "toxicity")
          .otherwise("ok").as("reason"))
      .orderBy($"doc_id")
  }

  val qAttributeMixerSql: String = {
    val lex = ToxLexicon.map(w => s"'$w'").mkString(", ")
    s"""WITH att_lang AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN lang IN ('en', 'es') THEN 1 ELSE 0 END AS INT) AS lang_ok
       |  FROM documents),
       |qraw AS (
       |  SELECT doc_id,
       |    length(text) - length(replace(text, ' ', '')) + 1 AS n_words,
       |    length(replace(text, ' ', '')) AS word_chars
       |  FROM documents),
       |att_quality AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN n_words >= 25
       |              AND floor(word_chars * 100 / n_words) BETWEEN 200 AND 1200
       |         THEN 1 ELSE 0 END AS INT) AS quality_ok
       |  FROM qraw),
       |att_tox AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(lower(text), ' '),
       |      x -> list_contains([$lex], x))) AS BIGINT) AS tox_hits
       |  FROM documents)
       |SELECT l.doc_id, l.lang_ok, q.quality_ok, t.tox_hits,
       |  CAST(CASE WHEN t.tox_hits <= 2 THEN 1 ELSE 0 END AS INT) AS tox_ok,
       |  CAST(CASE WHEN l.lang_ok = 1 AND q.quality_ok = 1 AND t.tox_hits <= 2
       |       THEN 1 ELSE 0 END AS INT) AS keep,
       |  CASE WHEN l.lang_ok = 0 THEN 'language'
       |       WHEN q.quality_ok = 0 THEN 'quality'
       |       WHEN t.tox_hits > 2 THEN 'toxicity'
       |       ELSE 'ok' END AS reason
       |FROM att_lang l
       |JOIN att_quality q ON q.doc_id = l.doc_id
       |JOIN att_tox t ON t.doc_id = l.doc_id
       |ORDER BY l.doc_id""".stripMargin
  }

  // ------------------------------------------------------- host reputation

  /** HOST REPUTATION GATE — the domain-level filter channel (RefinedWeb
    * drops whole domains before content filtering; Dolma maintains a spam
    * domain list): per-host keep-rate under the document quality rule,
    * hosts below [[HostBlockPermille]] blocked outright, and the block decision joined
    * back onto every page so the output is the page-level verdict a mixer
    * consumes (final_keep = doc passes AND host not blocked).
    *
    * Scale shape: the reputation table is HOST-cardinality (≤10^8 rows at
    * web scale vs 10^12 pages) — a rollup with map-side partials, then a
    * broadcast join back onto the page stream; the per-doc quality
    * arithmetic is fused into the scan projection, so the only exchange
    * moving page-count rows is the host rollup's partial-agg shuffle. */
  /** Block cutoff: hosts keeping fewer than this permille of their pages
    * under the quality rule are dropped whole. 800 sits inside the real
    * per-host spread of the test corpus (680–1000‰ at both verify SFs) so
    * both decision classes are exercised; a production gate tunes this
    * against its own domain statistics. */
  val HostBlockPermille = 800L

  def qHostReputation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, dir)
      .select($"doc_id", expr(hostExprSql).as("host"),
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1).as("n_words"),
        length(regexp_replace($"text", " ", "")).as("word_chars"))
      .select($"doc_id", $"host",
        ($"n_words" >= 25 &&
          floor($"word_chars" * 100L / $"n_words").between(200, 1200))
          .cast("int").as("doc_keep"))
    val rep = perDoc.groupBy($"host")
      .agg(count(lit(1)).as("n_docs"), sum($"doc_keep").as("n_kept"))
      .select($"host",
        expr("n_kept * 1000 div n_docs").as("host_keep_permille"))
      .withColumn("host_blocked",
        ($"host_keep_permille" < HostBlockPermille).cast("int"))
    perDoc.join(broadcast(rep), "host")
      .select($"doc_id", $"host", $"doc_keep",
        $"host_keep_permille", $"host_blocked",
        ($"doc_keep" === 1 && $"host_blocked" === 0).cast("int").as("final_keep"))
      .orderBy($"doc_id")
  }

  val qHostReputationSql: String =
    s"""WITH per_doc AS (
       |  SELECT doc_id,
       |    $hostExprDuck AS host,
       |    CASE WHEN (length(text) - length(replace(text, ' ', '')) + 1) >= 25
       |              AND floor(length(replace(text, ' ', '')) * 100
       |                        / (length(text) - length(replace(text, ' ', '')) + 1))
       |                  BETWEEN 200 AND 1200
       |         THEN 1 ELSE 0 END AS doc_keep
       |  FROM documents),
       |rep AS (
       |  SELECT host,
       |    CAST(sum(doc_keep) * 1000 // count(*) AS BIGINT) AS host_keep_permille
       |  FROM per_doc GROUP BY host)
       |SELECT p.doc_id, p.host, CAST(p.doc_keep AS INT) AS doc_keep,
       |  r.host_keep_permille,
       |  CAST(CASE WHEN r.host_keep_permille < $HostBlockPermille THEN 1 ELSE 0 END AS INT)
       |    AS host_blocked,
       |  CAST(CASE WHEN p.doc_keep = 1 AND r.host_keep_permille >= $HostBlockPermille
       |       THEN 1 ELSE 0 END AS INT) AS final_keep
       |FROM per_doc p JOIN rep r ON r.host = p.host
       |ORDER BY p.doc_id""".stripMargin

  // ------------------------------------------------------ crawl politeness

  /** Per-fetch politeness delay (seconds) — one host is never hit more
    * often than this (Mercator §4's per-host queue discipline). */
  val PolitenessDelaySec = 2L

  /** Number of politeness queues (Mercator's "back queues"): each host
    * maps to exactly one queue, each queue serves its hosts serially. */
  val PolitenessQueues = 8

  /** CRAWL POLITENESS BUDGET — Mercator's back-queue accounting: every
    * host drains at one fetch per [[PolitenessDelaySec]], hosts hash into
    * [[PolitenessQueues]] serial queues, and the scheduler needs per-queue
    * drain time, the bottleneck host, and which queues run hot (≥150‰ of
    * total drain vs the 125‰ fair share) to rebalance before a crawl
    * cycle stalls on one queue.
    *
    * Scale shape: pages collapse to the host table first (map-side
    * partials; host-cardinality exchange), queues are a second rollup
    * over the host table, and the total is a 1-row broadcast — nothing
    * page-sized moves after the first partial agg. The bottleneck host
    * re-derives via a join against the queue maxima instead of a
    * max_by/arg-max (deterministic under ties: smallest host wins). */
  def qCrawlPoliteness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hosts = Tables.documents(spark, dir)
      .select(expr(hostExprSql).as("host"))
      .groupBy($"host").agg(count(lit(1)).as("n_pages"))
      .withColumn("drain_sec", $"n_pages" * lit(PolitenessDelaySec))
      .withColumn("queue",
        expr(s"(locate(substr(md5(host), 1, 1), '0123456789abcdef') - 1) % $PolitenessQueues")
          .cast("int"))
    val byQueue = hosts.groupBy($"queue")
      .agg(count(lit(1)).as("n_hosts"), sum($"n_pages").as("n_pages"),
        sum($"drain_sec").as("queue_drain_sec"),
        max($"drain_sec").as("max_host_drain_sec"))
    val bottleneck = hosts
      .join(broadcast(byQueue.select($"queue", $"max_host_drain_sec")), "queue")
      .filter($"drain_sec" === $"max_host_drain_sec")
      .groupBy($"queue").agg(min($"host").as("bottleneck_host"))
    val total = byQueue.agg(sum($"queue_drain_sec").as("total_drain_sec"))
    byQueue.join(broadcast(bottleneck), "queue")
      .crossJoin(broadcast(total))
      .select($"queue", $"n_hosts", $"n_pages", $"queue_drain_sec",
        $"max_host_drain_sec", $"bottleneck_host",
        expr("queue_drain_sec * 1000 div total_drain_sec").as("share_permille"))
      .withColumn("hot", ($"share_permille" >= 150).cast("int"))
      .orderBy($"queue")
  }

  val qCrawlPolitenessSql: String =
    s"""WITH hosts AS (
       |  SELECT host, count(*) AS n_pages,
       |    count(*) * $PolitenessDelaySec AS drain_sec,
       |    CAST((strpos('0123456789abcdef', substr(md5(host), 1, 1)) - 1)
       |         % $PolitenessQueues AS INT) AS queue
       |  FROM (SELECT $hostExprDuck AS host FROM documents) h
       |  GROUP BY host),
       |by_queue AS (
       |  SELECT queue, count(*) AS n_hosts, sum(n_pages) AS n_pages,
       |    sum(drain_sec) AS queue_drain_sec,
       |    max(drain_sec) AS max_host_drain_sec
       |  FROM hosts GROUP BY queue),
       |bottleneck AS (
       |  SELECT h.queue, min(h.host) AS bottleneck_host
       |  FROM hosts h JOIN by_queue q
       |    ON q.queue = h.queue AND h.drain_sec = q.max_host_drain_sec
       |  GROUP BY h.queue),
       |total AS (SELECT sum(queue_drain_sec) AS total_drain_sec FROM by_queue)
       |SELECT q.queue, CAST(q.n_hosts AS BIGINT) AS n_hosts,
       |  CAST(q.n_pages AS BIGINT) AS n_pages,
       |  CAST(q.queue_drain_sec AS BIGINT) AS queue_drain_sec,
       |  CAST(q.max_host_drain_sec AS BIGINT) AS max_host_drain_sec,
       |  b.bottleneck_host,
       |  CAST(q.queue_drain_sec * 1000 // t.total_drain_sec AS BIGINT)
       |    AS share_permille,
       |  CAST(CASE WHEN q.queue_drain_sec * 1000 // t.total_drain_sec >= 150
       |       THEN 1 ELSE 0 END AS INT) AS hot
       |FROM by_queue q JOIN bottleneck b ON b.queue = q.queue
       |CROSS JOIN total t
       |ORDER BY q.queue""".stripMargin

  // -------------------------------------------------------- topic routing

  /** Topic lexicons (name → keyword list), evaluated in lexicographic
    * name order for tie-breaking. A production router (WebOrganizer-style
    * topic mixes) ships thousands of terms per topic — they arrive as a
    * broadcast array feeding the same filter lambda. */
  val TopicLexicons: Seq[(String, Seq[String])] = Seq(
    "exec" -> Seq("scan", "join", "merge", "hash"),
    "plan" -> Seq("query", "sort", "order", "filter"),
    "storage" -> Seq("table", "column", "row", "part"))

  /** KEYWORD TOPIC ROUTER — lexicon hit counting with a pinned argmax:
    * per document, total occurrences of each topic's keywords; the doc
    * routes to the highest-hit topic, ties resolved toward the
    * lexicographically-smallest topic name, zero hits everywhere routes
    * to 'other'. This is the deterministic skeleton a learned topic
    * classifier drops into (the hit counts become logits), and the shape
    * data-mixture recipes consume (topic × tokens rollups).
    *
    * Scale shape: tokenize + three filter-folds + the argmax CASE all
    * fuse into ONE scan projection — text never leaves the row, zero
    * exchanges before the output sort. */
  def qTopicKeywords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def hits(words: Seq[String]): String = {
      val arr = words.map(w => s"'$w'").mkString(", ")
      s"CAST(size(filter(ws, x -> array_contains(array($arr), x))) AS BIGINT)"
    }
    val Seq((n1, l1), (n2, l2), (n3, l3)) = TopicLexicons
    Tables.documents(spark, dir)
      .select($"doc_id",
        expr("filter(split(lower(text), ' '), x -> x != '')").as("ws"))
      .select($"doc_id",
        expr(hits(l1)).as(s"hits_$n1"),
        expr(hits(l2)).as(s"hits_$n2"),
        expr(hits(l3)).as(s"hits_$n3"))
      .withColumn("topic",
        expr(s"""CASE WHEN greatest(hits_$n1, hits_$n2, hits_$n3) = 0 THEN 'other'
                |     WHEN hits_$n1 >= hits_$n2 AND hits_$n1 >= hits_$n3 THEN '$n1'
                |     WHEN hits_$n2 >= hits_$n3 THEN '$n2'
                |     ELSE '$n3' END""".stripMargin))
      .orderBy($"doc_id")
  }

  val qTopicKeywordsSql: String = {
    def hits(words: Seq[String]): String = {
      val arr = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(ws, x -> list_contains([$arr], x))) AS BIGINT)"
    }
    val Seq((n1, l1), (n2, l2), (n3, l3)) = TopicLexicons
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
       |  FROM documents),
       |h AS (
       |  SELECT doc_id,
       |    ${hits(l1)} AS hits_$n1,
       |    ${hits(l2)} AS hits_$n2,
       |    ${hits(l3)} AS hits_$n3
       |  FROM toks)
       |SELECT doc_id, hits_$n1, hits_$n2, hits_$n3,
       |  CASE WHEN greatest(hits_$n1, hits_$n2, hits_$n3) = 0 THEN 'other'
       |       WHEN hits_$n1 >= hits_$n2 AND hits_$n1 >= hits_$n3 THEN '$n1'
       |       WHEN hits_$n2 >= hits_$n3 THEN '$n2'
       |       ELSE '$n3' END AS topic
       |FROM h ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ CDC upsert

  /** Base snapshot: docs with doc_id < this, keyed by doc_id. */
  val CdcBaseMax = 400L
  /** Update slice: docs with doc_id ≥ this, re-keyed −[[CdcShift]] so they
    * collide with the base key range (200–399 = updates/deletes). */
  val CdcDeltaMin = 300L
  val CdcShift = 100L
  /** Insert slice: docs with doc_id ≥ this keep their own key (450–499 —
    * outside the base range → inserts; `% 10 = 5` rows arrive as
    * tombstones for keys that don't exist → delete_miss). */
  val CdcInsertMin = 450L

  /** CDC UPSERT MERGE (the Iceberg/Delta `MERGE INTO` ingestion shape: a
    * recrawl delta folded into the base snapshot with latest-wins
    * updates, inserts, and tombstone deletes — the table-maintenance
    * step BETWEEN crawls that q_recrawl_latest's within-table collapse
    * doesn't cover): base and delta are deterministic doc slices; the
    * delta carries updates (keys 200–399), inserts (450–499), tombstone
    * deletes (every `% 10 = 0` update row), and tombstones for ABSENT
    * keys (every `% 10 = 5` insert row → delete_miss, the idempotent
    * no-op a replayed delta produces). Output is one row per key with
    * the op class, whether the key survives the merge, the surviving
    * payload digest, and a changed flag on updates.
    *
    * Scale shape (10^12-row base): ONE full-outer join keyed by the
    * table key — exactly the shuffle MERGE INTO costs; on a bucketed
    * Iceberg table both sides are co-partitioned and the exchange
    * disappears. Tombstones ride the same join (no second scan), and
    * every op class is decided row-locally from the joined pair, so the
    * merge is deterministic under any partitioning. */
  def qCdcUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", md5($"text").as("payload"), $"n_chars")
    val base = docs.filter($"doc_id" < CdcBaseMax)
      .select($"doc_id".as("key"), $"payload".as("base_payload"),
        $"n_chars".as("base_chars"))
    val updates = docs.filter($"doc_id" >= CdcDeltaMin)
      .select(($"doc_id" - CdcShift).as("key"),
        $"payload".as("delta_payload"), $"n_chars".as("delta_chars"),
        ($"doc_id" % 10 === 0).cast("int").cast("long").as("tombstone"))
    val inserts = docs.filter($"doc_id" >= CdcInsertMin)
      .select($"doc_id".as("key"),
        $"payload".as("delta_payload"), $"n_chars".as("delta_chars"),
        ($"doc_id" % 10 === 5).cast("int").cast("long").as("tombstone"))
    val delta = updates.unionAll(inserts)
    base.join(delta, Seq("key"), "full_outer")
      .withColumn("op",
        when($"delta_payload".isNull, "carry")
          .when($"tombstone" === 1L && $"base_payload".isNotNull, "delete")
          .when($"tombstone" === 1L, "delete_miss")
          .when($"base_payload".isNull, "insert")
          .otherwise("update"))
      .withColumn("survives",
        ($"op".isin("carry", "insert", "update")).cast("int").cast("long"))
      .withColumn("payload",
        when($"survives" === 1L,
          coalesce($"delta_payload", $"base_payload")).otherwise(lit("")))
      .withColumn("chars_out",
        when($"survives" === 1L,
          coalesce($"delta_chars", $"base_chars")).otherwise(lit(-1L)))
      .withColumn("changed",
        ($"op" === "update" && $"delta_payload" =!= $"base_payload")
          .cast("int").cast("long"))
      .select($"key", $"op", $"survives", $"payload", $"chars_out", $"changed")
      .orderBy($"key")
  }

  val qCdcUpsertSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, md5(text) AS payload, n_chars FROM documents
       |  WHERE text IS NOT NULL),
       |base AS (
       |  SELECT doc_id AS key, payload AS base_payload,
       |    n_chars AS base_chars
       |  FROM docs WHERE doc_id < $CdcBaseMax),
       |delta AS (
       |  SELECT doc_id - $CdcShift AS key, payload AS delta_payload,
       |    n_chars AS delta_chars,
       |    CAST(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS BIGINT)
       |      AS tombstone
       |  FROM docs WHERE doc_id >= $CdcDeltaMin
       |  UNION ALL
       |  SELECT doc_id AS key, payload, n_chars,
       |    CAST(CASE WHEN doc_id % 10 = 5 THEN 1 ELSE 0 END AS BIGINT)
       |  FROM docs WHERE doc_id >= $CdcInsertMin),
       |m AS (
       |  SELECT COALESCE(b.key, d.key) AS key, b.base_payload, b.base_chars,
       |    d.delta_payload, d.delta_chars, d.tombstone,
       |    CASE WHEN d.delta_payload IS NULL THEN 'carry'
       |         WHEN d.tombstone = 1 AND b.base_payload IS NOT NULL
       |           THEN 'delete'
       |         WHEN d.tombstone = 1 THEN 'delete_miss'
       |         WHEN b.base_payload IS NULL THEN 'insert'
       |         ELSE 'update' END AS op
       |  FROM base b FULL OUTER JOIN delta d ON b.key = d.key)
       |SELECT key, op,
       |  CAST(CASE WHEN op IN ('carry', 'insert', 'update') THEN 1 ELSE 0
       |    END AS BIGINT) AS survives,
       |  CASE WHEN op IN ('carry', 'insert', 'update')
       |    THEN COALESCE(delta_payload, base_payload) ELSE '' END AS payload,
       |  CASE WHEN op IN ('carry', 'insert', 'update')
       |    THEN COALESCE(delta_chars, base_chars) ELSE -1 END AS chars_out,
       |  CAST(CASE WHEN op = 'update' AND delta_payload <> base_payload
       |    THEN 1 ELSE 0 END AS BIGINT) AS changed
       |FROM m ORDER BY key""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_attribute_mixer" -> qAttributeMixer,
    "q_host_reputation" -> qHostReputation,
    "q_crawl_politeness" -> qCrawlPoliteness,
    "q_topic_keywords" -> qTopicKeywords,
    "q_cdc_upsert" -> qCdcUpsert)

  val oracleSql: Map[String, String] = Map(
    "q_attribute_mixer" -> qAttributeMixerSql,
    "q_host_reputation" -> qHostReputationSql,
    "q_crawl_politeness" -> qCrawlPolitenessSql,
    "q_topic_keywords" -> qTopicKeywordsSql,
    "q_cdc_upsert" -> qCdcUpsertSql)
}
