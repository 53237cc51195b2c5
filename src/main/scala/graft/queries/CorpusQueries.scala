package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-hygiene dedup operators a web-text training pipeline runs
  * BEFORE document-level near-dup: line/paragraph-level boilerplate
  * removal (CCNet §3.1, Wenzek et al. '20 — dedup at paragraph
  * granularity over the whole corpus), normalization-keyed exact dedup
  * (case/punctuation variants that byte-exact hashing misses), and
  * Bloom-pruned incremental dedup of a new crawl snapshot against the
  * historical corpus (the cross-batch path — reference analogue: rvl's
  * keyed diff answers "what changed vs the last run"; here the corpus
  * itself is the history).
  *
  * All three follow the battery's dedupCorpus convention: Spark and the
  * DuckDB oracle construct the identical synthetic corpus inline, so the
  * operator logic — not the generator — is what the hash compare checks.
  */
object CorpusQueries {

  private val Boiler = "subscribe to our newsletter for updates"

  /** Line-level (paragraph-level) exact dedup, CCNet-style: every page is
    * split into lines, line occurrences are counted over the WHOLE
    * corpus, and only the canonical first occurrence (minimum
    * (page_id, idx), encoded as page_id*16+idx so min() needs no struct
    * ordering) of each repeated line survives; pages are reassembled
    * from the surviving lines. The corpus plants both failure modes:
    * per-page boilerplate (the same footer on every page) and a
    * cross-page duplicated paragraph.
    *
    * Scale shape (10^12 pages): line stats are grouped by md5 digest —
    * the shuffle carries (digest, count, min-pos), never text — and only
    * DUPLICATED lines' digests (a small fraction of distinct lines) are
    * joined back, so AQE broadcasts them and the line table itself never
    * shuffles for the match; the only full shuffle of text is the
    * page-reassembly groupBy, which is keyed by the table's natural
    * partitioning. Dropping-all-copies-but-one is order-independent by
    * construction (canonical min, not first-seen), so the result is
    * deterministic under any partitioning.
    */
  def qDedupLines(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val base = docs.select(
      floor($"doc_id" / 5).cast("long").as("page_id"),
      ($"doc_id" % 5).cast("int").as("idx"),
      $"text".as("line"))
    val boiler = base.select($"page_id").distinct()
      .select($"page_id", lit(5).as("idx"), lit(Boiler).as("line"))
    val injected = docs.filter($"doc_id" % 10 === 0).select(
      (floor($"doc_id" / 5).cast("long") + 1L).as("page_id"),
      lit(6).as("idx"), $"text".as("line"))
    val lines = base.unionAll(boiler).unionAll(injected)
      .withColumn("h", md5($"line"))
      .withColumn("pos", $"page_id" * 16 + $"idx")
    // only duplicated lines ship their stats back — at corpus scale this
    // is the small side, so AQE turns the match into a broadcast join
    val dups = lines.groupBy($"h")
      .agg(count(lit(1)).as("n"), min($"pos").as("first_pos"))
      .filter($"n" > 1)
    val flagged = lines.join(dups, Seq("h"), "left")
      .withColumn("keep", $"n".isNull || $"pos" === $"first_pos")
    flagged.groupBy($"page_id")
      .agg(
        count(when($"keep", 1)).as("n_kept"),
        count(when(!$"keep", 1)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when($"keep", struct($"idx", $"line")))),
            x => x.getField("line")),
          "\n").as("joined"))
      .select($"page_id", $"n_kept", $"n_dropped",
        when($"n_kept" > 0, $"joined").as("text"))
      .orderBy($"page_id")
  }

  val qDedupLinesSql: String =
    s"""WITH base AS (
       |  SELECT doc_id // 5 AS page_id, CAST(doc_id % 5 AS INT) AS idx, text AS line
       |  FROM documents),
       |boiler AS (
       |  SELECT DISTINCT page_id, 5 AS idx, '$Boiler' AS line FROM base),
       |injected AS (
       |  SELECT doc_id // 5 + 1 AS page_id, 6 AS idx, text AS line
       |  FROM documents WHERE doc_id % 10 = 0),
       |lines AS (
       |  SELECT *, md5(line) AS h, page_id * 16 + idx AS pos FROM (
       |    SELECT * FROM base
       |    UNION ALL SELECT * FROM boiler
       |    UNION ALL SELECT * FROM injected)),
       |dups AS (
       |  SELECT h, count(*) AS n, min(pos) AS first_pos
       |  FROM lines GROUP BY h HAVING count(*) > 1),
       |flagged AS (
       |  SELECT l.page_id, l.idx, l.line,
       |    (d.h IS NULL OR l.pos = d.first_pos) AS keep
       |  FROM lines l LEFT JOIN dups d ON d.h = l.h)
       |SELECT page_id,
       |  count(*) FILTER (WHERE keep) AS n_kept,
       |  count(*) FILTER (WHERE NOT keep) AS n_dropped,
       |  string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY idx) AS text
       |FROM flagged GROUP BY page_id ORDER BY page_id""".stripMargin

  /** Normalization-keyed exact dedup (CCNet §3.1: lowercase + strip
    * punctuation + collapse whitespace before hashing): catches the
    * case/punctuation variants that byte-exact md5 grouping misses. The
    * corpus plants an UPPERCASED copy (doc_id%9) and a
    * punctuation-decorated copy (doc_id%11); output is the duplicate
    * groups (n_docs ≥ 2) with the kept (minimum) doc and the full sorted
    * member list as evidence.
    *
    * Scale shape: one narrow map (normalize+digest) fused into the scan,
    * one hash aggregation over digests; group evidence strings are
    * bounded by group size. Same plan as q_dedup_exact — normalization
    * adds zero exchanges. */
  def qDedupNormalized(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = d
      .unionAll(d.filter($"doc_id" % 9 === 0)
        .select(($"doc_id" + 3000000).as("doc_id"), upper($"text").as("text")))
      .unionAll(d.filter($"doc_id" % 11 === 0)
        .select(($"doc_id" + 4000000).as("doc_id"),
          concat($"text", lit(" !!! ")).as("text")))
    val normed = corpus.withColumn("norm",
      trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " ")))
    normed.groupBy(md5($"norm").as("key_hash"))
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keep_doc"),
        array_join(
          transform(array_sort(collect_list($"doc_id")), _.cast("string")),
          ",").as("doc_ids"))
      .filter($"n_docs" >= 2)
      .select($"key_hash", $"n_docs", $"keep_doc", $"doc_ids")
      .orderBy($"keep_doc")
  }

  val qDedupNormalizedSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 3000000, upper(text) FROM documents WHERE doc_id % 9 = 0
      |  UNION ALL SELECT doc_id + 4000000, text || ' !!! ' FROM documents WHERE doc_id % 11 = 0),
      |normed AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM corpus)
      |SELECT md5(norm) AS key_hash, count(*) AS n_docs, min(doc_id) AS keep_doc,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
      |FROM normed GROUP BY md5(norm) HAVING count(*) >= 2
      |ORDER BY keep_doc""".stripMargin

  /** Bloom-pruned INCREMENTAL dedup: flag which documents of a new crawl
    * batch already exist in the historical corpus — without joining the
    * full batch against full history. A Bloom filter built over history
    * digests (one aggregation pass, `DataFrameStatFunctions.bloomFilter`)
    * is broadcast and prunes the batch to might-contain candidates; an
    * exact semi-join then verifies ONLY the candidates, so Bloom false
    * positives cannot reach the output and false negatives are impossible
    * by construction — the result is bit-identical to the plain
    * exists-join the oracle runs, at a fraction of the join input.
    *
    * Scale shape: at 10^12-document history a single Bloom no longer
    * broadcasts (~1.2 GB per 10^9 keys at 1% fpp) — shard it by the
    * table's warc_ts bucket (one bloom per partition, applied partition-
    * wise) or raise fpp; the exact-verify join keeps correctness
    * regardless of fpp. The pruning ratio is asserted in
    * CorpusDedupSpec, not just argued. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val history = docs.filter($"doc_id" % 2 === 0).select(md5($"text").as("h"))
    val batch = docs.filter($"doc_id" % 2 === 1)
      .unionAll(docs.filter($"doc_id" % 6 === 0)
        .select(($"doc_id" + 5000000).as("doc_id"), $"text"))
      .select($"doc_id", md5($"text").as("h"))
    // size the filter from the ACTUAL history cardinality (one cheap
    // count aggregate), not a fixed 1<<20: a fixed capacity silently
    // inflates the false-positive rate past the nominal 1% as soon as
    // history outgrows it, eroding exactly the pruning this query exists
    // for (round-4 ADVICE). Output exactness never depended on fpp — the
    // verify join guarantees it — but the CLAIMED pruning ratio now holds
    // at every scale factor.
    val bloom = history.stat.bloomFilter("h", math.max(1024L, history.count()), 0.01)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: String) => bloomBc.value.mightContainString(h))
    val candidates = batch.filter(mightContain($"h"))
    val dupIds = candidates.join(history, Seq("h"), "left_semi")
      .select($"doc_id", lit(1).as("dup"))
    batch.join(dupIds, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"dup", lit(0)).as("dup_of_history"))
      .orderBy($"doc_id")
  }

  /** Shards for the sharded incremental dedup: a stand-in for the per-
    * partition filter count a 10^12-doc table would carry (hundreds to
    * thousands). */
  val NumShards = 8

  /** Digest-hash shard key (see graft.functions.BloomSketch.shardCol for
    * why content-hash and not warc_ts sharding). */
  private def shardCol(h: org.apache.spark.sql.Column) =
    graft.functions.BloomSketch.shardCol(h, NumShards)

  /** SHARDED Bloom-pruned incremental dedup — the 10^12-history scale path
    * the flat query's docstring promises (round-4 verdict, Next #2): one
    * Bloom filter per content-hash shard, built in ONE grouped
    * aggregation over history and applied PARTITION-WISE via a shard-keyed
    * cogroup, so no filter is ever broadcast — each task deserializes
    * exactly the one filter its shard needs, and per-executor filter
    * memory is (assigned shards)/(total shards) of the filter bytes
    * instead of all of them. At 10^9 history keys per shard a filter is
    * ~1.2 MB per 10^6 keys at 1% fpp; shard count scales the per-task
    * filter down independently of history size. The exact LEFT SEMI
    * verify join is unchanged, so the output is bit-identical to
    * q_dedup_incremental (and to the oracle) at ANY shard count or fpp.
    *
    * The batch pays one shuffle on the shard key — the content-hash
    * partitioning the verify join wants anyway — and history streams once
    * into the filter aggregation. */
  def qDedupIncrementalSharded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val history = docs.filter($"doc_id" % 2 === 0).select(md5($"text").as("h"))
    val batch = docs.filter($"doc_id" % 2 === 1)
      .unionAll(docs.filter($"doc_id" % 6 === 0)
        .select(($"doc_id" + 5000000).as("doc_id"), $"text"))
      .select($"doc_id", md5($"text").as("h"))
    // per-shard expected items from the actual history count (uniform
    // hash sharding ⇒ ~count/shards per filter; 2× headroom keeps fpp
    // under nominal on the lumpiest shard)
    val perShard = math.max(1024L, 2L * history.count() / NumShards)
    val bloomAgg = udaf(new graft.functions.BloomSketch.BloomAgg(perShard, 0.01))
    val blooms = history.withColumn("shard", shardCol($"h"))
      .groupBy($"shard").agg(bloomAgg($"h").as("filter"))
      .as[(Int, Array[Byte])]
    val batchS = batch.select(shardCol($"h").as("shard"), $"doc_id", $"h")
      .as[(Int, Long, String)]
    // partition-wise application: cogroup routes each shard's single
    // filter to the task holding that shard's batch rows — deserialize
    // once per shard, probe per row; a shard with no history filter has
    // no dups by construction (every row is definitely new)
    val candidates = batchS.groupByKey(_._1)
      .cogroup(blooms.groupByKey(_._1)) { (_, rows, fs) =>
        if (!fs.hasNext) Iterator.empty
        else {
          val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(fs.next()._2))
          rows.filter(r => f.mightContainString(r._3)).map(r => (r._2, r._3))
        }
      }
      .toDF("doc_id", "h")
    val dupIds = candidates.join(history, Seq("h"), "left_semi")
      .select($"doc_id", lit(1).as("dup"))
    batch.join(dupIds, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"dup", lit(0)).as("dup_of_history"))
      .orderBy($"doc_id")
  }

  /** Per-shard filter sizes (shard, filter_bytes, history_keys) — the
    * BENCH.md evidence row for the sharded path and the spec's shape
    * assertions. */
  def incrementalShardStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val history = docs.filter($"doc_id" % 2 === 0).select(md5($"text").as("h"))
    val perShard = math.max(1024L, 2L * history.count() / NumShards)
    val bloomAgg = udaf(new graft.functions.BloomSketch.BloomAgg(perShard, 0.01))
    history.withColumn("shard", shardCol($"h"))
      .groupBy($"shard")
      .agg(bloomAgg($"h").as("filter"), count(lit(1)).as("history_keys"))
      .select($"shard", length($"filter").cast("long").as("filter_bytes"), $"history_keys")
      .orderBy($"shard")
  }

  /** Candidate count after Bloom pruning vs batch size — exposed for the
    * spec's pruning assertion (same corpus construction as the query). */
  def incrementalPruning(spark: SparkSession, dir: String): (Long, Long) = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val history = docs.filter($"doc_id" % 2 === 0).select(md5($"text").as("h"))
    val batch = docs.filter($"doc_id" % 2 === 1)
      .unionAll(docs.filter($"doc_id" % 6 === 0)
        .select(($"doc_id" + 5000000).as("doc_id"), $"text"))
      .select($"doc_id", md5($"text").as("h"))
    val bloom = history.stat.bloomFilter("h", math.max(1024L, history.count()), 0.01)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: String) => bloomBc.value.mightContainString(h))
    (batch.filter(mightContain($"h")).count(), batch.count())
  }

  val qDedupIncrementalSql: String =
    """WITH history AS (
      |  SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
      |batch AS (
      |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL SELECT doc_id + 5000000, md5(text) FROM documents WHERE doc_id % 6 = 0)
      |SELECT b.doc_id,
      |  CASE WHEN EXISTS (SELECT 1 FROM history h WHERE h.h = b.h)
      |       THEN 1 ELSE 0 END AS dup_of_history
      |FROM batch b ORDER BY doc_id""".stripMargin

  /** Content-keyed split of a corpus text column, exactly q_split_assign's
    * scheme (md5 nibble bucket, 205/25/26 → train/val/test). */
  private def splitCol: org.apache.spark.sql.Column = {
    val b = expr("(locate(substr(md5(text), 1, 1), '0123456789abcdef') - 1) * 16 + " +
      "(locate(substr(md5(text), 2, 1), '0123456789abcdef') - 1)")
    when(b < 205, "train").when(b < 230, "val").otherwise("test")
  }

  private val splitSqlExpr =
    """CASE WHEN (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |        + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) < 205 THEN 'train'
      |     WHEN (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
      |        + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) < 230 THEN 'val'
      |     ELSE 'test' END""".stripMargin

  /** Near-dup LEAKAGE detector: content-keyed splits (q_split_assign's
    * md5 scheme) guarantee exact duplicates land in one split — but a
    * NEAR-duplicate hashes differently and can cross the train/test
    * boundary, which is precisely the contamination an eval pipeline must
    * catch. This query joins the verified near-dup components against the
    * per-document split and reports every component spanning more than
    * one split, with the sorted split list as evidence.
    *
    * Scale shape: components come from the MATERIALIZED shared labels
    * intermediate (TextQueries.componentLabels — computed once per run,
    * ids only), so this query never re-pays the LSH+Jaccard+CC scoring
    * pipeline; the split is a per-row map; the rollup is one hash
    * aggregation keyed by component. */
  def qSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comps = TextQueries.componentLabels(spark, dir)
      .select($"id".as("doc_id"), $"comp".as("component"))
    // spread=false: one md5-nibble projection per row — trivial next to
    // the exchange a spread would add
    val splits = TextQueries.dedupCorpus(spark, dir, spread = false)
      .select($"doc_id", splitCol.as("split"))
    comps.join(splits, "doc_id")
      .groupBy($"component")
      .agg(count(lit(1)).as("n_docs"),
        size(collect_set($"split")).as("n_splits"),
        array_join(array_sort(collect_set($"split")), ",").as("splits"))
      .filter($"n_splits" > 1)
      .select($"component", $"n_docs", $"n_splits", $"splits")
      .orderBy($"component")
  }

  val qSplitLeakageSql: String =
    s"""${TextQueries.ccCtePrefix},
       |comp AS (
       |  SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
       |  FROM reach GROUP BY id),
       |splits AS (
       |  SELECT doc_id, $splitSqlExpr AS split FROM corpus),
       |comp_splits AS (
       |  SELECT DISTINCT c.component, s.split
       |  FROM comp c JOIN splits s ON s.doc_id = c.doc_id),
       |leaky AS (
       |  SELECT component, CAST(count(*) AS INT) AS n_splits,
       |    string_agg(split, ',' ORDER BY split) AS splits
       |  FROM comp_splits GROUP BY component HAVING count(*) > 1)
       |SELECT l.component, d.n_docs, l.n_splits, l.splits
       |FROM leaky l
       |JOIN (SELECT component, count(*) AS n_docs
       |      FROM comp GROUP BY component) d ON d.component = l.component
       |ORDER BY l.component""".stripMargin

  /** Leakage REPAIR: key the split by the near-dup COMPONENT instead of
    * the document — every member of a component (exact and near
    * duplicates alike) lands in one split by construction, closing the
    * contamination channel q_split_leakage detects. The split hash runs
    * over the component label's decimal string, so assignment stays
    * content-derived (via the component minimum) and reproducible.
    *
    * Scale shape: the MATERIALIZED labels table (ids only, computed once
    * per run — TextQueries.componentLabels) gets one per-row map; no new
    * shuffle and no scoring re-pass beyond what dedup already paid. */
  def qSplitRepair(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val comps = TextQueries.componentLabels(spark, dir)
      .select($"id".as("doc_id"), $"comp".as("component"))
    val b = (expr("locate(substr(md5(cast(component as string)), 1, 1), '0123456789abcdef') - 1") * 16 +
      expr("locate(substr(md5(cast(component as string)), 2, 1), '0123456789abcdef') - 1"))
    comps
      .withColumn("split",
        when(b < 205, "train").when(b < 230, "val").otherwise("test"))
      .select($"doc_id", $"component", $"split")
      .orderBy($"doc_id")
  }

  val qSplitRepairSql: String =
    s"""${TextQueries.ccCtePrefix},
       |comp AS (
       |  SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
       |  FROM reach GROUP BY id)
       |SELECT doc_id, component,
       |  CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(component AS VARCHAR)), 1, 1)) - 1) * 16
       |          + (strpos('0123456789abcdef', substr(md5(CAST(component AS VARCHAR)), 2, 1)) - 1) < 205 THEN 'train'
       |       WHEN (strpos('0123456789abcdef', substr(md5(CAST(component AS VARCHAR)), 1, 1)) - 1) * 16
       |          + (strpos('0123456789abcdef', substr(md5(CAST(component AS VARCHAR)), 2, 1)) - 1) < 230 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM comp ORDER BY doc_id""".stripMargin

  /** Token-window length for duplicated-passage detection. Lee et al.
    * use 50 BPE tokens on real web text; these synthetic docs are short,
    * so 8 words keeps the same "long enough that an exact match means a
    * copied passage, not chance" property (cf. DecontamN's 5 — the
    * substring rule wants longer runs than the contamination rule). */
  val SubstrW = 8

  /** Duplicated-PASSAGE detection (the ExactSubstr dedup of Lee et al.
    * '22, "Deduplicating Training Data Makes Language Models Better",
    * approximated at token-window granularity): a doc pair that shares
    * any [[SubstrW]]-word window shares a verbatim passage, which
    * document-level MinHash misses when the docs are otherwise different
    * (a quote, a syndicated paragraph) and line-dedup misses when the
    * copy spans or breaks line boundaries. Every doc emits its distinct
    * windows (stride 1), a window is DUPLICATED if ≥2 docs contain it,
    * and each doc reports its window count, duplicated-window count,
    * duplicated permille, and a flag at ≥500‰ — the per-doc evidence a
    * span-removal pass (the paper's suffix-array cut) would consume.
    *
    * Scale shape: windows travel as (doc_id, md5) — per-doc
    * array_distinct happens INSIDE the projection so neither text nor
    * word arrays enter any Exchange (the q_decontaminate discipline);
    * the duplicated-digest set is the small side (true at corpus scale:
    * most windows are unique) so AQE broadcasts it for the join-back;
    * the rest is two ids-only aggregations. The suffix-array original
    * needs a global sort of every token position — this banded form is
    * the join-friendly equivalent that scales linearly in windows. */
  def qDedupSubstrings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = SubstrW
    // CACHE the per-doc window digests: the dup-digest aggregation and the
    // probe side of the left join both read this subtree, and without the
    // cache each evaluation re-pays the split/slice/concat/md5 chain over
    // every window position (the dominant per-row cost of this query —
    // ~0.9M windows at sf0.1). Harnesses clearCache() after each query.
    val wins = TextQueries.dedupCorpus(spark, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        s"""array_distinct(CASE WHEN size(ws) >= $w
           |  THEN transform(sequence(1, size(ws) - ${w - 1}),
           |                 i -> concat_ws(' ', slice(ws, i, $w)))
           |  ELSE array() END)""".stripMargin)).as("g"))
      .select($"doc_id", md5($"g").as("h"))
      .cache()
    // after per-doc distinct, count(*) per digest = number of docs holding
    // it. LEFT-join the duplicated set onto the windows and aggregate
    // ONCE: the window-hashing subtree is evaluated twice (digest agg +
    // probe side) instead of the three passes a dup-agg/per-doc-agg/join
    // split costs — count($"d") counts matched (duplicated) windows only
    val dup = wins.groupBy($"h").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= 2).select($"h", lit(1).as("d"))
    wins.join(dup, Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_windows"), count($"d").as("n_dup_windows"))
      .withColumn("dup_permille", expr("n_dup_windows * 1000 div n_windows"))
      .withColumn("flagged", ($"dup_permille" >= 500).cast("int"))
      .orderBy($"doc_id")
  }

  val qDedupSubstringsSql: String = {
    val w = SubstrW
    val gramExpr = (0 until w)
      .map(j => s"list_extract(ws, i + $j)")
      .mkString(" || ' ' || ")
    s"""WITH ${TextQueries.dedupCorpusSql},
       |words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
       |pos AS (SELECT doc_id, ws, unnest(range(1, len(ws) - ${w - 2})) AS i FROM words),
       |win AS (SELECT DISTINCT doc_id, md5($gramExpr) AS h FROM pos),
       |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
       |per AS (SELECT doc_id, count(*) AS n_windows FROM win GROUP BY doc_id),
       |dp AS (SELECT w.doc_id, count(*) AS n_dup
       |  FROM win w JOIN dup d ON d.h = w.h GROUP BY w.doc_id)
       |SELECT p.doc_id, CAST(p.n_windows AS BIGINT) AS n_windows,
       |  CAST(coalesce(dp.n_dup, 0) AS BIGINT) AS n_dup_windows,
       |  CAST(coalesce(dp.n_dup, 0) * 1000 // p.n_windows AS BIGINT) AS dup_permille,
       |  CAST(CASE WHEN coalesce(dp.n_dup, 0) * 1000 // p.n_windows >= 500
       |       THEN 1 ELSE 0 END AS INT) AS flagged
       |FROM per p LEFT JOIN dp ON dp.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin
  }

  /** Maximal duplicated SPANS — the output ExactSubstr dedup actually
    * ships (Lee et al. '22 §4: cut the repeated substring, keep the rest
    * of the doc). Where [[qDedupSubstrings]] flags documents, this names
    * the word intervals to cut: every window whose text occurs ≥2 times
    * in the corpus (including within-doc verbatim repeats — the paper
    * dedups those too; q_dedup_substrings' cross-doc rule is the
    * document-level view) marks its [i, i+W-1] word interval, and
    * overlapping/adjacent intervals merge into maximal spans by the
    * classic running-max island rule. Per doc: span count, words covered
    * by the span union (no double counting), longest span, and covered
    * permille — enough for a downstream pass to cut spans or drop docs.
    *
    * Scale shape: same skeleton as q_dedup_substrings (windows travel as
    * (doc_id, pos, md5); the duplicated-digest set is the broadcast-small
    * side), plus one per-doc sort for the interval merge — a window
    * function partitioned by doc_id, whose partitions are doc-sized
    * (bounded) regardless of corpus size. The suffix-array original
    * needs a corpus-wide suffix sort; this gets the same spans with one
    * digest aggregation and a per-doc merge. */
  def qDedupSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = SubstrW
    // CACHE shared by the dup-digest aggregation and the probe side —
    // same double-evaluation saving as q_dedup_substrings
    val wins = TextQueries.dedupCorpus(spark, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", size($"ws").as("n_words"), $"ws",
        explode(expr(s"CASE WHEN size(ws) >= $w THEN sequence(1, size(ws) - ${w - 1}) ELSE array() END")).as("i"))
      .select($"doc_id", $"n_words", $"i",
        md5(expr(s"concat_ws(' ', slice(ws, i, $w))")).as("h"))
      .cache()
    // occurrence count ≥ 2 (not distinct docs): a verbatim repeat within
    // one doc is a duplicated passage too. LEFT-join the duplicated set
    // onto ALL windows and run the island merge flag-aware (running max
    // / min / max over `when(d, …)` ignore the non-duplicated rows), so
    // the window-hashing subtree is evaluated twice instead of three
    // times (dup agg + probe; no separate distinct-docs pass)
    val dup = wins.groupBy($"h").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2).select($"h", lit(1).as("d"))
    val byDoc = Window.partitionBy($"doc_id").orderBy($"i")
    val prevMaxEnd = max(when($"d".isNotNull, $"i" + (w - 1)))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val lvl1 = wins.join(dup, Seq("h"), "left")
      .withColumn("ni",
        when($"d".isNotNull && (prevMaxEnd.isNull || $"i" > prevMaxEnd + 1), 1)
          .otherwise(0))
      .withColumn("island",
        sum($"ni").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"n_words", $"island")
      .agg(min(when($"d".isNotNull, $"i")).as("s"),
        max(when($"d".isNotNull, $"i" + (w - 1))).as("e"))
    lvl1.groupBy($"doc_id", $"n_words")
      .agg(count($"s").as("n_spans"),
        coalesce(sum($"e" - $"s" + 1), lit(0L)).as("dup_words"),
        coalesce(max($"e" - $"s" + 1), lit(0)).cast("long").as("longest_span_words"))
      .select($"doc_id", $"n_words".cast("long").as("n_words"),
        $"n_spans", $"dup_words", $"longest_span_words")
      .withColumn("dup_permille", expr("dup_words * 1000 div n_words"))
      .orderBy($"doc_id")
  }

  val qDedupSpansSql: String = {
    val w = SubstrW
    val gramExpr = (0 until w)
      .map(j => s"list_extract(ws, i + $j)")
      .mkString(" || ' ' || ")
    val e = w - 1
    s"""WITH ${TextQueries.dedupCorpusSql},
       |words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
       |pos AS (SELECT doc_id, len(ws) AS n_words, ws,
       |  unnest(range(1, len(ws) - ${w - 2})) AS i FROM words),
       |win AS (SELECT doc_id, n_words, i, md5($gramExpr) AS h FROM pos),
       |dup AS (SELECT h FROM win GROUP BY h HAVING count(*) >= 2),
       |dw AS (SELECT w.doc_id, w.n_words, w.i FROM win w JOIN dup d ON d.h = w.h),
       |m AS (SELECT doc_id, n_words, i,
       |  CASE WHEN max(i + $e) OVER (PARTITION BY doc_id ORDER BY i
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |       OR i > max(i + $e) OVER (PARTITION BY doc_id ORDER BY i
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |       THEN 1 ELSE 0 END AS ni
       |  FROM dw),
       |isl AS (SELECT doc_id, n_words, i,
       |  sum(ni) OVER (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM m),
       |agg AS (SELECT doc_id, n_words, island, min(i) AS s, max(i + $e) AS e
       |  FROM isl GROUP BY doc_id, n_words, island),
       |per AS (SELECT doc_id, n_words, count(*) AS n_spans,
       |  sum(e - s + 1) AS dup_words, max(e - s + 1) AS longest
       |  FROM agg GROUP BY doc_id, n_words),
       |docs AS (SELECT DISTINCT doc_id, n_words FROM win)
       |SELECT d.doc_id, CAST(d.n_words AS BIGINT) AS n_words,
       |  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(coalesce(p.dup_words, 0) AS BIGINT) AS dup_words,
       |  CAST(coalesce(p.longest, 0) AS BIGINT) AS longest_span_words,
       |  CAST(coalesce(p.dup_words, 0) * 1000 // d.n_words AS BIGINT) AS dup_permille
       |FROM docs d LEFT JOIN per p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** SPAN-CUT APPLY — the dedup ACTION ExactSubstr ships (Lee et al. '22
    * §4.1: remove all but one occurrence of every repeated substring;
    * [[qDedupSpans]] names the intervals, this cuts them and reassembles
    * the text). Every duplicated window (occurrences ≥ 2, within-doc
    * repeats included) elects a CANONICAL occurrence — the corpus-wide
    * minimum (doc, position), the same order-independent rule as
    * q_dedup_lines — and every NON-canonical occurrence marks its word
    * interval for cutting; intervals merge into maximal cut spans
    * (running-max islands) and the doc reassembles from the surviving
    * words. Exactly one copy of each repeated window survives somewhere
    * in the corpus, and the output is deterministic under any
    * partitioning because canonicality is a min, not first-seen.
    *
    * Scale shape: the q_dedup_substrings skeleton — windows travel as
    * (doc_id, pos, md5), the duplicated-digest set with its canonical
    * position is the broadcast-small side — plus the per-doc island
    * merge (doc-bounded window partitions) and the reassembly groupBy
    * (the corpus's natural doc-keyed exchange, carrying surviving words
    * once). */
  def qDedupSpansCut(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = SubstrW
    // base is read three times (window expansion, word re-expansion for
    // reassembly, final doc roster) and wins twice (canonical-dup agg +
    // probe); cache both so the split / window-digest chains run once.
    // Harnesses clearCache() after each query.
    val base = TextQueries.dedupCorpus(spark, dir)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", size($"ws").as("n_words"), $"ws")
      .cache()
    val wins = base
      .select($"doc_id", $"n_words", $"ws",
        explode(expr(s"CASE WHEN size(ws) >= $w THEN sequence(1, size(ws) - ${w - 1}) ELSE array() END")).as("i"))
      .select($"doc_id", $"n_words", $"i",
        ($"doc_id" * 1048576L + $"i").as("pos_key"),
        md5(expr(s"concat_ws(' ', slice(ws, i, $w))")).as("h"))
      .cache()
    val dupCanon = wins.groupBy($"h")
      .agg(count(lit(1)).as("n"), min($"pos_key").as("canon"))
      .filter($"n" >= 2).select($"h", $"canon")
    val cuts = wins.join(dupCanon, Seq("h"))
      .filter($"pos_key" =!= $"canon")
      .select($"doc_id", $"i")
    val byDoc = Window.partitionBy($"doc_id").orderBy($"i")
    val prevMaxEnd = max($"i" + (w - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = cuts
      .withColumn("ni",
        when(prevMaxEnd.isNull || $"i" > prevMaxEnd + 1, 1).otherwise(0))
      .withColumn("island",
        sum($"ni").over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"island")
      .agg(min($"i").as("s"), max($"i" + (w - 1)).as("e"))
    // Reassembly WITHOUT exploding the corpus's words into a shuffle:
    // docs with cut spans are the small side (only duplicated passages),
    // so collect each doc's merged spans into one array row, broadcast,
    // and filter/join the surviving words INSIDE the projection over the
    // cached base. The prior shape posexploded every word, anti-joined
    // against the exploded covered positions, and re-aggregated the doc
    // (collect_list + array_sort) — three extra doc-keyed exchanges
    // carrying every word of the corpus. Output is identical: positions
    // ascend, so the filtered transform preserves word order.
    val spanArr = spans.groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"s", $"e"))).as("cut_spans"),
        count(lit(1)).as("spans0"))
    base
      .join(broadcast(spanArr), Seq("doc_id"), "left")
      // outer coalesce: a null text (null ws) null-propagates through
      // sequence/filter; the empty array restores the prior shape's
      // n_kept_words=0 / clean_text='' for such rows (latent — current
      // testdata has no null texts)
      .withColumn("kept_idx", expr(
        """coalesce(
          |  filter(sequence(1, size(ws)),
          |    i -> NOT exists(coalesce(cut_spans, array()),
          |                    sp -> i >= sp.s AND i <= sp.e)),
          |  array())""".stripMargin))
      .select($"doc_id", $"n_words".cast("long").as("n_words"),
        size($"kept_idx").cast("long").as("n_kept_words"),
        ($"n_words" - size($"kept_idx")).cast("long").as("n_cut_words"),
        coalesce($"spans0", lit(0L)).as("n_cut_spans"),
        array_join(transform($"kept_idx", i => element_at($"ws", i)), " ")
          .as("clean_text"))
      .orderBy($"doc_id")
  }

  val qDedupSpansCutSql: String = {
    val w = SubstrW
    val gramExpr = (0 until w)
      .map(j => s"list_extract(ws, i + $j)")
      .mkString(" || ' ' || ")
    val e = w - 1
    s"""WITH ${TextQueries.dedupCorpusSql},
       |words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
       |base AS (SELECT doc_id, len(ws) AS n_words, ws FROM words),
       |pos AS (SELECT doc_id, n_words, ws,
       |  unnest(range(1, len(ws) - ${w - 2})) AS i FROM base),
       |win AS (SELECT doc_id, i, doc_id * 1048576 + i AS pos_key,
       |  md5($gramExpr) AS h FROM pos),
       |dupc AS (SELECT h, min(pos_key) AS canon FROM win
       |  GROUP BY h HAVING count(*) >= 2),
       |cuts AS (SELECT w.doc_id, w.i FROM win w
       |  JOIN dupc d ON d.h = w.h WHERE w.pos_key <> d.canon),
       |m AS (SELECT doc_id, i,
       |  CASE WHEN max(i + $e) OVER (PARTITION BY doc_id ORDER BY i
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |       OR i > max(i + $e) OVER (PARTITION BY doc_id ORDER BY i
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |       THEN 1 ELSE 0 END AS ni
       |  FROM cuts),
       |isl AS (SELECT doc_id, i,
       |  sum(ni) OVER (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM m),
       |spans AS (SELECT doc_id, island, min(i) AS s, max(i + $e) AS e
       |  FROM isl GROUP BY doc_id, island),
       |covered AS (SELECT doc_id, unnest(range(s, e + 1)) AS widx FROM spans),
       |wix AS (SELECT doc_id, unnest(ws) AS word,
       |  generate_subscripts(ws, 1) AS widx FROM base),
       |kept AS (
       |  SELECT x.doc_id, CAST(count(*) AS BIGINT) AS kept0,
       |    string_agg(x.word, ' ' ORDER BY x.widx) AS clean0
       |  FROM wix x LEFT JOIN covered c
       |    ON c.doc_id = x.doc_id AND c.widx = x.widx
       |  WHERE c.widx IS NULL
       |  GROUP BY x.doc_id),
       |ss AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS spans0
       |  FROM spans GROUP BY doc_id)
       |SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
       |  coalesce(k.kept0, 0) AS n_kept_words,
       |  CAST(b.n_words AS BIGINT) - coalesce(k.kept0, 0) AS n_cut_words,
       |  coalesce(ss.spans0, 0) AS n_cut_spans,
       |  coalesce(k.clean0, '') AS clean_text
       |FROM base b
       |LEFT JOIN kept k ON k.doc_id = b.doc_id
       |LEFT JOIN ss ON ss.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** URL CANONICALIZATION dedup — the first-line dedup every crawl
    * pipeline runs before touching content: the same page arrives under
    * scheme/case variants, `www.` prefixes, tracking query params
    * (`utm_*`), fragments, and trailing slashes. Rules applied (the
    * common production subset, each independently exercised by the
    * derived corpus): drop the fragment; drop the scheme; lowercase the
    * host and strip one leading `www.`; drop query parameters whose name
    * starts with `utm_` (keeping the rest in order); strip a trailing
    * slash from a non-root path. Each doc reports its canonical url and
    * host plus its duplicate group (count + min-doc_id representative).
    * URLs are derived deterministically from doc_id IN THE QUERY — both
    * engines build byte-identical inputs, so the hash compare checks the
    * canonicalizer, not a generator.
    *
    * Scale shape: canonicalization is a pure per-row map fused into the
    * scan (string builtins only — no UDF, no regex); the only shuffle is
    * the group-by on the canonical url (short strings + ids), the same
    * exchange any url-keyed crawl table already pays. */
  def qUrlCanonical(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = expr(
      """concat(
        |  CASE WHEN doc_id % 6 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END,
        |  'h', CAST(doc_id % 20 AS STRING), '.Example.com/page/',
        |  CAST(doc_id % 100 AS STRING),
        |  CASE WHEN doc_id % 9 = 0 THEN '/' ELSE '' END,
        |  CASE WHEN doc_id % 3 = 0
        |       THEN concat('?utm_source=feed&utm_campaign=x&id=', CAST(doc_id % 100 AS STRING))
        |       WHEN doc_id % 7 = 0
        |       THEN concat('?id=', CAST(doc_id % 100 AS STRING))
        |       ELSE '' END,
        |  CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END)""".stripMargin)
    val canon = Tables.spread(
        Tables.documents(spark, dir).select($"doc_id", raw.as("url")))
      .withColumn("nofrag", expr("split_part(url, '#', 1)"))
      .withColumn("base", expr("split_part(nofrag, '?', 1)"))
      .withColumn("qs", expr(
        "CASE WHEN contains(nofrag, '?') THEN split_part(nofrag, '?', 2) ELSE '' END"))
      .withColumn("nos", expr(
        """CASE WHEN lower(base) LIKE 'https://%' THEN substring(base, 9)
          |     WHEN lower(base) LIKE 'http://%' THEN substring(base, 8)
          |     ELSE base END""".stripMargin))
      .withColumn("host0", expr("lower(split_part(nos, '/', 1))"))
      .withColumn("host", expr(
        "CASE WHEN host0 LIKE 'www.%' THEN substring(host0, 5) ELSE host0 END"))
      .withColumn("path0", expr("substring(nos, length(host0) + 1)"))
      .withColumn("path", expr(
        """CASE WHEN length(path0) > 1 AND path0 LIKE '%/'
          |     THEN substring(path0, 1, length(path0) - 1) ELSE path0 END""".stripMargin))
      .withColumn("fq", expr(
        "array_join(filter(split(qs, '&'), x -> NOT startswith(x, 'utm_')), '&')"))
      .withColumn("canonical_url", expr(
        "concat(host, path, CASE WHEN fq != '' THEN concat('?', fq) ELSE '' END)"))
      .select($"doc_id", $"host", $"canonical_url")
      // CACHE: the dup-group aggregation and the join-back probe both
      // read this ~15-builtin canonicalization chain; without the cache
      // each evaluation re-runs it over the whole corpus
      .cache()
    val groups = canon.groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_dups"), min($"doc_id").as("kept_doc"))
    canon.join(groups, "canonical_url")
      .select($"doc_id", $"host", $"canonical_url", $"n_dups",
        ($"doc_id" === $"kept_doc").cast("int").as("kept"))
      .orderBy($"doc_id")
  }

  val qUrlCanonicalSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 6 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END
      |    || 'h' || CAST(doc_id % 20 AS VARCHAR) || '.Example.com/page/'
      |    || CAST(doc_id % 100 AS VARCHAR)
      |    || CASE WHEN doc_id % 9 = 0 THEN '/' ELSE '' END
      |    || CASE WHEN doc_id % 3 = 0
      |            THEN '?utm_source=feed&utm_campaign=x&id=' || CAST(doc_id % 100 AS VARCHAR)
      |            WHEN doc_id % 7 = 0
      |            THEN '?id=' || CAST(doc_id % 100 AS VARCHAR)
      |            ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
      |  FROM documents),
      |s1 AS (SELECT doc_id, split_part(url, '#', 1) AS nofrag FROM raw),
      |s2 AS (SELECT doc_id, split_part(nofrag, '?', 1) AS base,
      |  CASE WHEN contains(nofrag, '?') THEN split_part(nofrag, '?', 2) ELSE '' END AS qs
      |  FROM s1),
      |s3 AS (SELECT doc_id, qs,
      |  CASE WHEN lower(base) LIKE 'https://%' THEN substring(base, 9)
      |       WHEN lower(base) LIKE 'http://%' THEN substring(base, 8)
      |       ELSE base END AS nos FROM s2),
      |s4 AS (SELECT doc_id, qs, nos, lower(split_part(nos, '/', 1)) AS host0 FROM s3),
      |s5 AS (SELECT doc_id, qs,
      |  CASE WHEN host0 LIKE 'www.%' THEN substring(host0, 5) ELSE host0 END AS host,
      |  substring(nos, length(host0) + 1) AS path0 FROM s4),
      |s6 AS (SELECT doc_id, host,
      |  CASE WHEN length(path0) > 1 AND path0 LIKE '%/'
      |       THEN substring(path0, 1, length(path0) - 1) ELSE path0 END AS path,
      |  array_to_string(list_filter(string_split(qs, '&'),
      |    x -> NOT starts_with(x, 'utm_')), '&') AS fq FROM s5),
      |canon AS (SELECT doc_id, host,
      |  host || path || CASE WHEN fq != '' THEN '?' || fq ELSE '' END AS canonical_url
      |  FROM s6),
      |g AS (SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_dups,
      |  min(doc_id) AS kept_doc FROM canon GROUP BY canonical_url)
      |SELECT c.doc_id, c.host, c.canonical_url, g.n_dups,
      |  CAST(CASE WHEN c.doc_id = g.kept_doc THEN 1 ELSE 0 END AS INT) AS kept
      |FROM canon c JOIN g ON g.canonical_url = c.canonical_url
      |ORDER BY c.doc_id""".stripMargin

  /** Host-space size for the link graph (matches q_url_canonical's 20
    * synthetic hosts). */
  val NumLinkHosts = 20

  /** Per-doc outlinks derived deterministically IN THE QUERY (the same
    * contract as q_url_canonical's urls): each doc's source host is
    * `h(doc_id % 20)`; its 3 outlink targets come from md5(text) nibble
    * pairs 1-2, 3-4, 5-6 (each (hi·16+lo) % 20). Both engines build
    * byte-identical edges, so the oracle checks the graph operators, not
    * a generator. Self-links are dropped (the standard link-graph
    * normalization). */
  private[queries] def docLinks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", md5($"text").as("hh"))
      .select(expr("'h' || CAST(doc_id % 20 AS STRING)").as("src"),
        explode(expr(
          """transform(sequence(1, 3), k ->
            |  'h' || CAST(((locate(substr(hh, 2*k - 1, 1), '0123456789abcdef') - 1) * 16
            |             + (locate(substr(hh, 2*k, 1), '0123456789abcdef') - 1)) % 20
            |       AS STRING))""".stripMargin)).as("dst"))
      .filter($"src" =!= $"dst")
  }

  /** Shared SQL CTE prefix deriving the same doc-level links in DuckDB. */
  private[queries] val linkCtes: String =
    """WITH raw AS (
      |  SELECT doc_id, md5(text) AS hh FROM documents WHERE text IS NOT NULL),
      |lnk0 AS (
      |  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
      |    'h' || CAST(((strpos('0123456789abcdef', substr(hh, 2*k - 1, 1)) - 1) * 16
      |               + (strpos('0123456789abcdef', substr(hh, 2*k, 1)) - 1)) % 20
      |         AS VARCHAR) AS dst
      |  FROM raw CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) ks),
      |lnk AS (SELECT src, dst FROM lnk0 WHERE src <> dst),
      |edges AS (SELECT src, dst, count(*) AS n_links FROM lnk GROUP BY src, dst)""".stripMargin

  /** HOST-LEVEL LINK GRAPH — the crawl-frontier/quality table every web
    * pipeline keeps (Common Crawl publishes exactly this as its host-level
    * webgraph): page outlinks rolled up to (src_host, dst_host) edge
    * multiplicities plus per-host out/in totals. Downstream consumers:
    * crawl prioritization, spam-host filtering, and the PageRank below.
    *
    * Scale shape: link extraction is a per-row map fused into the scan;
    * the edge rollup exchanges (src, dst, partial_count) — map-side
    * partials collapse repeated host pairs per partition, so the shuffle
    * is edge-space-sized (hosts², bounded by the host vocabulary), never
    * page-sized. Degree tables are aggregations OVER THE EDGE TABLE,
    * joined back on their own keys. At 10^12 pages the edge table is
    * ~10^9 host pairs — every downstream op is key-partitioned on it. */
  def qLinkGraph(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = docLinks(spark, dir)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n_links"))
    val out = edges.groupBy($"src").agg(sum($"n_links").as("src_out_total"))
    val inn = edges.groupBy($"dst").agg(sum($"n_links").as("dst_in_total"))
    edges.join(out, "src").join(inn, "dst")
      .select($"src", $"dst", $"n_links", $"src_out_total", $"dst_in_total")
      .orderBy($"src", $"dst")
  }

  val qLinkGraphSql: String =
    s"""$linkCtes,
       |outd AS (SELECT src, CAST(sum(n_links) AS BIGINT) AS src_out_total
       |  FROM edges GROUP BY src),
       |ind AS (SELECT dst, CAST(sum(n_links) AS BIGINT) AS dst_in_total
       |  FROM edges GROUP BY dst)
       |SELECT e.src, e.dst, CAST(e.n_links AS BIGINT) AS n_links,
       |  o.src_out_total, i.dst_in_total
       |FROM edges e JOIN outd o ON o.src = e.src JOIN ind i ON i.dst = e.dst
       |ORDER BY e.src, e.dst""".stripMargin

  /** PageRank probability scale: host scores are integers summing to ~PrS
    * (damping leak aside), so every score is an exact rational over PrS. */
  val PrScale = 1000000000L

  /** HOST PAGERANK, two power iterations, EXACT INTEGER arithmetic
    * (Brin-Page '98; host-level centrality is how Common Crawl ranks its
    * frontier). Starting from the uniform vector (PrS div N per host),
    * each iteration distributes pr(u)·w(u,v) div out(u) along weighted
    * edges and damps: pr'(v) = (15·PrS div 100) div N + 85·Σcontrib div
    * 100 — every division a floor over positive integers, so Spark and
    * DuckDB agree bit-for-bit with no float anywhere. Hosts with no
    * in-links keep the teleport base (LEFT join + coalesce); dangling
    * mass is dropped (the "remove dangling" PR variant — deterministic
    * and standard).
    *
    * Scale shape: the iteration is ONE key-partitioned join per round
    * (edges ⋈ pr on src, then a dst-keyed fold) — the same
    * join-per-round discipline as the CC engines; nothing is ever
    * collected. Production runs ~50 rounds to convergence; two fixed
    * rounds keep the oracle replicable while exercising the full
    * iteration machinery twice (pr2 depends on pr1's complete result).
    * At web scale the pr vector is host-cardinality-sized (~10^8 rows),
    * partitioned identically across rounds so AQE reuses the layout. */
  def qPagerankHosts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // CACHE the host-cardinality frames the iteration re-reads: edges
    // feeds the out-degree rollup, the host roster, and one join per
    // PageRank step; hosts feeds pr0 and every step's left join; pr1 is
    // consumed by both step 2 and the final three-way join (without the
    // cache the step-1 subtree evaluates twice). All host²-bounded.
    // Harnesses clearCache() after each query.
    val edges = docLinks(spark, dir)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n_links"))
      .cache()
    val out = edges.groupBy($"src").agg(sum($"n_links").as("out_total"))
    val hosts = edges.select($"src".as("host"))
      .union(edges.select($"dst".as("host"))).distinct()
      .cache()
    val nDf = hosts.agg(count(lit(1)).as("n_hosts"))
    val pr0 = hosts.crossJoin(broadcast(nDf))
      .select($"host", expr(s"CAST($PrScale AS BIGINT) div n_hosts").as("pr"))
    def step(pr: DataFrame): DataFrame = {
      val contrib = edges.join(out, "src")
        .join(pr.withColumnRenamed("host", "src"), "src")
        .select($"dst".as("host"),
          expr("pr * n_links div out_total").as("c"))
        .groupBy($"host").agg(sum($"c").as("csum"))
      hosts.join(contrib, Seq("host"), "left")
        .crossJoin(broadcast(nDf))
        .select($"host",
          (expr(s"(15 * CAST($PrScale AS BIGINT) div 100) div n_hosts") +
            expr("coalesce(csum, CAST(0 AS BIGINT)) * 85 div 100")).as("pr"))
    }
    val pr1 = step(pr0).cache()
    val pr2 = step(pr1)
    pr0.select($"host", $"pr".as("pr0"))
      .join(pr1.select($"host", $"pr".as("pr1")), "host")
      .join(pr2.select($"host", $"pr".as("pr2")), "host")
      .select($"host", $"pr0", $"pr1", $"pr2")
      .orderBy($"host")
  }

  val qPagerankHostsSql: String =
    s"""$linkCtes,
       |outd AS (SELECT src, sum(n_links) AS out_total FROM edges GROUP BY src),
       |hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
       |n AS (SELECT count(*) AS n_hosts FROM hosts),
       |pr0 AS (SELECT host, CAST($PrScale AS BIGINT) // n_hosts AS pr
       |  FROM hosts CROSS JOIN n),
       |c1 AS (
       |  SELECT e.dst AS host, sum(p.pr * e.n_links // o.out_total) AS csum
       |  FROM edges e JOIN outd o ON o.src = e.src JOIN pr0 p ON p.host = e.src
       |  GROUP BY e.dst),
       |pr1 AS (
       |  SELECT h.host,
       |    (15 * CAST($PrScale AS BIGINT) // 100) // n.n_hosts
       |      + coalesce(c.csum, 0) * 85 // 100 AS pr
       |  FROM hosts h LEFT JOIN c1 c ON c.host = h.host CROSS JOIN n),
       |c2 AS (
       |  SELECT e.dst AS host, sum(p.pr * e.n_links // o.out_total) AS csum
       |  FROM edges e JOIN outd o ON o.src = e.src JOIN pr1 p ON p.host = e.src
       |  GROUP BY e.dst),
       |pr2 AS (
       |  SELECT h.host,
       |    (15 * CAST($PrScale AS BIGINT) // 100) // n.n_hosts
       |      + coalesce(c.csum, 0) * 85 // 100 AS pr
       |  FROM hosts h LEFT JOIN c2 c ON c.host = h.host CROSS JOIN n)
       |SELECT p0.host, CAST(p0.pr AS BIGINT) AS pr0, CAST(p1.pr AS BIGINT) AS pr1,
       |  CAST(p2.pr AS BIGINT) AS pr2
       |FROM pr0 p0 JOIN pr1 p1 ON p1.host = p0.host JOIN pr2 p2 ON p2.host = p0.host
       |ORDER BY p0.host""".stripMargin

  // ----------------------------------------------- cross-source dup matrix

  /** A digest present in strictly more than this many sources is dropped
    * from pair scoring (web-wide boilerplate; bounds the pair fan-out). */
  val CrossSourceMaxFanout = 4L

  /** CROSS-SOURCE DUPLICATION MATRIX (the provenance question a corpus
    * merge must answer before weighting sources — how much of source A
    * is already in source B? C4-vs-CC-vs-news overlap tables in every
    * dataset paper): exact-dup digest groups spanning ≥2 sources are
    * folded into an UNORDERED source-pair matrix — per (source_a <
    * source_b): how many distinct contents the pair shares, how many
    * duplicated DOC copies that overlap accounts for, and each side's
    * distinct-content count with the directional share ‰ (what fraction
    * of A's distinct contents also live in B).
    *
    * Scale shape: (source, digest) distinct with map-side partials, the
    * pair join keyed by digest with the [[CrossSourceMaxFanout]] cap
    * bounding fan-out (accounting carried on every row), source totals a
    * source-cardinality broadcast. Text never shuffles — digests only.
    *
    * The corpus's planted duplicates never cross a source boundary, so
    * the merge is simulated the way it actually happens: a `syndicated`
    * feed re-serving every 9th page and a `mirror_feed` re-serving every
    * 15th — the overlap rows the matrix exists to expose. */
  def qDedupCrossSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir).filter($"text".isNotNull)
    val docs = base.select($"source", md5($"text").as("h"))
      .unionAll(base.filter($"doc_id" % 9 === 2)
        .select(lit("syndicated").as("source"), md5($"text").as("h")))
      .unionAll(base.filter($"doc_id" % 15 === 4)
        .select(lit("mirror_feed").as("source"), md5($"text").as("h")))
    val sd = docs.distinct()
    val copies = docs.groupBy($"source", $"h").agg(count(lit(1)).as("n_copies"))
    val fanout = sd.groupBy($"h").agg(count(lit(1)).as("n_sources"))
    val dropped = fanout.filter($"n_sources" > CrossSourceMaxFanout)
    val nDropped = dropped.agg(
      coalesce(count(lit(1)), lit(0L)).as("n_dropped_digests"))
    val kept = copies.join(fanout.filter($"n_sources" > 1)
        .join(dropped.select($"h"), Seq("h"), "left_anti").select($"h"),
      Seq("h"))
    val totals = sd.groupBy($"source").agg(count(lit(1)).as("n_distinct"))
    val pairs = kept.as("a")
      .join(kept.as("b"), $"a.h" === $"b.h" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("shared_digests"),
        sum($"a.n_copies" + $"b.n_copies").as("shared_doc_copies"))
    pairs
      .join(totals.select($"source".as("source_a"), $"n_distinct".as("n_a")),
        Seq("source_a"))
      .join(totals.select($"source".as("source_b"), $"n_distinct".as("n_b")),
        Seq("source_b"))
      .withColumn("a_in_b_permille",
        expr("shared_digests * 1000 DIV n_a"))
      .withColumn("b_in_a_permille",
        expr("shared_digests * 1000 DIV n_b"))
      .crossJoin(broadcast(nDropped))
      .select($"source_a", $"source_b", $"shared_digests",
        $"shared_doc_copies", $"n_a", $"n_b", $"a_in_b_permille",
        $"b_in_a_permille", $"n_dropped_digests")
      .orderBy($"source_a", $"source_b")
  }

  val qDedupCrossSourceSql: String =
    s"""WITH docs AS (
       |  SELECT source, md5(text) AS h FROM documents
       |  WHERE text IS NOT NULL
       |  UNION ALL
       |  SELECT 'syndicated', md5(text) FROM documents
       |  WHERE text IS NOT NULL AND doc_id % 9 = 2
       |  UNION ALL
       |  SELECT 'mirror_feed', md5(text) FROM documents
       |  WHERE text IS NOT NULL AND doc_id % 15 = 4),
       |sd AS (SELECT DISTINCT source, h FROM docs),
       |copies AS (
       |  SELECT source, h, CAST(count(*) AS BIGINT) AS n_copies
       |  FROM docs GROUP BY source, h),
       |fan AS (SELECT h, count(*) AS n_sources FROM sd GROUP BY h),
       |dropped AS (SELECT h FROM fan
       |            WHERE n_sources > $CrossSourceMaxFanout),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_dropped_digests
       |       FROM dropped),
       |kept AS (
       |  SELECT c.* FROM copies c
       |  JOIN fan f ON f.h = c.h AND f.n_sources > 1
       |  WHERE c.h NOT IN (SELECT h FROM dropped)),
       |totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
       |           FROM sd GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(count(*) AS BIGINT) AS shared_digests,
       |    CAST(sum(a.n_copies + b.n_copies) AS BIGINT)
       |      AS shared_doc_copies
       |  FROM kept a JOIN kept b ON a.h = b.h AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT p.source_a, p.source_b, p.shared_digests,
       |  p.shared_doc_copies, ta.n_distinct AS n_a, tb.n_distinct AS n_b,
       |  p.shared_digests * 1000 // ta.n_distinct AS a_in_b_permille,
       |  p.shared_digests * 1000 // tb.n_distinct AS b_in_a_permille,
       |  nd.n_dropped_digests
       |FROM pairs p
       |JOIN totals ta ON ta.source = p.source_a
       |JOIN totals tb ON tb.source = p.source_b
       |CROSS JOIN nd
       |ORDER BY p.source_a, p.source_b""".stripMargin

  // ------------------------------------------------- host-graph triangles

  /** TRIANGLE CENSUS OVER THE HOST GRAPH (link-farm fingerprinting: spam
    * rings interlink densely, so their local clustering coefficient sits
    * far above organic hosts' — the graph-shape channel reciprocity
    * counting can't see): the directed host graph undirected and
    * deduplicated, triangles enumerated once each under the a<b<c
    * ordering, then per host its undirected degree, incident-triangle
    * count, and exact clustering coefficient ‰
    * (2·tri·1000 div (deg·(deg−1))).
    *
    * Scale shape: the classic two-join node-ordered enumeration — each
    * wedge is generated once (b is the middle under byte order), closed
    * by one more edge join; every join is keyed on host ids only. On a
    * real webgraph the ordering-by-degree variant bounds wedge fan-out;
    * with 20 synthetic hosts the byte order stands in. */
  def qGraphTriangles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NOT the 20-host docLinks graph — that one is complete (every cc
    // reads 1000‰ and the census is inert). 64 hosts at 3 outlinks per
    // page gives ~30% density with real clustering spread, and a planted
    // 4-host spam ring (all 6 edges) pins the signal the census exists
    // to find.
    val organic = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", md5($"text").as("hh"))
      .select(expr("'h' || CAST(doc_id % 64 AS STRING)").as("src"),
        explode(expr(
          """transform(sequence(1, 3), k ->
            |  'h' || CAST(((locate(substr(hh, 2*k - 1, 1), '0123456789abcdef') - 1) * 16
            |             + (locate(substr(hh, 2*k, 1), '0123456789abcdef') - 1)) % 64
            |       AS STRING))""".stripMargin)).as("dst"))
      .filter($"src" =!= $"dst")
    val ring = spark.createDataFrame(Seq(
      ("s0", "s1"), ("s0", "s2"), ("s0", "s3"),
      ("s1", "s2"), ("s1", "s3"), ("s2", "s3"))).toDF("src", "dst")
    val und = organic.unionAll(ring)
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct()
    val wedges = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"),
        col("e2.b").as("wc"))
    val tri = wedges
      .join(und.as("e3"),
        col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .select($"wa".as("a"), $"wb".as("b"), $"wc".as("c"))
    val perHost = tri
      .select(explode(array($"a", $"b", $"c")).as("host"))
      .groupBy($"host").agg(count(lit(1)).as("n_triangles"))
    val deg = und.select($"a".as("host")).unionAll(und.select($"b".as("host")))
      .groupBy($"host").agg(count(lit(1)).as("degree"))
    deg.join(perHost, Seq("host"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .withColumn("cc_permille",
        expr("CASE WHEN degree >= 2 THEN n_triangles * 2000 DIV (degree * (degree - 1)) ELSE 0 END"))
      .select($"host", $"degree", $"n_triangles", $"cc_permille")
      .orderBy($"host")
  }

  val qGraphTrianglesSql: String =
    s"""WITH raw AS (
       |  SELECT doc_id, md5(text) AS hh FROM documents
       |  WHERE text IS NOT NULL),
       |lnk0 AS (
       |  SELECT 'h' || CAST(doc_id % 64 AS VARCHAR) AS src,
       |    'h' || CAST(((strpos('0123456789abcdef', substr(hh, 2*k - 1, 1)) - 1) * 16
       |               + (strpos('0123456789abcdef', substr(hh, 2*k, 1)) - 1)) % 64
       |         AS VARCHAR) AS dst
       |  FROM raw CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) ks),
       |lnk AS (
       |  SELECT src, dst FROM lnk0 WHERE src <> dst
       |  UNION ALL
       |  SELECT * FROM (VALUES ('s0','s1'), ('s0','s2'), ('s0','s3'),
       |    ('s1','s2'), ('s1','s3'), ('s2','s3')) AS r(src, dst)),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM lnk),
       |tri AS (
       |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
       |  FROM und e1
       |  JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       |ph AS (
       |  SELECT host, CAST(count(*) AS BIGINT) AS n_triangles FROM (
       |    SELECT a AS host FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri) u
       |  GROUP BY host),
       |deg AS (
       |  SELECT host, CAST(count(*) AS BIGINT) AS degree FROM (
       |    SELECT a AS host FROM und UNION ALL SELECT b FROM und) d
       |  GROUP BY host)
       |SELECT deg.host, deg.degree,
       |  COALESCE(ph.n_triangles, 0) AS n_triangles,
       |  CASE WHEN deg.degree >= 2
       |    THEN COALESCE(ph.n_triangles, 0) * 2000
       |           // (deg.degree * (deg.degree - 1))
       |    ELSE 0 END AS cc_permille
       |FROM deg LEFT JOIN ph ON ph.host = deg.host
       |ORDER BY deg.host""".stripMargin

  // -------------------------------------------------- NFC-normalized dedup

  /** UNICODE-NORMALIZED DEDUP (CCNet §3.1's pre-hash pass, done with the
    * repo's own codegen'd Catalyst expression: 'e'+U+0301 and U+00E9 are
    * the same text to every reader but different bytes to md5 — a
    * byte-level dedup silently keeps both): every 12th doc is re-served
    * twice, once with a PRECOMPOSED suffix (" café menu", U+00E9) and
    * once DECOMPOSED ("cafe" + U+0301) — byte-distinct, NFC-equal. Per
    * doc: whether NFC changed its bytes, its NFC-group size, the
    * canonical-min keep decision, and whether its group was unified ONLY
    * by NFC (>1 distinct raw digest — the pairs byte-dedup misses).
    *
    * Engine note: `nfc_normalize` is a native UnaryExpression with
    * doGenCode (functions/Expressions.scala) — ASCII rows take a
    * byte-scan fast path and never materialize a java.lang.String, so
    * the normalization rides inside whole-stage codegen like any
    * builtin; the DuckDB oracle's utf8proc NFC implements the same
    * Unicode tables, which is exactly the cross-engine contract the
    * digests test. Scale shape: digest projection fused into the scan,
    * one digest-keyed rollup, broadcast-size join back. */
  def qDedupNfc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", $"text")
    val pre = base.filter($"doc_id" % 12 === 0)
      .select(($"doc_id" + 3000000L).as("doc_id"),
        concat($"text", lit(" café menu")).as("text"))
    val dec = base.filter($"doc_id" % 12 === 0)
      .select(($"doc_id" + 4000000L).as("doc_id"),
        concat($"text", lit(" café menu")).as("text"))
    val corpus = base.unionAll(pre).unionAll(dec)
      .select($"doc_id", md5($"text").as("raw_digest"),
        md5(graft.functions.GraftFunctions.nfcNormalize(spark, $"text"))
          .as("nfc_digest"))
    val groups = corpus.groupBy($"nfc_digest")
      .agg(count(lit(1)).as("n_copies"),
        min($"doc_id").as("canon_id"),
        countDistinct($"raw_digest").as("n_raw"))
    corpus.join(groups, Seq("nfc_digest"))
      .select($"doc_id",
        ($"raw_digest" =!= $"nfc_digest").cast("int").cast("long")
          .as("changed"),
        $"n_copies",
        ($"doc_id" === $"canon_id").cast("int").cast("long").as("keep"),
        ($"n_raw" > 1).cast("int").cast("long").as("nfc_unified"))
      .orderBy($"doc_id")
  }

  val qDedupNfcSql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
      |corpus AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 3000000,
      |    text || ' caf' || chr(233) || ' menu' FROM base
      |  WHERE doc_id % 12 = 0
      |  UNION ALL
      |  SELECT doc_id + 4000000,
      |    text || ' cafe' || chr(769) || ' menu' FROM base
      |  WHERE doc_id % 12 = 0),
      |d AS (
      |  SELECT doc_id, md5(text) AS raw_digest,
      |    md5(nfc_normalize(text)) AS nfc_digest
      |  FROM corpus),
      |g AS (
      |  SELECT nfc_digest, CAST(count(*) AS BIGINT) AS n_copies,
      |    CAST(min(doc_id) AS BIGINT) AS canon_id,
      |    count(DISTINCT raw_digest) AS n_raw
      |  FROM d GROUP BY nfc_digest)
      |SELECT d.doc_id,
      |  CAST(CASE WHEN d.raw_digest <> d.nfc_digest THEN 1 ELSE 0 END
      |    AS BIGINT) AS changed,
      |  g.n_copies,
      |  CAST(CASE WHEN d.doc_id = g.canon_id THEN 1 ELSE 0 END AS BIGINT)
      |    AS keep,
      |  CAST(CASE WHEN g.n_raw > 1 THEN 1 ELSE 0 END AS BIGINT)
      |    AS nfc_unified
      |FROM d JOIN g ON g.nfc_digest = d.nfc_digest
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_canonical" -> qUrlCanonical,
    "q_dedup_cross_source" -> qDedupCrossSource,
    "q_dedup_nfc" -> qDedupNfc,
    "q_graph_triangles" -> qGraphTriangles,
    "q_link_graph" -> qLinkGraph,
    "q_pagerank_hosts" -> qPagerankHosts,
    "q_dedup_substrings" -> qDedupSubstrings,
    "q_dedup_spans" -> qDedupSpans,
    "q_dedup_spans_cut" -> qDedupSpansCut,
    "q_dedup_lines" -> qDedupLines,
    "q_dedup_normalized" -> qDedupNormalized,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_dedup_incremental_sharded" -> qDedupIncrementalSharded,
    "q_split_leakage" -> qSplitLeakage,
    "q_split_repair" -> qSplitRepair)

  val oracleSql: Map[String, String] = Map(
    "q_url_canonical" -> qUrlCanonicalSql,
    "q_dedup_cross_source" -> qDedupCrossSourceSql,
    "q_dedup_nfc" -> qDedupNfcSql,
    "q_graph_triangles" -> qGraphTrianglesSql,
    "q_link_graph" -> qLinkGraphSql,
    "q_pagerank_hosts" -> qPagerankHostsSql,
    "q_dedup_substrings" -> qDedupSubstringsSql,
    "q_dedup_spans" -> qDedupSpansSql,
    "q_dedup_spans_cut" -> qDedupSpansCutSql,
    "q_dedup_lines" -> qDedupLinesSql,
    "q_dedup_normalized" -> qDedupNormalizedSql,
    "q_dedup_incremental" -> qDedupIncrementalSql,
    // the sharded path's contract IS bit-identity with the flat query —
    // same oracle, independently satisfied
    "q_dedup_incremental_sharded" -> qDedupIncrementalSql,
    "q_split_leakage" -> qSplitLeakageSql,
    "q_split_repair" -> qSplitRepairSql)
}
