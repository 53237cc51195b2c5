package graft.queries

import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retrieval & recrawl operators — the corpus-side surfaces a web-text
  * stack needs AFTER filtering: finding near-duplicates by fingerprint
  * distance, scoring documents against term queries, collapsing recrawl
  * snapshots, and capping per-host volume. Like every family here, each
  * operator is a deterministic exact-integer derivation both engines
  * replicate bit-for-bit, so the DuckDB oracle checks the operator.
  *
  *  - q_simhash_near — Hamming-neighbor join over 32-bit SimHash
  *    fingerprints (Manku, Jain & Das Sarma, WWW '07: the Google
  *    crawl-dedup design). 4 blocks × 8 bits: any pair within Hamming
  *    distance 3 shares ≥1 intact block (pigeonhole), so the candidate
  *    join is block-keyed — never all-pairs — and the exact popcount
  *    verify runs on candidates only.
  *  - q_tfidf_terms — per-document top TF-IDF term with a log-free
  *    exact-rational idf surrogate (N·10^6 div df), the relevance-scoring
  *    shape of Salton & Buckley '88.
  *  - q_bm25_search — BM25 (Robertson & Walker '94) top-20 retrieval for
  *    a fixed 3-term query, the k1/b saturation algebra cleared of floats
  *    by multiplying through by 20·T (T = corpus token count).
  *  - q_recrawl_latest — CDX-style recrawl collapse: per url keep the
  *    latest snapshot, count snapshots and distinct content versions (the
  *    crawl-side freshness/churn table every recrawl scheduler keeps).
  *  - q_host_cap — per-host document cap by quality rank (the
  *    RefinedWeb-style volume-capping channel that stops any single host
  *    dominating the corpus).
  */
object SearchQueries {

  // --------------------------------------------------------- simhash-near

  /** Hamming radius for near-duplicate fingerprints. */
  val HamMax = 3
  /** Blocks: HamMax+1 of them, so ≤ HamMax flips leave one block intact. */
  val Bands = 4
  val BandBits = 8

  private val simhash32Udf = udf((t: String) => TextHash.simhash32(t))

  /** SIMHASH HAMMING-NEIGHBOR JOIN (Manku et al. WWW '07 §3): pairs of
    * docs whose 32-bit SimHash fingerprints differ in ≤ 3 bits, found by
    * the block-permutation trick — the fingerprint splits into 4 8-bit
    * blocks; a pair within Hamming distance 3 must agree on ≥ 1 whole
    * block, so candidates come from a (block_idx, block_value)-keyed
    * self-join and only candidates pay the exact popcount check. Runs on
    * the planted dedup corpus so exact duplicates verify at distance 0.
    *
    * Scale shape: the only shuffled payload is (doc_id, fp) pairs keyed
    * by (band, 8-bit key) — ids and a Long, never text; the verify is a
    * codegen'd xor+popcount on the joined rows. At 10^12 docs the same
    * plan runs with a 64-bit fingerprint and 16-bit blocks (Manku's
    * production numbers) so buckets stay thousands-sized; band keys are
    * uniform by construction (SimHash bits are balanced), and a hot
    * bucket would hit the same per-bucket cap discipline as
    * q_ann_top_pairs. */
  def qSimhashNear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fps = TextQueries.dedupCorpus(spark, dir)
      .select($"doc_id", simhash32Udf($"text").as("fp"))
    val banded = fps.select($"doc_id", $"fp",
      posexplode(expr(s"transform(sequence(0, ${Bands - 1}), b -> " +
        s"shiftright(fp, ${BandBits} * b) & ${(1 << BandBits) - 1})"))
        .as(Seq("band", "bkey")))
    val a = banded.select($"band", $"bkey", $"doc_id".as("doc_a"), $"fp".as("fa"))
    val b = banded.select($"band", $"bkey", $"doc_id".as("doc_b"), $"fp".as("fb"))
    a.join(b, Seq("band", "bkey"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        expr("CAST(bit_count(fa ^ fb) AS BIGINT)").as("hamming"))
      .filter($"hamming" <= HamMax)
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** 32-bit SimHash assembly in SQL over a CTE named `corpus`. */
  private def simhash32SqlCtes: String = {
    val counts = (0 until 32)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS c$b")
      .mkString(",\n    ")
    val assemble = (0 until 32)
      .map(b => s"(CASE WHEN c$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus),
       |wh AS (SELECT doc_id, ${TextQueries.sqlWord8Hash("w")} AS h FROM words WHERE w != ''),
       |bits AS (SELECT doc_id,
       |    $counts
       |  FROM wh GROUP BY doc_id),
       |fps AS (SELECT doc_id, CAST($assemble AS BIGINT) AS fp FROM bits)""".stripMargin
  }

  val qSimhashNearSql: String =
    s"""WITH ${TextQueries.dedupCorpusSql},
       |${simhash32SqlCtes},
       |banded AS (
       |  SELECT doc_id, fp, b.b AS band, (fp >> ($BandBits * b.b)) & ${(1 << BandBits) - 1} AS bkey
       |  FROM fps, (SELECT unnest(range(0, $Bands)) AS b) b)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
       |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.fp, b.fp)) <= $HamMax
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------- tf-idf

  /** Scale for the rational idf surrogate. */
  val IdfScale = 1000000L

  /** PER-DOC TOP TF-IDF TERM: the classic relevance weight tf·idf with a
    * log-free exact-rational idf surrogate `(N·10^6) div df` (monotone in
    * 1/df exactly where log(N/df) is, so the per-doc argmax is the same
    * rule a float tf-idf would pick modulo ties — and ties break on term
    * bytes, pinned). Every score is an exact Long the oracle replicates.
    *
    * Scale shape: one (doc_id, word)-keyed exchange builds the tf table
    * with map-side partials; df is a vocab-sized rollup OF that table
    * (never a second pass over positions); the df join-back is
    * vocab-sized (AQE broadcasts it); the per-doc argmax is a
    * doc_id-partitioned window — no global sort, no all-pairs. */
  def qTfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val words = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
    val tf = words.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // df as a term-partitioned window COUNT over the tf table — one
    // exchange keyed by term, and the words subtree evaluates ONCE
    // (a groupBy+join-back would re-run the corpus explode for the df
    // branch: two full passes at 10^12 docs for a vocab-sized fact)
    val dfW = Window.partitionBy($"term")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.withColumn("df", count(lit(1)).over(dfW))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", expr(s"tf * ((n_docs * $IdfScale) DIV df)"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"score".desc, $"term".asc)
    scored.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"doc_id", $"term", $"tf", $"df", $"score")
      .orderBy($"doc_id")
  }

  val qTfidfTermsSql: String =
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM words WHERE term != '' GROUP BY doc_id, term),
       |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
       |    tf.tf * ((n.n_docs * $IdfScale) // dft.df) AS score
       |  FROM tf JOIN dft ON tf.term = dft.term, n)
       |SELECT doc_id, term, tf, df, score FROM scored
       |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) = 1
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- bm25

  /** The fixed retrieval query (literal terms, as a search probe is). */
  val Bm25Terms: Seq[String] = Seq("vector", "scan", "window")
  /** k1=1.2, b=0.75 cleared of floats: with T = corpus tokens and N =
    * docs, tf + k1·(1−b+b·dl·N/T) scaled by 20·T is
    * 20·tf·T + 6·T + 18·dl·N — all Longs. */
  val Bm25TfScale = 1000L
  val Bm25IdfScale = 10000L

  /** BM25 TOP-20 RETRIEVAL (Robertson & Walker '94) for the fixed 3-term
    * query, exact-integer: per term
    * `contrib = idf · ((44·tf·T·1000) div (20·tf·T + 6·T + 18·dl·N))`
    * with the log-free rational idf `((N−df)·10^4) div (df+1)` (monotone
    * where the BM25 idf is). Per-doc score sums contributions of present
    * terms; top-20 by (score desc, doc_id) is a TakeOrderedAndProject.
    *
    * Scale shape: the query-term filter lands BEFORE the tf aggregation
    * (the exchange carries only matching (doc_id, term) partials — at web
    * scale, an inverted-index posting read); dl is the one corpus-wide
    * doc-keyed rollup any length-normalized scorer needs; N/T/df are
    * tiny broadcast rollups; the final top-k never global-sorts. */
  def qBm25Search(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // dl is a pure per-row map fused into the scan (documents are
    // single-spaced); t_tokens/n_docs roll up the dl TABLE, so the corpus
    // is read once for the stats side. The query-term tf pass reads it a
    // second time with the isin filter applied before the explode's
    // aggregation — at web scale, that pass is an inverted-index read.
    val dl = docs.select($"doc_id",
      size(split($"text", " ")).cast("long").as("dl"))
    val stats = dl.agg(sum($"dl").as("t_tokens"), count(lit(1)).as("n_docs"))
    val words = docs.select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
    val tfq = words.filter($"term".isin(Bm25Terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // df as a term-partitioned window count over tfq — the posting table
    // is evaluated once (a groupBy+join-back would re-run the filtered
    // corpus pass for a |query|-row fact)
    val contrib = tfq
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"term")))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", expr(s"((n_docs - df) * $Bm25IdfScale) DIV (df + 1)"))
      .withColumn("tfsat", expr(
        s"(44 * tf * t_tokens * $Bm25TfScale) DIV " +
          "(20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs)"))
      .withColumn("contrib", $"idf" * $"tfsat")
    contrib.groupBy($"doc_id")
      .agg(max($"dl").as("dl"), count(lit(1)).as("n_terms_hit"),
        sum($"contrib").as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(20)
  }

  val qBm25SearchSql: String = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |w2 AS (SELECT doc_id, term FROM words WHERE term != ''),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM w2 GROUP BY doc_id),
       |stats AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM w2) AS t_tokens,
       |                 (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs),
       |tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM w2 WHERE term IN ($termList) GROUP BY doc_id, term),
       |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY term),
       |contrib AS (
       |  SELECT tfq.doc_id, dl.dl,
       |    (((s.n_docs - dfq.df) * $Bm25IdfScale) // (dfq.df + 1)) *
       |    ((44 * tfq.tf * s.t_tokens * $Bm25TfScale) //
       |     (20 * tfq.tf * s.t_tokens + 6 * s.t_tokens + 18 * dl.dl * s.n_docs))
       |    AS contrib
       |  FROM tfq JOIN dfq ON tfq.term = dfq.term
       |    JOIN dl ON tfq.doc_id = dl.doc_id, stats s)
       |SELECT doc_id, max(dl) AS dl, CAST(count(*) AS BIGINT) AS n_terms_hit,
       |  CAST(sum(contrib) AS BIGINT) AS score
       |FROM contrib GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------- recrawl latest

  /** Synthetic recrawl epoch base (any fixed Long; snapshots at +0/+1/+2
    * days). */
  val RecrawlT0 = 1700000000L

  /** CDX-STYLE RECRAWL COLLAPSE: a crawl recrawls urls over time; the
    * corpus keeps ONE latest snapshot per url plus the churn accounting a
    * recrawl scheduler feeds on (how many snapshots, how many distinct
    * content versions, did the page change). The snapshot relation is
    * derived in-query (every doc has a t0 crawl; even docs an UNCHANGED
    * t1 recrawl — same bytes, same digest; %3 docs a CHANGED t2 recrawl)
    * so both engines collapse identical inputs and the hash compare
    * checks the collapse rule, not a generator.
    *
    * Scale shape: one url-keyed exchange with map-side partials (count /
    * distinct-digest / max_by fold); digests are md5 hex — text never
    * shuffles; at 10^12 snapshots this is exactly the warc_bucket-
    * partitioned CDX merge, and the url key is the same exchange the
    * crawl's url-keyed storage already pays. */
  /** The derived snapshot relation shared by q_recrawl_latest and
    * q_recrawl_schedule: every doc a t0 crawl; even docs an UNCHANGED t1
    * recrawl; %3 docs a CHANGED t2 recrawl; %5 docs an UNCHANGED t3
    * recrawl (so %30 docs show 1 change in 3 recrawls — the sub-500‰
    * band the scheduler's warm tier needs). */
  private def recrawlSnaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"text")
    d.select(
        concat(lit("page"), $"doc_id").as("url"),
        lit(RecrawlT0).as("warc_ts"), md5($"text").as("digest"))
      .unionAll(d.filter($"doc_id" % 2 === 0).select(
        concat(lit("page"), $"doc_id").as("url"),
        lit(RecrawlT0 + 86400L).as("warc_ts"), md5($"text").as("digest")))
      .unionAll(d.filter($"doc_id" % 3 === 0).select(
        concat(lit("page"), $"doc_id").as("url"),
        lit(RecrawlT0 + 172800L).as("warc_ts"),
        md5(concat($"text", lit(" v2"))).as("digest")))
      .unionAll(d.filter($"doc_id" % 5 === 0).select(
        concat(lit("page"), $"doc_id").as("url"),
        lit(RecrawlT0 + 259200L).as("warc_ts"), md5($"text").as("digest")))
  }

  private val recrawlSnapsSql: String =
    s"""snaps AS (
       |  SELECT 'page' || CAST(doc_id AS VARCHAR) AS url,
       |         CAST($RecrawlT0 AS BIGINT) AS warc_ts, md5(text) AS digest
       |  FROM documents
       |  UNION ALL
       |  SELECT 'page' || CAST(doc_id AS VARCHAR),
       |         CAST(${RecrawlT0 + 86400L} AS BIGINT), md5(text)
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT 'page' || CAST(doc_id AS VARCHAR),
       |         CAST(${RecrawlT0 + 172800L} AS BIGINT), md5(text || ' v2')
       |  FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT 'page' || CAST(doc_id AS VARCHAR),
       |         CAST(${RecrawlT0 + 259200L} AS BIGINT), md5(text)
       |  FROM documents WHERE doc_id % 5 = 0)""".stripMargin

  def qRecrawlLatest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    recrawlSnaps(spark, dir).groupBy($"url")
      .agg(count(lit(1)).as("n_snapshots"),
        countDistinct($"digest").as("n_versions"),
        max($"warc_ts").as("latest_ts"),
        expr("max_by(digest, warc_ts)").as("latest_digest"))
      .withColumn("changed", ($"n_versions" > 1).cast("int"))
      .orderBy($"url")
  }

  val qRecrawlLatestSql: String =
    s"""WITH $recrawlSnapsSql
       |SELECT url, CAST(count(*) AS BIGINT) AS n_snapshots,
       |  CAST(count(DISTINCT digest) AS BIGINT) AS n_versions,
       |  max(warc_ts) AS latest_ts,
       |  max_by(digest, warc_ts) AS latest_digest,
       |  CAST(CASE WHEN count(DISTINCT digest) > 1 THEN 1 ELSE 0 END AS INT) AS changed
       |FROM snaps GROUP BY url
       |ORDER BY url""".stripMargin

  // ---------------------------------------------------- recrawl scheduling

  /** Recrawl intervals in seconds per change tier. */
  val RecrawlHotS = 86400L
  val RecrawlWarmS = 7L * 86400L
  val RecrawlColdS = 30L * 86400L

  /** RECRAWL SCHEDULING (Cho & Garcia-Molina '03 change-frequency
    * estimation, integer-exact): per url the observed change ratio —
    * (versions-1) changes out of (snapshots-1) recrawl opportunities, in
    * permille — buckets the url into a fetch tier: hot (≥50% of recrawls
    * changed → daily), warm (any change → weekly), cold (recrawled, never
    * changed → monthly), unseen (never recrawled → weekly default). The
    * schedule is the frontier's priority input: next_fetch_ts = latest
    * snapshot + the tier interval. Same derived snapshot relation as
    * q_recrawl_latest, so the oracle checks the scheduling rule.
    *
    * Scale shape: identical to q_recrawl_latest — ONE url-keyed exchange
    * with map-side partials; the tier CASE and interval arithmetic run on
    * the collapsed per-url row, never per snapshot. */
  def qRecrawlSchedule(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    recrawlSnaps(spark, dir).groupBy($"url")
      .agg(count(lit(1)).as("n_snapshots"),
        countDistinct($"digest").as("n_versions"),
        max($"warc_ts").as("latest_ts"))
      .withColumn("change_permille", expr(
        "CASE WHEN n_snapshots > 1 THEN (n_versions - 1) * 1000 DIV (n_snapshots - 1) ELSE 0 END"))
      .withColumn("tier", expr(
        s"""CASE WHEN n_snapshots = 1 THEN 'unseen'
           |     WHEN change_permille >= 500 THEN 'hot'
           |     WHEN n_versions > 1 THEN 'warm'
           |     ELSE 'cold' END""".stripMargin))
      .withColumn("next_fetch_ts", expr(
        s"""latest_ts + CASE tier WHEN 'hot' THEN $RecrawlHotS
           |  WHEN 'warm' THEN $RecrawlWarmS WHEN 'unseen' THEN $RecrawlWarmS
           |  ELSE $RecrawlColdS END""".stripMargin))
      .orderBy($"url")
  }

  val qRecrawlScheduleSql: String =
    s"""WITH $recrawlSnapsSql,
       |collapsed AS (
       |  SELECT url, CAST(count(*) AS BIGINT) AS n_snapshots,
       |    CAST(count(DISTINCT digest) AS BIGINT) AS n_versions,
       |    max(warc_ts) AS latest_ts
       |  FROM snaps GROUP BY url),
       |scored AS (
       |  SELECT *, CASE WHEN n_snapshots > 1
       |      THEN (n_versions - 1) * 1000 // (n_snapshots - 1) ELSE 0 END
       |    AS change_permille
       |  FROM collapsed),
       |tiered AS (
       |  SELECT *, CASE WHEN n_snapshots = 1 THEN 'unseen'
       |    WHEN change_permille >= 500 THEN 'hot'
       |    WHEN n_versions > 1 THEN 'warm'
       |    ELSE 'cold' END AS tier
       |  FROM scored)
       |SELECT url, n_snapshots, n_versions, latest_ts, change_permille, tier,
       |  latest_ts + CASE tier WHEN 'hot' THEN $RecrawlHotS
       |    WHEN 'warm' THEN $RecrawlWarmS WHEN 'unseen' THEN $RecrawlWarmS
       |    ELSE $RecrawlColdS END AS next_fetch_ts
       |FROM tiered ORDER BY url""".stripMargin

  // --------------------------------------------------------------- host cap

  /** Per-host document cap (docs kept per host). */
  val HostCapK = 15
  /** Host space (matches q_url_canonical / q_link_graph's 20 hosts). */
  val HostCapHosts = 20

  /** PER-HOST VOLUME CAP: keep at most K docs per host, best-first by a
    * quality metric (doc length here; the pipeline's KN ppl in
    * production) with doc_id tie-breaks — the RefinedWeb/C4-style channel
    * that stops boilerplate-heavy hosts dominating the corpus. Each row
    * carries its host rank so the decision is recomputable from the row.
    *
    * Scale shape: ONE host-partitioned window (row_number over a
    * host-keyed exchange) — no global sort; hosts are the natural crawl
    * partition key, and a pathological mega-host would hit the same
    * salting discipline as q_source_counts_salted (rank within salt, then
    * a tiny per-host merge of salt-level prefixes). */
  def qHostCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id",
        concat(lit("h"), ($"doc_id" % HostCapHosts)).as("host"),
        length($"text").as("doc_len"))
    val w = Window.partitionBy($"host").orderBy($"doc_len".desc, $"doc_id".asc)
    docs.withColumn("host_rank", row_number().over(w).cast("long"))
      .withColumn("kept", ($"host_rank" <= HostCapK).cast("int"))
      .orderBy($"doc_id")
  }

  val qHostCapSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, 'h' || CAST(doc_id % $HostCapHosts AS VARCHAR) AS host,
       |    CAST(length(text) AS INT) AS doc_len
       |  FROM documents)
       |SELECT doc_id, host, doc_len,
       |  CAST(row_number() OVER (PARTITION BY host ORDER BY doc_len DESC, doc_id ASC) AS BIGINT)
       |    AS host_rank,
       |  CAST(CASE WHEN row_number() OVER (PARTITION BY host ORDER BY doc_len DESC, doc_id ASC)
       |    <= $HostCapK THEN 1 ELSE 0 END AS INT) AS kept
       |FROM docs ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_simhash_near" -> qSimhashNear,
    "q_tfidf_terms" -> qTfidfTerms,
    "q_bm25_search" -> qBm25Search,
    "q_recrawl_latest" -> qRecrawlLatest,
    "q_recrawl_schedule" -> qRecrawlSchedule,
    "q_host_cap" -> qHostCap,
  )

  val oracleSql: Map[String, String] = Map(
    "q_simhash_near" -> qSimhashNearSql,
    "q_tfidf_terms" -> qTfidfTermsSql,
    "q_bm25_search" -> qBm25SearchSql,
    "q_recrawl_latest" -> qRecrawlLatestSql,
    "q_recrawl_schedule" -> qRecrawlScheduleSql,
    "q_host_cap" -> qHostCapSql,
  )
}
