package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-side corpus gating and sketching: the operators that run BEFORE
  * (frontier scheduling, URL blocklists) and AROUND (fingerprint sketching,
  * learned quality scoring) the quality pipeline in a production web-text
  * stack. Like every query family here, each operator is a deterministic
  * in-query derivation both engines replicate bit-for-bit, so the DuckDB
  * oracle checks the OPERATOR, not a data generator.
  *
  *  - q_crawl_frontier — bounded-depth BFS over the host link graph (the
  *    Mercator/IRLbot crawl-scheduling shape);
  *  - q_url_blocklist — UT1-style suffix blocklist gating (RefinedWeb §3.1
  *    runs exactly this as its first filter);
  *  - q_winnow — winnowing document fingerprints (Schleimer, Wilkerson &
  *    Aiken, SIGMOD '03 — the MOSS sketch): the guaranteed-detection local
  *    sketch that cuts ExactSubstr's per-position volume by ~2/(w+1);
  *  - q_quality_classifier — hashed bag-of-words linear scorer (the
  *    fastText/DCLM quality-classifier shape) with a closed-form weight
  *    table so the score is exactly replicable in SQL.
  */
object CrawlQueries {

  // ------------------------------------------------------------- frontier

  /** Host-space size for the crawl frontier. 256 (the full md5 nibble-pair
    * range) instead of q_link_graph's 20: BFS over a 20-host graph
    * saturates at depth 1, while 256 hosts at ~6 outlinks/host leaves a
    * genuine depth-2 ring to discover. */
  val FrontierHosts = 256

  /** Crawl seed hosts (the a-priori frontier roots). A literal list, as
    * real crawl seeds are; a seed set too large to inline would arrive as
    * a broadcast semi-join instead of the pushed-down isin below. */
  val FrontierSeeds: Seq[String] = Seq("h0", "h1")

  /** Host-level weighted edges over the 256-host space — the same
    * deterministic outlink contract as CorpusQueries.docLinks (md5(text)
    * nibble pairs), widened from %20 to %256. */
  private def frontierEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", md5($"text").as("hh"))
      .select(expr(s"'h' || CAST(doc_id % $FrontierHosts AS STRING)").as("src"),
        explode(expr(
          s"""transform(sequence(1, 3), k ->
             |  'h' || CAST(((locate(substr(hh, 2*k - 1, 1), '0123456789abcdef') - 1) * 16
             |             + (locate(substr(hh, 2*k, 1), '0123456789abcdef') - 1)) % $FrontierHosts
             |       AS STRING))""".stripMargin)).as("dst"))
      .filter($"src" =!= $"dst")
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n_links"))
  }

  /** CRAWL FRONTIER — two BFS rings from the seed hosts over the weighted
    * host graph (Mercator's frontier expansion, Heydon & Najork '99; what
    * a crawl scheduler materializes each cycle to decide which new hosts
    * to fetch). Each discovered host reports its depth, how many
    * distinct previous-ring parents link to it, and the total link weight
    * arriving from that ring — the priority signals frontier ordering
    * consumes.
    *
    * Scale shape: one key-partitioned join per ring (edges ⋈ frontier on
    * src — the CC-loop discipline), a dst-keyed rollup, and a LEFT ANTI
    * against the visited set; the frontier/visited sides are
    * host-cardinality-sized (≤10^8 rows at web scale), never page-sized,
    * and the edge table is reused across rings so AQE keeps its layout.
    * The seed ring is a pushed-down `isin` because the seed list is a
    * literal — depth-2 shows the data-dependent join the general ring
    * uses. */
  def qCrawlFrontier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = frontierEdges(spark, dir)
    val ring1 = edges.filter($"src".isin(FrontierSeeds: _*))
      .filter(!$"dst".isin(FrontierSeeds: _*))
      .groupBy($"dst")
      .agg(count(lit(1)).as("parents"), sum($"n_links").as("via_links"))
      .select($"dst".as("host"), $"parents", $"via_links")
    val r1src = ring1.select($"host".as("src"))
    val r1visited = ring1.select($"host".as("seen"))
    val ring2 = edges.join(r1src, "src")
      .filter(!$"dst".isin(FrontierSeeds: _*))
      .join(r1visited, $"dst" === $"seen", "left_anti")
      .groupBy($"dst")
      .agg(count(lit(1)).as("parents"), sum($"n_links").as("via_links"))
      .select($"dst".as("host"), $"parents", $"via_links")
    val seeds = FrontierSeeds.toDF("host")
      .select($"host", lit(0L).as("parents"), lit(0L).as("via_links"))
    seeds.select($"host", lit(0).as("depth"), $"parents", $"via_links")
      .unionAll(ring1.select($"host", lit(1).as("depth"), $"parents", $"via_links"))
      .unionAll(ring2.select($"host", lit(2).as("depth"), $"parents", $"via_links"))
      .orderBy($"depth", $"host")
  }

  val qCrawlFrontierSql: String =
    s"""WITH raw AS (SELECT doc_id, md5(text) AS hh FROM documents WHERE text IS NOT NULL),
       |lnk0 AS (
       |  SELECT 'h' || CAST(doc_id % $FrontierHosts AS VARCHAR) AS src,
       |    'h' || CAST(((strpos('0123456789abcdef', substr(hh, 2*k - 1, 1)) - 1) * 16
       |               + (strpos('0123456789abcdef', substr(hh, 2*k, 1)) - 1)) % $FrontierHosts
       |         AS VARCHAR) AS dst
       |  FROM raw CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) ks),
       |lnk AS (SELECT src, dst FROM lnk0 WHERE src <> dst),
       |edges AS (SELECT src, dst, count(*) AS n_links FROM lnk GROUP BY src, dst),
       |d0 AS (SELECT unnest(['h0', 'h1']) AS host),
       |f1 AS (
       |  SELECT e.dst AS host, count(*) AS parents, sum(e.n_links) AS via_links
       |  FROM edges e JOIN d0 ON d0.host = e.src
       |  WHERE e.dst NOT IN (SELECT host FROM d0)
       |  GROUP BY e.dst),
       |f2 AS (
       |  SELECT e.dst AS host, count(*) AS parents, sum(e.n_links) AS via_links
       |  FROM edges e JOIN f1 ON f1.host = e.src
       |  WHERE e.dst NOT IN (SELECT host FROM d0)
       |    AND e.dst NOT IN (SELECT host FROM f1)
       |  GROUP BY e.dst)
       |SELECT host, CAST(0 AS INT) AS depth, CAST(0 AS BIGINT) AS parents,
       |  CAST(0 AS BIGINT) AS via_links FROM d0
       |UNION ALL SELECT host, 1, CAST(parents AS BIGINT),
       |  CAST(via_links AS BIGINT) FROM f1
       |UNION ALL SELECT host, 2, CAST(parents AS BIGINT),
       |  CAST(via_links AS BIGINT) FROM f2
       |ORDER BY depth, host""".stripMargin

  // ------------------------------------------------------------ blocklist

  /** Blocklist rules, first match wins. Each entry blocks the exact host
    * AND every subdomain (`host = r OR host ends with '.' || r`) — the
    * UT1/RefinedWeb registrable-domain semantics. `h3.tracker.xyz` after
    * `tracker.xyz` is deliberately shadowed: first-match must report the
    * suffix rule, pinning evaluation order. */
  val BlockRules: Seq[String] =
    Seq("tracker.xyz", "h3.tracker.xyz", "h5.test.org", "h8.example.com")

  /** URL BLOCKLIST GATE — the first filter of a crawl pipeline
    * (RefinedWeb §3.1 drops 4.6% of its corpus on the UT1 blocklist
    * before any content look): deterministic hosts spread over four
    * registrable domains, gated by [[BlockRules]] with subdomain-suffix
    * semantics and first-match rule attribution.
    *
    * Scale shape: the rule list rides the projection as a literal array
    * (a real UT1 list — a few MB — would be a broadcast variable feeding
    * the same `filter(rules, ...)` expression); the whole gate is a
    * per-row map fused into the scan, zero exchanges before the output
    * sort. Suffix matching against a MILLION-entry list would flip to a
    * reversed-host prefix join against a sorted rule table — noted, not
    * needed at list sizes the public blocklists ship. */
  def qUrlBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rulesArr = BlockRules.map(r => s"'$r'").mkString(", ")
    Tables.documents(spark, dir)
      .select($"doc_id",
        expr("""'h' || CAST(doc_id % 20 AS STRING) || '.' ||
               |element_at(array('example.com', 'test.org', 'sample.net', 'tracker.xyz'),
               |           CAST(doc_id % 4 AS INT) + 1)""".stripMargin).as("host"))
      .select($"doc_id", $"host",
        expr(s"filter(array($rulesArr), r -> host = r OR endswith(host, '.' || r))").as("ms"))
      .select($"doc_id", $"host",
        (size($"ms") > 0).cast("int").as("blocked"),
        expr("coalesce(try_element_at(ms, 1), '')").as("rule"))
      .orderBy($"doc_id")
  }

  val qUrlBlocklistSql: String = {
    val rulesArr = BlockRules.map(r => s"'$r'").mkString(", ")
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    'h' || CAST(doc_id % 20 AS VARCHAR) || '.' ||
       |    list_extract(['example.com', 'test.org', 'sample.net', 'tracker.xyz'],
       |                 CAST(doc_id % 4 AS INT) + 1) AS host
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, host,
       |    list_filter([$rulesArr],
       |      r -> host = r OR ends_with(host, '.' || r)) AS ms
       |  FROM raw)
       |SELECT doc_id, host,
       |  CAST(CASE WHEN len(ms) > 0 THEN 1 ELSE 0 END AS INT) AS blocked,
       |  coalesce(list_extract(ms, 1), '') AS rule
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- winnow

  /** Words per k-gram (the winnowing noise threshold: matches shorter
    * than this are never reported). */
  val WinnowK = 4

  /** Window width in grams. Winnowing guarantees any shared run of
    * ≥ K + W - 1 = 8 words yields a shared fingerprint — the same
    * 8-word detection floor as q_dedup_substrings, at ~2/(W+1) ≈ 1/3 of
    * its shuffled volume. */
  val WinnowW = 5

  /** WINNOWING FINGERPRINTS (Schleimer, Wilkerson & Aiken '03 — the MOSS
    * local fingerprinting sketch): hash every K-word gram, slide a W-gram
    * window, keep each window's MINIMUM hash. The guarantee: two docs
    * sharing any K+W-1-word passage share a fingerprint (no false
    * negatives above the floor), while only ~2/(W+1) of positions are
    * kept — the principled volume knob ExactSubstr lacks. Per doc: gram
    * count, sketch size, fingerprints shared with ≥1 other doc, shared
    * permille, and a ≥500‰ flag.
    *
    * Scale shape: gram hashing, window minima, and the per-doc distinct
    * all happen INSIDE one projection (array ops over the scan — text
    * never leaves the row); only (doc_id, fp) pairs enter the Exchange,
    * at ~1/3 the row volume of the substring query on the same floor.
    * The duplicated-fp set is the small side (most fingerprints are
    * unique at corpus scale) so AQE broadcasts the join-back. Docs
    * shorter than K words have no grams and are excluded, as in MOSS;
    * docs with fewer than W grams contribute their single global
    * minimum (the standard short-doc fallback).
    *
    * The word and gram arrays are LET-BOUND (`transform(array(x), v ->
    * body)` — x evaluates once, the lambdas read the bound variable):
    * referencing a prior projection's column inside a lambda body
    * instead lets CollapseProject inline the producing expression into
    * the lambda, re-evaluating the FULL gram transform per window —
    * O(n²) md5s per doc, measured as a 203 s battery entry at sf0.1
    * (bench/runs/r5_battery_run15_winnow_defect.json) against ~2 s for
    * the let-bound form. */
  def qWinnow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (k, w) = (WinnowK, WinnowW)
    val per = TextQueries.dedupCorpus(spark, dir)
      .filter($"text".isNotNull)
      .filter(size(split($"text", " ")) >= k)
      .select($"doc_id",
        (size(split($"text", " ")) - (k - 1)).cast("long").as("n_grams"),
        expr(
          s"""element_at(transform(array(split(text, ' ')), ws ->
             |  element_at(transform(array(
             |      transform(sequence(1, size(ws) - ${k - 1}),
             |                i -> md5(concat_ws(' ', slice(ws, i, $k))))),
             |    gs -> array_distinct(transform(
             |      sequence(1, greatest(size(gs) - ${w - 1}, 1)),
             |      j -> array_min(slice(gs, j, $w))))), 1)), 1)""".stripMargin)
          .as("fps"))
      .select($"doc_id", $"n_grams", size($"fps").as("n_fps"),
        explode($"fps").as("h"))
    // after per-doc distinct, count per fp = number of docs holding it.
    // A COUNT() OVER (PARTITION BY h) window instead of groupBy+join-back:
    // the join's probe side re-evaluates the whole winnow subtree (AQE's
    // broadcast conversion defeats exchange reuse — measured as a second
    // 2.7 s stage at sf0.1), while the window shuffles the same
    // (doc_id, fp) pairs ONCE and reads them once. Per-fp groups are
    // near-singleton at corpus scale, so window state is bounded.
    per
      .withColumn("nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      .groupBy($"doc_id", $"n_grams", $"n_fps")
      .agg(sum(when($"nd" >= 2, 1L).otherwise(0L)).as("n_shared_fps"))
      .withColumn("shared_permille", expr("n_shared_fps * 1000 div n_fps"))
      .withColumn("flagged", ($"shared_permille" >= 500).cast("int"))
      .select($"doc_id", $"n_grams".cast("long").as("n_grams"),
        $"n_fps".cast("long").as("n_fps"), $"n_shared_fps",
        $"shared_permille", $"flagged")
      .orderBy($"doc_id")
  }

  val qWinnowSql: String = {
    val (k, w) = (WinnowK, WinnowW)
    val gramExpr = (0 until k)
      .map(j => s"list_extract(ws, i + $j)")
      .mkString(" || ' ' || ")
    s"""WITH ${TextQueries.dedupCorpusSql},
       |words AS (SELECT doc_id, string_split(text, ' ') AS ws
       |  FROM corpus WHERE text IS NOT NULL),
       |pos AS (SELECT doc_id, ws, unnest(range(1, len(ws) - ${k - 2})) AS i
       |  FROM words WHERE len(ws) >= $k),
       |grams AS (SELECT doc_id, i, md5($gramExpr) AS h FROM pos),
       |ng AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
       |wmin AS (
       |  SELECT g.doc_id, g.i, n.n_grams,
       |    min(g.h) OVER (PARTITION BY g.doc_id ORDER BY g.i
       |                   ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mh
       |  FROM grams g JOIN ng n USING (doc_id)),
       |sel AS (SELECT DISTINCT doc_id, n_grams, mh AS h
       |  FROM wmin WHERE i <= greatest(n_grams - ${w - 1}, 1)),
       |per AS (SELECT doc_id, n_grams, count(*) AS n_fps
       |  FROM sel GROUP BY doc_id, n_grams),
       |dup AS (SELECT h FROM sel GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT s.doc_id, count(*) AS n_shared
       |  FROM sel s JOIN dup d ON d.h = s.h GROUP BY s.doc_id)
       |SELECT p.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams,
       |  CAST(p.n_fps AS BIGINT) AS n_fps,
       |  CAST(coalesce(dp.n_shared, 0) AS BIGINT) AS n_shared_fps,
       |  CAST(coalesce(dp.n_shared, 0) * 1000 // p.n_fps AS BIGINT) AS shared_permille,
       |  CAST(CASE WHEN coalesce(dp.n_shared, 0) * 1000 // p.n_fps >= 500
       |       THEN 1 ELSE 0 END AS INT) AS flagged
       |FROM per p LEFT JOIN dp ON dp.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin
  }

  // ---------------------------------------------------------- classifier

  /** Hashed feature buckets. Production quality classifiers (fastText
    * supervised, DCLM's; Joulin et al. '16) hash word features into a
    * fixed bucket space exactly like this; 64 buckets keeps real
    * collision behavior at the test vocabulary size. */
  val ClassifierBuckets = 64

  /** HASHED LINEAR QUALITY CLASSIFIER — the learned scorer of the
    * DCLM/FineWeb-edu recipe in its deployable form: score(doc) =
    * Σ over DISTINCT words of weight[bucket(md5(word))], keep iff
    * score ≥ 0. The weight table is CLOSED-FORM
    * (w(b) = (b·2654435761) mod 201 − 100, a Knuth-hash spread over
    * [−100, 100]) standing in for trained weights — the plumbing under
    * measurement (hashed features, integer dot, threshold gate) is
    * exactly what a trained vector drops into; a real model arrives as a
    * broadcast array feeding the same aggregate-lambda.
    *
    * Scale shape: the entire scorer is one projection over the scan —
    * tokenize, distinct, hash, fold — zero exchanges before the output
    * sort; per-row cost is O(words·k). This is the fastText-scoring
    * shape langid already uses (pipeline.LangId), re-expressed as a pure
    * Catalyst fold so the oracle can replicate the arithmetic. */
  def qQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = ClassifierBuckets
    Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id",
        expr("array_distinct(filter(split(lower(text), ' '), x -> x != ''))").as("ws"))
      .select($"doc_id", size($"ws").as("n_feats"),
        expr(s"""aggregate(ws, CAST(0 AS BIGINT), (acc, x) ->
                |  acc + ((((locate(substr(md5(x), 1, 1), '0123456789abcdef') - 1) * 16
                |         + (locate(substr(md5(x), 2, 1), '0123456789abcdef') - 1)) % $b)
                |        * CAST(2654435761 AS BIGINT)) % 201 - 100)""".stripMargin)
          .as("score"))
      .select($"doc_id", $"n_feats", $"score",
        ($"score" >= 0).cast("int").as("keep"))
      .orderBy($"doc_id")
  }

  val qQualityClassifierSql: String =
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |feats AS (SELECT DISTINCT doc_id, w FROM words WHERE w <> ''),
       |scored AS (
       |  SELECT doc_id,
       |    ((((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
       |     + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1)) % $ClassifierBuckets)
       |     * CAST(2654435761 AS BIGINT)) % 201 - 100 AS wt
       |  FROM feats),
       |per AS (SELECT doc_id, count(*) AS n_feats, sum(wt) AS score
       |  FROM scored GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(p.n_feats, 0) AS INT) AS n_feats,
       |  CAST(coalesce(p.score, 0) AS BIGINT) AS score,
       |  CAST(CASE WHEN coalesce(p.score, 0) >= 0 THEN 1 ELSE 0 END AS INT) AS keep
       |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
       |WHERE d.text IS NOT NULL
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------ registry

  // --------------------------------------------------------- robots gate

  /** Host space for the robots rules (the canonical 20 synthetic hosts). */
  val RobotsHosts = 20

  /** ROBOTS.TXT GATE (RFC 9309 / REP): per-(host, path) allow/disallow by
    * the LONGEST-MATCHING rule, allow winning length ties — the
    * most-specific-rule semantics every compliant crawler implements
    * (a disallowed subtree can re-allow a deeper path). The per-host rule
    * table is derived in-query (every host disallows /private/; every
    * third host disallows /page/1 but re-allows the more specific
    * /page/12; no-match defaults to allow), so both engines gate
    * identical bytes and the hash compare checks the longest-match rule,
    * not a fetcher.
    *
    * Scale shape: robots rules are per-host and tiny — the rule relation
    * BROADCASTS (a real crawler holds them in each fetcher's memory);
    * pages probe it with a startswith filter and fold to one row per page
    * with a single max(struct(prefix_len, is_allow)) aggregate keyed by
    * doc — the same exchange the page table's id-keyed storage already
    * pays, no global sort before the presentation order. */
  def qRobotsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = Tables.documents(spark, dir).select($"doc_id",
      concat(lit("h"), ($"doc_id" % RobotsHosts)).as("host"),
      expr(
        """concat(CASE WHEN doc_id % 9 = 0 THEN '/private' ELSE '' END,
          |  '/page/', CAST(doc_id % 100 AS STRING))"""
          .stripMargin).as("path"))
    val rules = spark.range(RobotsHosts).select(
        concat(lit("h"), $"id").as("host"),
        expr(
          """CASE WHEN id % 3 = 0
            |  THEN array(struct('disallow' AS kind, '/page/1' AS prefix),
            |             struct('allow' AS kind, '/page/12' AS prefix),
            |             struct('disallow' AS kind, '/private/' AS prefix))
            |  WHEN id % 5 = 0
            |  THEN array(struct('disallow' AS kind, '/private/' AS prefix),
            |             struct('disallow' AS kind, '/page/3' AS prefix),
            |             struct('allow' AS kind, '/page/3' AS prefix))
            |  ELSE array(struct('disallow' AS kind, '/private/' AS prefix)) END"""
            .stripMargin).as("rs"))
      .select($"host", explode($"rs").as("r"))
      .select($"host", $"r.kind".as("kind"), $"r.prefix".as("prefix"))
    val matched = pages.join(broadcast(rules), Seq("host"))
      .filter(expr("startswith(path, prefix)"))
      .groupBy($"doc_id")
      .agg(max(struct(length($"prefix").as("l"),
        ($"kind" === "allow").cast("int").as("a"), $"prefix".as("p"))).as("m"),
        count(lit(1)).as("n_matching"))
      .select($"doc_id",
        when($"m.a" === 1, "allow").otherwise("disallow").as("verdict0"),
        $"m.p".as("matched0"), $"n_matching")
    pages.join(matched, Seq("doc_id"), "left")
      .select($"doc_id", $"host", $"path",
        coalesce($"verdict0", lit("allow")).as("verdict"),
        coalesce($"matched0", lit("-")).as("matched_rule"),
        coalesce($"n_matching", lit(0L)).as("n_matching_rules"))
      .orderBy($"doc_id")
  }

  val qRobotsGateSql: String =
    s"""WITH pages AS (
       |  SELECT doc_id, 'h' || CAST(doc_id % $RobotsHosts AS VARCHAR) AS host,
       |    CASE WHEN doc_id % 9 = 0 THEN '/private' ELSE '' END
       |      || '/page/' || CAST(doc_id % 100 AS VARCHAR) AS path
       |  FROM documents),
       |hosts AS (SELECT unnest(range(0, $RobotsHosts)) AS id),
       |rules AS (
       |  SELECT 'h' || CAST(id AS VARCHAR) AS host, 'disallow' AS kind,
       |    '/private/' AS prefix FROM hosts
       |  UNION ALL SELECT 'h' || CAST(id AS VARCHAR), 'disallow', '/page/1'
       |    FROM hosts WHERE id % 3 = 0
       |  UNION ALL SELECT 'h' || CAST(id AS VARCHAR), 'allow', '/page/12'
       |    FROM hosts WHERE id % 3 = 0
       |  UNION ALL SELECT 'h' || CAST(id AS VARCHAR), 'disallow', '/page/3'
       |    FROM hosts WHERE id % 5 = 0 AND id % 3 != 0
       |  UNION ALL SELECT 'h' || CAST(id AS VARCHAR), 'allow', '/page/3'
       |    FROM hosts WHERE id % 5 = 0 AND id % 3 != 0),
       |matched AS (
       |  SELECT p.doc_id,
       |    max({'l': length(r.prefix),
       |         'a': CASE WHEN r.kind = 'allow' THEN 1 ELSE 0 END,
       |         'p': r.prefix}) AS m,
       |    CAST(count(*) AS BIGINT) AS n_matching
       |  FROM pages p JOIN rules r ON p.host = r.host
       |    AND starts_with(p.path, r.prefix)
       |  GROUP BY p.doc_id)
       |SELECT p.doc_id, p.host, p.path,
       |  coalesce(CASE WHEN m.m.a = 1 THEN 'allow'
       |                WHEN m.m.a = 0 THEN 'disallow' END, 'allow') AS verdict,
       |  coalesce(m.m.p, '-') AS matched_rule,
       |  coalesce(m.n_matching, 0) AS n_matching_rules
       |FROM pages p LEFT JOIN matched m ON m.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  // ----------------------------------------------------- classifier sweep

  /** The deployment threshold grid (classifier-score units; the measured
    * corpus spread is ±~500). */
  val SweepThresholds: Seq[Long] =
    Seq(-300L, -200L, -100L, -50L, 0L, 50L, 100L, 200L, 300L)

  /** CLASSIFIER THRESHOLD SWEEP — the calibration table a quality-filter
    * deployment reads before picking its cutoff (the DCLM/FineWeb-edu
    * recipe: sweep the classifier threshold, inspect precision/recall
    * against a reference labeling, choose the keep-rate point): per
    * threshold t, the confusion counts of `score >= t` against an
    * independent heuristic label (wordy-enough AND mean-word-length in
    * range — replicable integer rules), plus precision/recall/keep-rate
    * in exact permille. Score is the same hashed-linear scorer as
    * q_quality_classifier, so the sweep measures the DEPLOYED artifact.
    *
    * Scale shape: one per-doc pass computes (score, label) fused into the
    * scan; the 9-row threshold grid cross-joins as a broadcast literal
    * and the confusion rollup exchanges 9 × 4 partial counters with
    * map-side combine — corpus-size-independent output. */
  def qClassifierSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = ClassifierBuckets
    val scored = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", length($"text").as("n_chars"),
        expr("array_distinct(filter(split(lower(text), ' '), x -> x != ''))").as("ws"),
        expr("size(filter(split(text, ' '), x -> x != ''))").as("n_words"))
      .select(
        expr(s"""aggregate(ws, CAST(0 AS BIGINT), (acc, x) ->
                |  acc + ((((locate(substr(md5(x), 1, 1), '0123456789abcdef') - 1) * 16
                |         + (locate(substr(md5(x), 2, 1), '0123456789abcdef') - 1)) % $b)
                |        * CAST(2654435761 AS BIGINT)) % 201 - 100)""".stripMargin)
          .as("score"),
        expr("CASE WHEN n_words >= 40 AND n_chars * 1000 DIV n_words <= 5600 " +
          "THEN 1 ELSE 0 END").as("label"))
    val grid = SweepThresholds.toDF("threshold")
    scored.crossJoin(broadcast(grid))
      .groupBy($"threshold")
      .agg(
        count(when($"score" >= $"threshold" && $"label" === 1, 1)).as("tp"),
        count(when($"score" >= $"threshold" && $"label" === 0, 1)).as("fp"),
        count(when($"score" < $"threshold" && $"label" === 1, 1)).as("fn"),
        count(when($"score" < $"threshold" && $"label" === 0, 1)).as("tn"))
      .withColumn("precision_permille",
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000 DIV (tp + fp) ELSE -1 END"))
      .withColumn("recall_permille",
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000 DIV (tp + fn) ELSE -1 END"))
      .withColumn("keep_permille",
        expr("(tp + fp) * 1000 DIV (tp + fp + fn + tn)"))
      .orderBy($"threshold")
  }

  val qClassifierSweepSql: String = {
    val grid = SweepThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |feats AS (SELECT DISTINCT doc_id, w FROM words WHERE w <> ''),
       |wt AS (
       |  SELECT doc_id,
       |    ((((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
       |     + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1)) % $ClassifierBuckets)
       |     * CAST(2654435761 AS BIGINT)) % 201 - 100 AS wt
       |  FROM feats),
       |per AS (SELECT doc_id, sum(wt) AS score FROM wt GROUP BY doc_id),
       |lab AS (
       |  SELECT d.doc_id, coalesce(p.score, 0) AS score,
       |    CASE WHEN len(list_filter(string_split(d.text, ' '), x -> x != '')) >= 40
       |         AND length(d.text) * 1000
       |             // len(list_filter(string_split(d.text, ' '), x -> x != '')) <= 5600
       |         THEN 1 ELSE 0 END AS label
       |  FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
       |  WHERE d.text IS NOT NULL),
       |grid AS (SELECT * FROM (VALUES $grid) g(threshold))
       |SELECT CAST(g.threshold AS BIGINT) AS threshold,
       |  CAST(count(CASE WHEN l.score >= g.threshold AND l.label = 1 THEN 1 END) AS BIGINT) AS tp,
       |  CAST(count(CASE WHEN l.score >= g.threshold AND l.label = 0 THEN 1 END) AS BIGINT) AS fp,
       |  CAST(count(CASE WHEN l.score < g.threshold AND l.label = 1 THEN 1 END) AS BIGINT) AS fn,
       |  CAST(count(CASE WHEN l.score < g.threshold AND l.label = 0 THEN 1 END) AS BIGINT) AS tn,
       |  CASE WHEN count(CASE WHEN l.score >= g.threshold AND l.label = 1 THEN 1 END)
       |          + count(CASE WHEN l.score >= g.threshold AND l.label = 0 THEN 1 END) > 0
       |    THEN CAST(count(CASE WHEN l.score >= g.threshold AND l.label = 1 THEN 1 END) * 1000
       |      // (count(CASE WHEN l.score >= g.threshold AND l.label = 1 THEN 1 END)
       |        + count(CASE WHEN l.score >= g.threshold AND l.label = 0 THEN 1 END)) AS BIGINT)
       |    ELSE -1 END AS precision_permille,
       |  CASE WHEN count(CASE WHEN l.label = 1 THEN 1 END) > 0
       |    THEN CAST(count(CASE WHEN l.score >= g.threshold AND l.label = 1 THEN 1 END) * 1000
       |      // count(CASE WHEN l.label = 1 THEN 1 END) AS BIGINT)
       |    ELSE -1 END AS recall_permille,
       |  CAST((count(CASE WHEN l.score >= g.threshold THEN 1 END)) * 1000
       |    // count(*) AS BIGINT) AS keep_permille
       |FROM lab l CROSS JOIN grid g
       |GROUP BY g.threshold
       |ORDER BY threshold""".stripMargin
  }

  // --------------------------------------------------- URL-shape heuristics

  /** URL-shape gate thresholds (RefinedWeb §3.1 runs exactly this family
    * of lexical URL features before any content look). */
  val UrlMaxDepth = 5L
  /** Sits inside this layout's 23–53-char span so the length rule is
    * live: depth-5 URLs (~47 chars) fail on length while depth-6 URLs
    * attribute to the earlier depth rule — first-failing order proven
    * meaningful, not just declared. */
  val UrlMaxLen = 45L
  val UrlMaxDigitPermille = 150L

  /** URL-SHAPE HEURISTIC GATE (RefinedWeb/UT1-adjacent: before fetching
    * a byte of content, crawlers drop URLs whose SHAPE predicts spam —
    * excessive path depth, very long URLs, digit-heavy paths typical of
    * session ids and auto-generated listings): deterministic synthetic
    * URLs (depth = doc_id % 7 path segments; every doc_id % 13 = 0 doc
    * carries a digit-heavy id segment), lexical features (depth, length,
    * digit share ‰), and the keep/drop decision with FIRST-FAILING rule
    * attribution in pinned order depth → length → digits.
    *
    * Scale shape: everything is one scalar projection fused into the
    * scan — zero exchanges before the output sort; a real URL column
    * drops into the same expressions. */
  def qUrlShape(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urlExpr = expr(
      """concat('https://h', CAST(doc_id % 20 AS STRING), '.example.com/',
        |  array_join(
        |    CASE WHEN doc_id % 7 >= 1 THEN
        |      transform(sequence(1, CAST(doc_id % 7 AS INT)),
        |        i -> CASE WHEN doc_id % 13 = 0
        |                  THEN concat('p', CAST(doc_id AS STRING),
        |                              CAST(i AS STRING))
        |                  ELSE concat('sec', CAST(i AS STRING)) END)
        |    ELSE CAST(array() AS ARRAY<STRING>) END,
        |  '/'))""".stripMargin)
    Tables.documents(spark, dir)
      .select($"doc_id", urlExpr.as("url"))
      .withColumn("depth", ($"doc_id" % 7).cast("long"))
      .withColumn("url_len", length($"url").cast("long"))
      .withColumn("n_digits",
        length(regexp_replace($"url", "[^0-9]", "")).cast("long"))
      .withColumn("digit_permille",
        expr("n_digits * 1000 DIV url_len"))
      .withColumn("reason",
        when($"depth" > UrlMaxDepth, "depth")
          .when($"url_len" > UrlMaxLen, "length")
          .when($"digit_permille" > UrlMaxDigitPermille, "digits")
          .otherwise("pass"))
      .withColumn("keep",
        ($"reason" === "pass").cast("int").cast("long"))
      .select($"doc_id", $"url", $"depth", $"url_len", $"n_digits",
        $"digit_permille", $"reason", $"keep")
      .orderBy($"doc_id")
  }

  val qUrlShapeSql: String =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com/' ||
       |      COALESCE(
       |        array_to_string(list_transform(range(1, CAST(doc_id % 7 AS INT) + 1),
       |          i -> CASE WHEN doc_id % 13 = 0
       |                    THEN 'p' || CAST(doc_id AS VARCHAR)
       |                           || CAST(i AS VARCHAR)
       |                    ELSE 'sec' || CAST(i AS VARCHAR) END),
       |        '/'), '') AS url,
       |    CAST(doc_id % 7 AS BIGINT) AS depth
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, url, depth,
       |    CAST(length(url) AS BIGINT) AS url_len,
       |    CAST(length(regexp_replace(url, '[^0-9]', '', 'g')) AS BIGINT)
       |      AS n_digits
       |  FROM u)
       |SELECT doc_id, url, depth, url_len, n_digits,
       |  n_digits * 1000 // url_len AS digit_permille,
       |  CASE WHEN depth > $UrlMaxDepth THEN 'depth'
       |       WHEN url_len > $UrlMaxLen THEN 'length'
       |       WHEN n_digits * 1000 // url_len > $UrlMaxDigitPermille
       |         THEN 'digits'
       |       ELSE 'pass' END AS reason,
       |  CAST(CASE WHEN depth <= $UrlMaxDepth AND url_len <= $UrlMaxLen
       |         AND n_digits * 1000 // url_len <= $UrlMaxDigitPermille
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_crawl_frontier" -> qCrawlFrontier,
    "q_url_blocklist" -> qUrlBlocklist,
    "q_winnow" -> qWinnow,
    "q_quality_classifier" -> qQualityClassifier,
    "q_robots_gate" -> qRobotsGate,
    "q_classifier_sweep" -> qClassifierSweep,
    "q_url_shape" -> qUrlShape)

  val oracleSql: Map[String, String] = Map(
    "q_crawl_frontier" -> qCrawlFrontierSql,
    "q_url_blocklist" -> qUrlBlocklistSql,
    "q_winnow" -> qWinnowSql,
    "q_quality_classifier" -> qQualityClassifierSql,
    "q_robots_gate" -> qRobotsGateSql,
    "q_classifier_sweep" -> qClassifierSweepSql,
    "q_url_shape" -> qUrlShapeSql)
}
