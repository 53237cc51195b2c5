package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus operators round 4 — corpus-hygiene channels: host-scoped
  * boilerplate line removal (CCNet §4.1's per-shard paragraph filter,
  * scoped the way production pipelines actually run it — per host, since
  * nav/footer templates repeat within a site, not across the corpus),
  * link-reciprocity spam-farm detection over the host webgraph, HTML
  * metadata extraction (title/description/anchor census), and
  * quality-gated epoch upsampling (the data-constrained-LM recipe:
  * repeat good documents up to a cap instead of crawling more). All
  * exact integer derivations; every query answers a DuckDB oracle
  * bit-for-bit.
  */
object HygieneQueries {

  // ------------------------------------------------ host boilerplate lines

  /** A line is host-boilerplate when it appears on strictly more than
    * this fraction (permille) of the host's pages. */
  val BoilerPermille = 500

  /** HOST-SCOPED BOILERPLATE REMOVAL (CCNet §4.1 / justext's "repeated
    * block" rule): pages are 5-line groups of consecutive docs (the
    * q_dedup_lines page convention), hosted by page_id % 10; every page
    * of a host carries a planted NAV line (100% of the host's pages →
    * dropped) and every third page a PROMO line (~33% → kept, proving
    * the threshold gates, not mere repetition). A line is boilerplate
    * within its host iff it occurs on > [[BoilerPermille]]‰ of that
    * host's pages; pages are reassembled from surviving lines.
    *
    * Differs from q_dedup_lines on purpose: that operator keeps the
    * canonical FIRST copy of a corpus-wide duplicate; this one drops
    * EVERY copy of a host-frequent line — boilerplate has no canonical
    * copy worth keeping.
    *
    * Scale shape (10^12 pages): line stats are keyed by (host, md5) —
    * the stats shuffle carries digests and page ids, never text; only
    * lines crossing the threshold (a tiny fraction of distinct lines)
    * join back, so AQE broadcasts them. Host page counts are a
    * host-cardinality rollup (broadcast). The one full shuffle of text
    * is the page-reassembly groupBy on the table's natural key. The
    * decision (host-frequency threshold) is order-independent, so the
    * output is deterministic under any partitioning. */
  def qBoilerplateHost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", $"text")
    val base = docs.select(
      floor($"doc_id" / 5).cast("long").as("page_id"),
      ($"doc_id" % 5).cast("int").as("idx"),
      $"text".as("line"))
    val pages = base.select($"page_id").distinct()
    val nav = pages.select($"page_id", lit(5).as("idx"),
      concat(lit("NAV h"), ($"page_id" % 10).cast("string")).as("line"))
    val promo = pages.filter($"page_id" % 3 === 0)
      .select($"page_id", lit(6).as("idx"),
        concat(lit("PROMO h"), ($"page_id" % 10).cast("string")).as("line"))
    val lines = base.unionAll(nav).unionAll(promo)
      .withColumn("host", concat(lit("h"), ($"page_id" % 10).cast("string")))
      .withColumn("h", md5($"line"))
    val hostPages = lines.select($"host", $"page_id").distinct()
      .groupBy($"host").agg(count(lit(1)).as("host_pages"))
    // digests only in the stats shuffle; the threshold survivors are the
    // small side, so the match back is broadcast under AQE
    val boiler = lines.select($"host", $"h", $"page_id").distinct()
      .groupBy($"host", $"h").agg(count(lit(1)).as("n_pages_with"))
      .join(broadcast(hostPages), "host")
      .filter($"n_pages_with" * 1000 > $"host_pages" * BoilerPermille)
      .select($"host", $"h", lit(true).as("is_boiler"))
    lines.join(boiler, Seq("host", "h"), "left")
      .withColumn("keep", $"is_boiler".isNull)
      .groupBy($"page_id")
      .agg(
        min($"host").as("host"),
        count(when($"keep", 1)).as("n_kept"),
        count(when(!$"keep", 1)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when($"keep", struct($"idx", $"line")))),
            x => x.getField("line")),
          "\n").as("joined"))
      .select($"page_id", $"host", $"n_kept", $"n_dropped",
        when($"n_kept" > 0, $"joined").as("text"))
      .orderBy($"page_id")
  }

  val qBoilerplateHostSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |base AS (
       |  SELECT CAST(doc_id // 5 AS BIGINT) AS page_id,
       |    CAST(doc_id % 5 AS INT) AS idx, text AS line
       |  FROM docs),
       |pages AS (SELECT DISTINCT page_id FROM base),
       |planted AS (
       |  SELECT page_id, 5 AS idx,
       |    'NAV h' || CAST(page_id % 10 AS VARCHAR) AS line FROM pages
       |  UNION ALL
       |  SELECT page_id, 6 AS idx,
       |    'PROMO h' || CAST(page_id % 10 AS VARCHAR) AS line
       |  FROM pages WHERE page_id % 3 = 0),
       |lines AS (
       |  SELECT page_id, idx, line,
       |    'h' || CAST(page_id % 10 AS VARCHAR) AS host, md5(line) AS h
       |  FROM (SELECT * FROM base UNION ALL SELECT * FROM planted)),
       |hp AS (
       |  SELECT host, count(DISTINCT page_id) AS host_pages
       |  FROM lines GROUP BY host),
       |boiler AS (
       |  SELECT s.host, s.h
       |  FROM (SELECT host, h, count(DISTINCT page_id) AS n_pages_with
       |        FROM lines GROUP BY host, h) s
       |  JOIN hp ON hp.host = s.host
       |  WHERE s.n_pages_with * 1000 > hp.host_pages * $BoilerPermille),
       |flagged AS (
       |  SELECT l.page_id, l.host, l.idx, l.line,
       |    (b.h IS NULL) AS keep
       |  FROM lines l LEFT JOIN boiler b
       |    ON b.host = l.host AND b.h = l.h)
       |SELECT page_id, min(host) AS host,
       |  CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
       |  CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_dropped,
       |  CASE WHEN count(CASE WHEN keep THEN 1 END) > 0
       |       THEN string_agg(CASE WHEN keep THEN line END, chr(10)
       |                       ORDER BY idx)
       |       END AS text
       |FROM flagged GROUP BY page_id ORDER BY page_id""".stripMargin

  // ---------------------------------------------------- link reciprocity

  /** Reciprocity above this (permille of the smaller direction over the
    * larger) with at least [[SpamMinLinks]] total links flags a pair. */
  val SpamRecipPermille = 600
  val SpamMinLinks = 4L

  /** LINK-RECIPROCITY SPAM DETECTION (link-farm heuristic, Gyöngyi &
    * Garcia-Molina '05: reciprocal link exchanges are the cheapest farm
    * signature): roll the host webgraph (q_link_graph's derivation
    * contract, reused verbatim) to UNORDERED host pairs, count links in
    * each direction, and score reciprocity = min·1000/max. Pairs with
    * reciprocity ≥ [[SpamRecipPermille]]‰ and volume ≥ [[SpamMinLinks]]
    * are flagged. Every row keeps the full evidence (fwd, bwd, volume).
    *
    * Scale shape: one pass over the edge rollup (host²-bounded, never
    * page-sized) — least/greatest canonicalization is a per-row map, the
    * pair rollup is one hash agg on the already-compact edge table. No
    * joins at all. */
  def qLinkReciprocity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = CorpusQueries.docLinks(spark, dir)
      .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
    edges.select(
        least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"),
        when($"src" < $"dst", $"n").otherwise(0L).as("fwd_part"),
        when($"src" > $"dst", $"n").otherwise(0L).as("bwd_part"))
      .groupBy($"a", $"b")
      .agg(sum($"fwd_part").as("fwd"), sum($"bwd_part").as("bwd"))
      .select($"a", $"b", $"fwd", $"bwd",
        (least($"fwd", $"bwd") * 1000 / greatest($"fwd", $"bwd"))
          .cast("long").as("reciprocity_permille"),
        ($"fwd" + $"bwd").as("volume"))
      .withColumn("spam_pair",
        ($"reciprocity_permille" >= SpamRecipPermille &&
          $"volume" >= SpamMinLinks).cast("int"))
      .orderBy($"a", $"b")
  }

  val qLinkReciprocitySql: String =
    s"""${CorpusQueries.linkCtes},
       |pairs AS (
       |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
       |    CAST(sum(CASE WHEN src < dst THEN n_links ELSE 0 END) AS BIGINT) AS fwd,
       |    CAST(sum(CASE WHEN src > dst THEN n_links ELSE 0 END) AS BIGINT) AS bwd
       |  FROM edges GROUP BY 1, 2)
       |SELECT a, b, fwd, bwd,
       |  least(fwd, bwd) * 1000 // greatest(fwd, bwd) AS reciprocity_permille,
       |  fwd + bwd AS volume,
       |  CAST(CASE WHEN least(fwd, bwd) * 1000 // greatest(fwd, bwd)
       |                  >= $SpamRecipPermille
       |             AND fwd + bwd >= $SpamMinLinks
       |       THEN 1 ELSE 0 END AS INT) AS spam_pair
       |FROM pairs ORDER BY a, b""".stripMargin

  // ------------------------------------------------------ metadata extract

  /** HTML METADATA EXTRACTION (the WARC-enrichment census every crawl
    * keeps beside extracted text: title, meta description, outlink
    * count): pages are materialized as deterministic HTML around each
    * doc (the q_extract_html planting convention — the oracle re-derives
    * the same fields from the same parts, so extraction correctness is
    * what's checked), then title and description are pulled back by
    * regex and anchors counted by literal occurrence.
    *
    * Scale shape: a pure scalar projection fused into the scan — zero
    * exchanges, zero UDFs; regexp_extract and the replace-based
    * occurrence count stay inside whole-stage codegen. Cost is one pass
    * over the page bytes, the cheapest operator class at 10^12 docs. */
  def qExtractMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val anchor = """<a href="#">x</a>"""
    Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id",
        concat(
          lit("<html><head><title>Doc "), $"doc_id",
          lit("</title><meta name=\"description\" content=\""),
          regexp_replace(substring($"text", 1, 32), "\"", ""),
          lit("\"></head><body>"),
          repeat(lit(anchor), ($"doc_id" % 4).cast("int")),
          lit("<p>"), $"text", lit("</p></body></html>")).as("html"))
      .select($"doc_id",
        regexp_extract($"html", "<title>([^<]*)</title>", 1).as("title"),
        regexp_extract($"html", "content=\"([^\"]*)\"", 1).as("description"),
        ((length($"html") - length(regexp_replace($"html",
            java.util.regex.Pattern.quote(anchor), ""))) / anchor.length)
          .cast("int").as("n_anchors"))
      .orderBy($"doc_id")
  }

  val qExtractMetaSql: String = {
    val anchor = """<a href="#">x</a>"""
    s"""WITH pages AS (
       |  SELECT doc_id,
       |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
       |    '</title><meta name="description" content="' ||
       |    replace(substr(text, 1, 32), '"', '') ||
       |    '"></head><body>' ||
       |    repeat('$anchor', CAST(doc_id % 4 AS INT)) ||
       |    '<p>' || text || '</p></body></html>' AS html
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id,
       |  regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       |  regexp_extract(html, 'content="([^"]*)"', 1) AS description,
       |  CAST((length(html) - length(replace(html, '$anchor', '')))
       |       // ${anchor.length} AS INT) AS n_anchors
       |FROM pages ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------- epoch upsample

  /** Repeat cap: no document is emitted more than this many times. */
  val MaxEpochs = 4
  /** Ideal mean word length ×100 (quality peaks here, permille scale). */
  val IdealMwlX100 = 450L

  /** QUALITY-GATED EPOCH UPSAMPLING (the data-constrained recipe,
    * Muennighoff et al. '23: when the crawl is exhausted, repeat the
    * best documents up to a cap rather than lowering the quality bar):
    * each doc gets an integer quality score (1000 minus the distance of
    * its mean word length ×100 from [[IdealMwlX100]], floored at 0 — a
    * deterministic stand-in for a classifier logit), docs under the
    * Gopher word-count floor are dropped (0 epochs), survivors are
    * repeated 1 + quality·(cap−1)/1000 times. Each row carries the full
    * audit trail plus its language's total emitted tokens, so mixture
    * accounting is recomputable from the output alone.
    *
    * Scale shape: the score and epoch count are a narrow per-row map
    * fused into the scan; the only exchange is the language rollup
    * (tiny domain → map-side partials collapse it) broadcast back. */
  def qEpochUpsample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", $"lang",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("doc_tokens"),
        length(regexp_replace($"text", " ", "")).cast("long").as("word_chars"))
      .withColumn("mwl_x100",
        expr("CAST(word_chars * 100 DIV doc_tokens AS BIGINT)"))
      .withColumn("q_permille",
        greatest(lit(0L), lit(1000L) - abs($"mwl_x100" - IdealMwlX100)))
      .withColumn("n_epochs",
        when($"doc_tokens" < 25, lit(0L)).otherwise(
          expr(s"CAST(1 + q_permille * ${MaxEpochs - 1} DIV 1000 AS BIGINT)")))
      .withColumn("emitted_tokens", $"doc_tokens" * $"n_epochs")
    val perLang = d.groupBy($"lang")
      .agg(sum($"emitted_tokens").as("lang_emitted_tokens"))
    d.join(broadcast(perLang), "lang")
      .select($"doc_id", $"lang", $"doc_tokens", $"q_permille", $"n_epochs",
        $"emitted_tokens", $"lang_emitted_tokens")
      .orderBy($"doc_id")
  }

  val qEpochUpsampleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
       |      AS doc_tokens,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS word_chars
       |  FROM documents WHERE text IS NOT NULL),
       |scored AS (
       |  SELECT doc_id, lang, doc_tokens,
       |    greatest(0, 1000 - abs(word_chars * 100 // doc_tokens
       |                           - $IdealMwlX100)) AS q_permille
       |  FROM d),
       |ep AS (
       |  SELECT *,
       |    CAST(CASE WHEN doc_tokens < 25 THEN 0
       |         ELSE 1 + q_permille * ${MaxEpochs - 1} // 1000 END AS BIGINT)
       |      AS n_epochs
       |  FROM scored),
       |em AS (SELECT *, doc_tokens * n_epochs AS emitted_tokens FROM ep),
       |pl AS (SELECT lang, CAST(sum(emitted_tokens) AS BIGINT)
       |    AS lang_emitted_tokens FROM em GROUP BY lang)
       |SELECT em.doc_id, em.lang, em.doc_tokens,
       |  CAST(em.q_permille AS BIGINT) AS q_permille, em.n_epochs,
       |  em.emitted_tokens, pl.lang_emitted_tokens
       |FROM em JOIN pl ON pl.lang = em.lang
       |ORDER BY em.doc_id""".stripMargin

  // --------------------------------------------------------- mirror hosts

  /** Origin hosts in the mirror-detection web layout (doc_id % this). */
  val MirrorHosts = 20
  /** A content digest served by strictly more than this many hosts is
    * treated as web-wide boilerplate and excluded from mirror scoring —
    * the cap that keeps the digest self-join linear (a ubiquitous digest
    * would otherwise fan into O(hosts²) pairs). */
  val MaxHostsPerDigest = 8L
  /** Content-overlap Jaccard (‰) at or above which a host pair is
    * flagged as a mirror. */
  val MirrorJaccardPermille = 500L

  /** MIRROR-HOST DETECTION (the site-level dedup channel: entire hosts
    * re-serving another host's pages — mirrors, scrapers, CDN aliases —
    * which page-level dedup sees only as scattered pairs; crawlers
    * blocklist the whole host instead): each page's content digest is
    * attributed to its host; host pairs sharing digests are scored by
    * set Jaccard ‰ over their (deduplicated) digest sets. The corpus
    * plants a FULL mirror (host `m3` re-serves every page of `h3` →
    * 1000‰, flagged) and a QUARTER mirror (`m7` re-serves a quarter of
    * `h7` → ~250‰, below the 500‰ bar — proving the threshold gates, not
    * mere overlap). Web-wide boilerplate digests (served by more than
    * [[MaxHostsPerDigest]] hosts) are excluded with corpus-level
    * accounting carried on every row.
    *
    * Scale shape (10^8 hosts, 10^12 pages): the shuffle carries (host,
    * digest) pairs only — never text; the pair join is keyed by digest
    * with the ubiquity cap bounding each digest's fan-out, so candidate
    * pairs stay O(shared digests · cap), never O(hosts²); host set
    * sizes are a host-cardinality rollup that AQE broadcasts onto the
    * pair table. */
  def qMirrorHosts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", md5($"text").as("h"))
    val origin = docs.select(
      concat(lit("h"), ($"doc_id" % MirrorHosts).cast("string")).as("host"),
      $"h")
    val mirrorFull = docs.filter($"doc_id" % MirrorHosts === 3)
      .select(lit("m3").as("host"), $"h")
    val mirrorQuarter = docs.filter($"doc_id" % (MirrorHosts * 4) === 7)
      .select(lit("m7").as("host"), $"h")
    // CACHE both shared frames: hostDigests feeds the ubiquity agg and
    // the anti-join probe; kept feeds the size rollup and both sides of
    // the intersection self-join — without the caches the md5 scan +
    // distinct re-run per consumer. Harnesses clearCache() after each
    // query; both frames are (host, digest) rows, corpus-bounded.
    val hostDigests = origin.unionAll(mirrorFull).unionAll(mirrorQuarter)
      .distinct()
      .cache()
    val ubiquitous = hostDigests.groupBy($"h")
      .agg(count(lit(1)).as("n_hosts"))
      .filter($"n_hosts" > MaxHostsPerDigest)
    val nExcluded = ubiquitous.agg(
      coalesce(count(lit(1)), lit(0L)).as("n_excluded_digests"))
    val kept = hostDigests.join(ubiquitous.select($"h"), Seq("h"), "left_anti")
      .cache()
    val sizes = kept.groupBy($"host").agg(count(lit(1)).as("n"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        $"a.h" === $"b.h" && $"a.host" < $"b.host")
      .groupBy($"a.host".as("host_a"), $"b.host".as("host_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select($"host".as("host_a"), $"n".as("n_a")), Seq("host_a"))
      .join(sizes.select($"host".as("host_b"), $"n".as("n_b")), Seq("host_b"))
      .withColumn("jaccard_permille",
        expr("inter * 1000 DIV (n_a + n_b - inter)"))
      .withColumn("mirror",
        ($"jaccard_permille" >= MirrorJaccardPermille).cast("int").cast("long"))
      .crossJoin(broadcast(nExcluded))
      .select($"host_a", $"host_b", $"n_a", $"n_b", $"inter",
        $"jaccard_permille", $"mirror", $"n_excluded_digests")
      .orderBy($"host_a", $"host_b")
  }

  val qMirrorHostsSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, md5(text) AS h FROM documents WHERE text IS NOT NULL),
       |hd AS (
       |  SELECT DISTINCT host, h FROM (
       |    SELECT 'h' || CAST(doc_id % $MirrorHosts AS VARCHAR) AS host, h
       |    FROM docs
       |    UNION ALL
       |    SELECT 'm3' AS host, h FROM docs WHERE doc_id % $MirrorHosts = 3
       |    UNION ALL
       |    SELECT 'm7' AS host, h FROM docs
       |    WHERE doc_id % ${MirrorHosts * 4} = 7)),
       |ubiq AS (
       |  SELECT h FROM hd GROUP BY h HAVING count(*) > $MaxHostsPerDigest),
       |excl AS (SELECT CAST(count(*) AS BIGINT) AS n_excluded_digests
       |         FROM ubiq),
       |kept AS (SELECT * FROM hd WHERE h NOT IN (SELECT h FROM ubiq)),
       |sizes AS (SELECT host, CAST(count(*) AS BIGINT) AS n
       |          FROM kept GROUP BY host),
       |pairs AS (
       |  SELECT a.host AS host_a, b.host AS host_b,
       |    CAST(count(*) AS BIGINT) AS inter
       |  FROM kept a JOIN kept b ON a.h = b.h AND a.host < b.host
       |  GROUP BY 1, 2)
       |SELECT p.host_a, p.host_b, sa.n AS n_a, sb.n AS n_b, p.inter,
       |  p.inter * 1000 // (sa.n + sb.n - p.inter) AS jaccard_permille,
       |  CAST(CASE WHEN p.inter * 1000 // (sa.n + sb.n - p.inter)
       |      >= $MirrorJaccardPermille THEN 1 ELSE 0 END AS BIGINT)
       |    AS mirror,
       |  excl.n_excluded_digests
       |FROM pairs p
       |JOIN sizes sa ON sa.host = p.host_a
       |JOIN sizes sb ON sb.host = p.host_b
       |CROSS JOIN excl
       |ORDER BY p.host_a, p.host_b""".stripMargin

  // ------------------------------------------------- host language purity

  /** Majority-language share (‰) below which a host is flagged mixed. */
  val PurityMinPermille = 600L
  /** Distinct-language count above which a host is flagged mixed. */
  val PurityMaxLangs = 2L

  /** HOST LANGUAGE PURITY (CCNet observes that a legitimate site serves
    * one or two languages; hosts spraying many languages are typically
    * machine-translation spam farms — the HOST-level langid consistency
    * check that doc-level langid can't see): per host (the q_mirror_hosts
    * layout), doc count, distinct languages, the majority language (ties
    * pinned to the byte-smallest lang) and its share ‰, flagged mixed
    * when the share drops under [[PurityMinPermille]] or the language
    * count exceeds [[PurityMaxLangs]]. The host layout plants both
    * classes: every `doc_id % 4 = 0` page is served by a per-language
    * host (`l-<lang>` — the single-language site that dominates the real
    * web, always pure) while the rest spread over 20 generic hosts that
    * genuinely mix — so the flag separates, not merely fires.
    *
    * Scale shape: one (host, lang) rollup with map-side partials (host ×
    * lang cardinality), then a host-cardinality argmax via min(struct) —
    * commutative, no window, deterministic under any partitioning. */
  def qHostLangPurity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        when($"doc_id" % 4 === 0, concat(lit("l-"), $"lang"))
          .otherwise(concat(lit("h"), ($"doc_id" % MirrorHosts).cast("string")))
          .as("host"), $"lang")
      .groupBy($"host", $"lang").agg(count(lit(1)).as("cnt"))
      .groupBy($"host")
      .agg(
        sum($"cnt").as("n_docs"),
        count(lit(1)).as("n_langs"),
        min(struct((-$"cnt").as("neg"), $"lang".as("lang"))).as("m"))
      .select($"host", $"n_docs", $"n_langs",
        $"m.lang".as("majority_lang"),
        (-$"m.neg").cast("long").as("majority_docs"))
      .withColumn("majority_permille",
        expr("majority_docs * 1000 DIV n_docs"))
      .withColumn("mixed",
        ($"majority_permille" < PurityMinPermille ||
          $"n_langs" > PurityMaxLangs).cast("int").cast("long"))
      .select($"host", $"n_docs", $"n_langs", $"majority_lang",
        $"majority_docs", $"majority_permille", $"mixed")
      .orderBy($"host")
  }

  val qHostLangPuritySql: String =
    s"""WITH hl AS (
       |  SELECT CASE WHEN doc_id % 4 = 0 THEN 'l-' || lang
       |         ELSE 'h' || CAST(doc_id % $MirrorHosts AS VARCHAR) END
       |      AS host,
       |    lang, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents GROUP BY 1, 2),
       |r AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY host ORDER BY cnt DESC, lang)
       |      AS rn,
       |    CAST(sum(cnt) OVER (PARTITION BY host) AS BIGINT) AS n_docs,
       |    CAST(count(*) OVER (PARTITION BY host) AS BIGINT) AS n_langs
       |  FROM hl)
       |SELECT host, n_docs, n_langs, lang AS majority_lang,
       |  cnt AS majority_docs,
       |  cnt * 1000 // n_docs AS majority_permille,
       |  CAST(CASE WHEN cnt * 1000 // n_docs < $PurityMinPermille
       |         OR n_langs > $PurityMaxLangs
       |       THEN 1 ELSE 0 END AS BIGINT) AS mixed
       |FROM r WHERE rn = 1 ORDER BY host""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_boilerplate_host" -> qBoilerplateHost,
    "q_link_reciprocity" -> qLinkReciprocity,
    "q_extract_meta" -> qExtractMeta,
    "q_epoch_upsample" -> qEpochUpsample,
    "q_mirror_hosts" -> qMirrorHosts,
    "q_host_lang_purity" -> qHostLangPurity,
  )

  val oracleSql: Map[String, String] = Map(
    "q_boilerplate_host" -> qBoilerplateHostSql,
    "q_link_reciprocity" -> qLinkReciprocitySql,
    "q_extract_meta" -> qExtractMetaSql,
    "q_epoch_upsample" -> qEpochUpsampleSql,
    "q_mirror_hosts" -> qMirrorHostsSql,
    "q_host_lang_purity" -> qHostLangPuritySql,
  )
}
