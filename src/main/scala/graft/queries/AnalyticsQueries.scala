package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-analytics operators — the measurement channels a data-quality
  * team runs beside the filters themselves: readability scoring
  * (Flesch–Kincaid, a C4-era quality feature), word-association lift
  * (collocation mining, Manning & Schütze ch. 5), a dedup cluster-size
  * audit over the shared near-dup labels, and Cohen's kappa between two
  * independent heuristic labelers (the standard answer to "do our
  * filters even agree?"). Exact integer derivations throughout; every
  * query answers a DuckDB oracle bit-for-bit.
  */
object AnalyticsQueries {

  // ----------------------------------------------------------- readability

  /** Words per fixed sentence window. The synthetic corpus carries no
    * sentence punctuation, so sentences are fixed 12-word segments — the
    * standard fallback segmentation for punctuation-free text; the FK
    * formula is unchanged. */
  val SentenceW = 12

  /** FLESCH–KINCAID READABILITY (Kincaid '75; readability buckets are a
    * production quality-filter feature): words are whitespace tokens,
    * syllables are vowel groups ([aeiouy]+ runs — the classic
    * approximation), sentences are [[SentenceW]]-word windows. Grade
    * ×1000 in exact integer arithmetic:
    * fk_x1000 = 390·words/sentences + 11800·syllables/words − 15590
    * (each division a truncating integer div, so both engines agree
    * bit-for-bit), banded easy/standard/hard at grades 8 and 12.
    *
    * Scale shape: a pure scalar projection fused into the scan — the
    * counts are regexp_count/length chains inside whole-stage codegen,
    * zero exchanges beyond the final sort. */
  def qReadability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir).filter($"text".isNotNull)
        .select($"doc_id", $"text"))
      .select($"doc_id",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("n_words"),
        regexp_count($"text", lit("[aeiouyAEIOUY]+")).cast("long")
          .as("n_syllables"))
      .withColumn("n_sentences",
        expr(s"CAST(1 + (n_words - 1) DIV $SentenceW AS BIGINT)"))
      .withColumn("fk_x1000",
        expr("CAST(390 * n_words DIV n_sentences" +
          " + 11800 * n_syllables DIV n_words - 15590 AS BIGINT)"))
      .withColumn("band",
        when($"fk_x1000" < 8000L, "easy")
          .when($"fk_x1000" < 12000L, "standard")
          .otherwise("hard"))
      .orderBy($"doc_id")
  }

  val qReadabilitySql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
       |      AS n_words,
       |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
       |      AS n_syllables
       |  FROM documents WHERE text IS NOT NULL),
       |s AS (
       |  SELECT *, CAST(1 + (n_words - 1) // $SentenceW AS BIGINT)
       |      AS n_sentences
       |  FROM d),
       |f AS (
       |  SELECT *, CAST(390 * n_words // n_sentences
       |    + 11800 * n_syllables // n_words - 15590 AS BIGINT) AS fk_x1000
       |  FROM s)
       |SELECT doc_id, n_words, n_syllables, n_sentences, fk_x1000,
       |  CASE WHEN fk_x1000 < 8000 THEN 'easy'
       |       WHEN fk_x1000 < 12000 THEN 'standard'
       |       ELSE 'hard' END AS band
       |FROM f ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ word lift

  /** Association-mining vocabulary (fixed, the corpus's frequent terms —
    * a production run would take the top-k from a frequency pass). */
  val LiftVocab: Seq[String] = Seq("agg", "column", "hash", "key", "line",
    "merge", "order", "part", "scan", "sort", "value", "window")

  /** WORD-ASSOCIATION LIFT (collocation extraction, Manning & Schütze
    * ch. 5 — the PMI family with the log dropped so integers stay
    * exact): for every vocabulary pair (a < b), document-presence counts
    * n_a, n_b, n_ab and lift·1000 = n_ab·N·1000 / (n_a·n_b) — lift > 1
    * means the words attract, < 1 they repel. Presence is whole-word
    * (space-padded containment), so substrings never count.
    *
    * Scale shape: the presence table is docs × |vocab| rows of
    * (doc_id, word) — ids only, text never leaves the scan; the pair
    * rollup is a self-join ON doc_id whose output is vocab²-bounded
    * after its hash agg (map-side partials collapse it), and the
    * marginals are a vocab-sized broadcast. At 10^12 docs the only big
    * exchange is the presence table keyed by doc_id — the table's
    * natural key. */
  def qWordLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).filter($"text".isNotNull)
    val padded = concat(lit(" "), $"text", lit(" "))
    val present = docs.select($"doc_id", explode(array(
        LiftVocab.map(w =>
          when(padded.contains(s" $w "), lit(w)).otherwise(lit(null))): _*))
        .as("w"))
      .filter($"w".isNotNull)
    val totals = present.groupBy($"w").agg(count(lit(1)).as("n_w"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    present.as("x").join(present.as("y"), "doc_id")
      .filter($"x.w" < $"y.w")
      .groupBy($"x.w".as("a"), $"y.w".as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(totals.select($"w".as("a"), $"n_w".as("n_a"))), "a")
      .join(broadcast(totals.select($"w".as("b"), $"n_w".as("n_b"))), "b")
      .crossJoin(broadcast(nDocs))
      .select($"a", $"b", $"n_a", $"n_b", $"n_ab",
        expr("CAST(n_ab * n_docs * 1000 DIV (n_a * n_b) AS BIGINT)")
          .as("lift_permille"))
      .orderBy($"a", $"b")
  }

  val qWordLiftSql: String = {
    val vocab = LiftVocab.map(w => s"'$w'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, ' ' || text || ' ' AS padded
       |  FROM documents WHERE text IS NOT NULL),
       |present AS (
       |  SELECT doc_id, v.w
       |  FROM docs CROSS JOIN (SELECT unnest([$vocab]) AS w) v
       |  WHERE position(' ' || v.w || ' ' IN padded) > 0),
       |totals AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
       |  FROM present GROUP BY w),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs),
       |pairs AS (
       |  SELECT x.w AS a, y.w AS b, CAST(count(*) AS BIGINT) AS n_ab
       |  FROM present x JOIN present y ON x.doc_id = y.doc_id
       |  WHERE x.w < y.w GROUP BY x.w, y.w)
       |SELECT p.a, p.b, ta.n_w AS n_a, tb.n_w AS n_b, p.n_ab,
       |  p.n_ab * n.n_docs * 1000 // (ta.n_w * tb.n_w) AS lift_permille
       |FROM pairs p
       |JOIN totals ta ON ta.w = p.a
       |JOIN totals tb ON tb.w = p.b
       |CROSS JOIN n
       |ORDER BY p.a, p.b""".stripMargin
  }

  // ---------------------------------------------------- cluster-size audit

  /** DEDUP CLUSTER-SIZE AUDIT (the sanity table every dedup run prints:
    * how many clusters of each size, how much mass is in singletons vs
    * mega-clusters — a sudden mega-cluster means the similarity
    * threshold broke): sizes of the shared near-dup components, rolled
    * to (cluster_size, n_clusters, n_docs).
    *
    * Scale shape: runs OVER the memoized component labels (computed once
    * per session for the whole split-integrity family, round-5 reuse),
    * so this audit adds two hash aggs on an ids-only table — component
    * cardinality, then size histogram (tiny domain). */
  def qDedupClusterSizes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TextQueries.componentLabels(spark, dir)
      .groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
      .groupBy($"cluster_size").agg(count(lit(1)).as("n_clusters"))
      .select($"cluster_size", $"n_clusters",
        ($"cluster_size" * $"n_clusters").cast("long").as("n_docs"))
      .orderBy($"cluster_size")
  }

  val qDedupClusterSizesSql: String =
    s"""${TextQueries.ccCtePrefix},
       |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       |csz AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM comp GROUP BY comp)
       |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
       |FROM csz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  // -------------------------------------------------------- labeler kappa

  /** COHEN'S KAPPA between two independent heuristic labelers (Cohen
    * '60 — the agreement statistic quality teams report before trusting
    * a filter ensemble): labeler A is the Gopher word-count/word-length
    * rule (q_doc_quality's keep), labeler B a stopword-presence +
    * length rule. One row: the 2×2 confusion table, observed and chance
    * agreement (‰), and kappa·1000 = 1000·(po−pe)/(1−pe) carried out in
    * exact integer arithmetic over N² so both engines agree bit-for-bit
    * (both truncate integer division toward zero, negatives included).
    *
    * Scale shape: two scalar label maps fused into one scan, then a
    * single global aggregate (map-side partials → one row). */
  def qKappaLabelers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val labeled = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", $"n_chars",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("n_words"),
        length(regexp_replace($"text", " ", "")).cast("long").as("word_chars"),
        ($"text".contains(" the ") || $"text".startsWith("the "))
          .cast("int").as("has_the"))
      .withColumn("mwl", floor($"word_chars" * 100L / $"n_words"))
      .withColumn("a", ($"n_words" >= 25 && $"mwl" >= 200 && $"mwl" <= 1200)
        .cast("long"))
      .withColumn("b", ($"has_the" === 1 && $"n_chars" >= 120).cast("long"))
    labeled.agg(
        sum(when($"a" === 1 && $"b" === 1, 1L).otherwise(0L)).as("tp"),
        sum(when($"a" === 1 && $"b" === 0, 1L).otherwise(0L)).as("fp"),
        sum(when($"a" === 0 && $"b" === 1, 1L).otherwise(0L)).as("fn"),
        sum(when($"a" === 0 && $"b" === 0, 1L).otherwise(0L)).as("tn"))
      .withColumn("n", $"tp" + $"fp" + $"fn" + $"tn")
      .withColumn("pe_num",
        ($"tp" + $"fp") * ($"tp" + $"fn") + ($"fn" + $"tn") * ($"fp" + $"tn"))
      .select($"tp", $"fp", $"fn", $"tn",
        expr("CAST((tp + tn) * 1000 DIV n AS BIGINT)").as("po_permille"),
        expr("CAST(pe_num * 1000 DIV (n * n) AS BIGINT)").as("pe_permille"),
        expr("CAST(((tp + tn) * n - pe_num) * 1000" +
          " DIV (n * n - pe_num) AS BIGINT)").as("kappa_permille"))
  }

  val qKappaLabelersSql: String =
    s"""WITH labeled AS (
       |  SELECT
       |    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 25
       |          AND (length(replace(text, ' ', '')) * 100)
       |              // (length(text) - length(replace(text, ' ', '')) + 1)
       |              BETWEEN 200 AND 1200
       |         THEN 1 ELSE 0 END AS a,
       |    CASE WHEN (text LIKE '% the %' OR text LIKE 'the %')
       |          AND n_chars >= 120
       |         THEN 1 ELSE 0 END AS b
       |  FROM documents WHERE text IS NOT NULL),
       |c AS (
       |  SELECT
       |    CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM labeled),
       |k AS (
       |  SELECT *, tp + fp + fn + tn AS n,
       |    (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS pe_num
       |  FROM c)
       |SELECT tp, fp, fn, tn,
       |  (tp + tn) * 1000 // n AS po_permille,
       |  pe_num * 1000 // (n * n) AS pe_permille,
       |  ((tp + tn) * n - pe_num) * 1000 // (n * n - pe_num) AS kappa_permille
       |FROM k""".stripMargin

  // ----------------------------------------------------------- corpus drift

  /** Per-cell share swing (‰) above which a cell is flagged. */
  val DriftFlagPermille = 5L

  /** CORPUS DRIFT MONITOR (the ingestion-health dashboard every recurring
    * crawl runs: did this snapshot's language/source mix move against the
    * last one?): documents split into two deterministic epochs standing in
    * for consecutive crawl snapshots (doc_id parity), per-(lang, source)
    * cell document counts and corpus-share ‰ in each epoch, the signed
    * share delta, a per-cell drift flag, and the corpus-level total
    * variation distance tv_permille = Σ|Δ|/2 carried on every row. All
    * divisions land on non-negative integers, so both engines truncate
    * identically.
    *
    * Scale shape: one hash agg over the (lang, source) domain (map-side
    * partials collapse 10^12 rows to a vocab²-sized table), then window
    * sums OVER () on that tiny result — no second pass over the data. */
  def qCorpusDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(
        sum(when($"doc_id" % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"doc_id" % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("share_a_permille",
        expr("CAST(n_a * 1000 DIV sum(n_a) OVER () AS BIGINT)"))
      .withColumn("share_b_permille",
        expr("CAST(n_b * 1000 DIV sum(n_b) OVER () AS BIGINT)"))
      .withColumn("delta_permille",
        ($"share_a_permille" - $"share_b_permille").cast("long"))
      .withColumn("flagged",
        (abs($"delta_permille") >= DriftFlagPermille).cast("int").cast("long"))
      .withColumn("tv_permille",
        expr("CAST(sum(abs(delta_permille)) OVER () DIV 2 AS BIGINT)"))
      .select($"lang", $"source", $"n_a", $"n_b", $"share_a_permille",
        $"share_b_permille", $"delta_permille", $"flagged", $"tv_permille")
      .orderBy($"lang", $"source")
  }

  val qCorpusDriftSql: String =
    s"""WITH cells AS (
       |  SELECT lang, source,
       |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b
       |  FROM documents GROUP BY lang, source),
       |shares AS (
       |  SELECT *,
       |    CAST(n_a * 1000 // sum(n_a) OVER () AS BIGINT) AS share_a_permille,
       |    CAST(n_b * 1000 // sum(n_b) OVER () AS BIGINT) AS share_b_permille
       |  FROM cells),
       |d AS (
       |  SELECT *,
       |    CAST(share_a_permille - share_b_permille AS BIGINT)
       |      AS delta_permille
       |  FROM shares)
       |SELECT lang, source, n_a, n_b, share_a_permille, share_b_permille,
       |  delta_permille,
       |  CAST(CASE WHEN abs(delta_permille) >= $DriftFlagPermille
       |       THEN 1 ELSE 0 END AS BIGINT) AS flagged,
       |  CAST(sum(abs(delta_permille)) OVER () // 2 AS BIGINT) AS tv_permille
       |FROM d ORDER BY lang, source""".stripMargin

  // --------------------------------------------- host-normalized filtering

  /** Hosts in the synthetic web layout (doc_id % NumHosts). */
  val NormHosts = 50
  /** Global keep threshold on the quality score (‰). Sits at the corpus
    * median (scores here span 919–1000, median ≈987), so the global rule
    * actually discriminates — a slack threshold would make the
    * normalization comparison vacuous. */
  val GlobalKeepPermille = 985L
  /** Within-host percentile keep threshold (‰): keep the top 60%. */
  val NormKeepPermille = 400L

  /** HOST-NORMALIZED QUALITY FILTERING (the domain-debiasing step of
    * FineWeb-style curation: a single global threshold starves clean hosts
    * and over-admits boilerplate farms, so the keep decision is re-ranked
    * WITHIN each host): per doc, the mean-word-length quality score
    * (q_epoch_upsample's q_permille rule), its within-host percentile
    * rank·1000/host_size (ties broken by doc_id so both engines rank
    * identically), the global-threshold keep, the host-normalized keep,
    * and whether normalization flipped the decision.
    *
    * Scale shape: one scalar projection fused into the scan, then a
    * single window exchange partitioned by host — the corpus's natural
    * web-layout key, already salted/capped upstream (q_host_cap), so no
    * partition exceeds the host cap at any corpus size. */
  def qHostQualityNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"host").orderBy($"score", $"doc_id")
    Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id",
        concat(lit("h"), ($"doc_id" % NormHosts).cast("string")).as("host"),
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("n_words"),
        length(regexp_replace($"text", " ", "")).cast("long").as("word_chars"))
      .withColumn("mwl_x100",
        expr("CAST(word_chars * 100 DIV n_words AS BIGINT)"))
      .withColumn("score",
        greatest(lit(0L), lit(1000L) -
          abs($"mwl_x100" - HygieneQueries.IdealMwlX100)))
      .withColumn("host_rank", row_number().over(w).cast("long"))
      .withColumn("host_n", count(lit(1)).over(Window.partitionBy($"host")))
      .withColumn("pr_permille",
        expr("CAST(host_rank * 1000 DIV host_n AS BIGINT)"))
      .withColumn("global_keep",
        ($"score" >= GlobalKeepPermille).cast("int").cast("long"))
      .withColumn("norm_keep",
        ($"pr_permille" >= NormKeepPermille).cast("int").cast("long"))
      .withColumn("flipped",
        ($"global_keep" =!= $"norm_keep").cast("int").cast("long"))
      .select($"doc_id", $"host", $"score", $"host_rank", $"host_n",
        $"pr_permille", $"global_keep", $"norm_keep", $"flipped")
      .orderBy($"doc_id")
  }

  val qHostQualityNormSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'h' || CAST(doc_id % $NormHosts AS VARCHAR) AS host,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
       |      AS n_words,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS word_chars
       |  FROM documents WHERE text IS NOT NULL),
       |s AS (
       |  SELECT doc_id, host,
       |    greatest(0, 1000 - abs(word_chars * 100 // n_words
       |      - ${HygieneQueries.IdealMwlX100})) AS score
       |  FROM d),
       |r AS (
       |  SELECT *,
       |    CAST(row_number() OVER (PARTITION BY host ORDER BY score, doc_id)
       |      AS BIGINT) AS host_rank,
       |    CAST(count(*) OVER (PARTITION BY host) AS BIGINT) AS host_n
       |  FROM s)
       |SELECT doc_id, host, CAST(score AS BIGINT) AS score, host_rank,
       |  host_n,
       |  CAST(host_rank * 1000 // host_n AS BIGINT) AS pr_permille,
       |  CAST(CASE WHEN score >= $GlobalKeepPermille THEN 1 ELSE 0 END
       |    AS BIGINT) AS global_keep,
       |  CAST(CASE WHEN host_rank * 1000 // host_n >= $NormKeepPermille
       |       THEN 1 ELSE 0 END AS BIGINT) AS norm_keep,
       |  CAST(CASE WHEN (score >= $GlobalKeepPermille)
       |            <> (host_rank * 1000 // host_n >= $NormKeepPermille)
       |       THEN 1 ELSE 0 END AS BIGINT) AS flipped
       |FROM r ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ best-rep dedup election

  /** QUALITY-AWARE SURVIVOR ELECTION (the dedup policy question
    * canonical-min sidesteps: q_dedup_components keeps the LOWEST doc_id
    * per near-dup cluster, but a curation pipeline wants the BEST copy —
    * SemDeDup and FineWeb both note the kept-copy choice shifts
    * downstream quality): per near-dup component (the memoized CC
    * labels), the canonical-min survivor, the argmax-quality survivor
    * (mean-word-length score, ties broken toward the lower doc_id so the
    * election is total), and whether the quality election CHANGES the
    * kept copy.
    *
    * Scale shape: the labels table is ids-only; the score projection is
    * fused into the corpus scan; one doc_id-keyed join + one
    * comp-keyed agg (argmax via max(struct) — commutative, no window,
    * deterministic under any partitioning). */
  def qClusterBestRep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = TextQueries.dedupCorpus(spark, dir)
      .filter($"text".isNotNull)
      .select($"doc_id",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("nw"),
        length(regexp_replace($"text", " ", "")).cast("long").as("wc"))
      .withColumn("mwl", expr("wc * 100 DIV nw"))
      .withColumn("score",
        greatest(lit(0L), lit(1000L) -
          abs($"mwl" - HygieneQueries.IdealMwlX100)))
      .select($"doc_id", $"score")
    TextQueries.componentLabels(spark, dir)
      .join(scored, $"id" === $"doc_id")
      .groupBy($"comp")
      .agg(
        count(lit(1)).as("cluster_size"),
        min($"doc_id").as("canon_id"),
        max(struct($"score", (-$"doc_id").as("neg_id"))).as("b"))
      .select($"comp", $"cluster_size", $"canon_id",
        (-$"b.neg_id").cast("long").as("best_id"),
        $"b.score".cast("long").as("best_score"))
      .withColumn("changed",
        ($"best_id" =!= $"canon_id").cast("int").cast("long"))
      .orderBy($"comp")
  }

  val qClusterBestRepSql: String =
    s"""${TextQueries.ccCtePrefix},
       |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       |sc AS (
       |  SELECT doc_id,
       |    greatest(0, 1000 - abs(
       |      (length(replace(text, ' ', '')) * 100)
       |        // (length(text) - length(replace(text, ' ', '')) + 1)
       |      - ${HygieneQueries.IdealMwlX100})) AS score
       |  FROM corpus WHERE text IS NOT NULL),
       |j AS (SELECT c.comp, c.id, s.score FROM comp c
       |      JOIN sc s ON s.doc_id = c.id),
       |r AS (SELECT comp, id, score,
       |        row_number() OVER (PARTITION BY comp
       |          ORDER BY score DESC, id) AS rn
       |      FROM j),
       |agg AS (SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size,
       |          CAST(min(id) AS BIGINT) AS canon_id
       |        FROM j GROUP BY comp)
       |SELECT a.comp, a.cluster_size, a.canon_id,
       |  CAST(r.id AS BIGINT) AS best_id,
       |  CAST(r.score AS BIGINT) AS best_score,
       |  CAST(CASE WHEN r.id <> a.canon_id THEN 1 ELSE 0 END AS BIGINT)
       |    AS changed
       |FROM agg a JOIN r ON r.comp = a.comp AND r.rn = 1
       |ORDER BY a.comp""".stripMargin

  // ---------------------------------------------------- rule ablation table

  /** Mean-word-length band (×100) for the ablation table's mwl rule —
    * tighter than the kappa labeler's [200,1200] (which this corpus
    * never leaves, making the rule inert): the corpus spans ≈[369,531],
    * so [420,500] genuinely fires. */
  val MarginalMwlLo = 420L
  val MarginalMwlHi = 500L

  /** FILTER-RULE ABLATION TABLE (the "which rule is doing the work"
    * appendix every filtering paper publishes — Gopher table A2,
    * RefinedWeb's removal-rate accounting): the quality gate decomposed
    * into four named rules; per rule, how many docs fail it, how many
    * fail ONLY it (its marginal, = docs recovered if the rule were
    * dropped), and the corpus keep count with and without the rule.
    *
    * Scale shape: per-doc rule bits are one scan projection; the whole
    * table is ONE 1-row aggregate stacked into 4 rows — nothing but the
    * scan touches the data. */
  def qRuleMarginals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, dir)
      .filter($"text".isNotNull)
      .select($"doc_id", $"text", $"n_chars",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("nw"),
        length(regexp_replace($"text", " ", "")).cast("long").as("wc"))
      .withColumn("mwl", expr("wc * 100 DIV nw"))
      .select(
        ($"nw" < 25).cast("int").cast("long").as("f1"),
        ($"mwl" < MarginalMwlLo || $"mwl" > MarginalMwlHi)
          .cast("int").cast("long").as("f2"),
        (!($"text".contains(" the ") || $"text".startsWith("the ")))
          .cast("int").cast("long").as("f3"),
        ($"n_chars" < 120).cast("int").cast("long").as("f4"))
    perDoc.agg(
        sum($"f1").as("nf1"), sum($"f2").as("nf2"),
        sum($"f3").as("nf3"), sum($"f4").as("nf4"),
        sum(when($"f1" === 1L && $"f2" + $"f3" + $"f4" === 0L, 1L)
          .otherwise(0L)).as("nu1"),
        sum(when($"f2" === 1L && $"f1" + $"f3" + $"f4" === 0L, 1L)
          .otherwise(0L)).as("nu2"),
        sum(when($"f3" === 1L && $"f1" + $"f2" + $"f4" === 0L, 1L)
          .otherwise(0L)).as("nu3"),
        sum(when($"f4" === 1L && $"f1" + $"f2" + $"f3" === 0L, 1L)
          .otherwise(0L)).as("nu4"),
        sum(when($"f1" + $"f2" + $"f3" + $"f4" === 0L, 1L).otherwise(0L))
          .as("keep_now"))
      .selectExpr(
        """stack(4,
          |  'min_words', nf1, nu1,
          |  'mwl_band', nf2, nu2,
          |  'stopword', nf3, nu3,
          |  'min_chars', nf4, nu4) AS (rule, n_fail, n_unique_fail)
          |""".stripMargin,
        "keep_now")
      .withColumn("keep_if_dropped", $"keep_now" + $"n_unique_fail")
      .select($"rule", $"n_fail", $"n_unique_fail", $"keep_now",
        $"keep_if_dropped")
      .orderBy($"rule")
  }

  val qRuleMarginalsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, n_chars,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
       |      AS nw,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS wc
       |  FROM documents WHERE text IS NOT NULL),
       |f AS (
       |  SELECT
       |    CASE WHEN nw < 25 THEN 1 ELSE 0 END AS f1,
       |    CASE WHEN wc * 100 // nw < $MarginalMwlLo
       |           OR wc * 100 // nw > $MarginalMwlHi
       |      THEN 1 ELSE 0 END AS f2,
       |    CASE WHEN NOT (contains(text, ' the ') OR text LIKE 'the %')
       |      THEN 1 ELSE 0 END AS f3,
       |    CASE WHEN n_chars < 120 THEN 1 ELSE 0 END AS f4
       |  FROM d),
       |a AS (
       |  SELECT
       |    CAST(sum(f1) AS BIGINT) AS nf1, CAST(sum(f2) AS BIGINT) AS nf2,
       |    CAST(sum(f3) AS BIGINT) AS nf3, CAST(sum(f4) AS BIGINT) AS nf4,
       |    CAST(sum(CASE WHEN f1 = 1 AND f2 + f3 + f4 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nu1,
       |    CAST(sum(CASE WHEN f2 = 1 AND f1 + f3 + f4 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nu2,
       |    CAST(sum(CASE WHEN f3 = 1 AND f1 + f2 + f4 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nu3,
       |    CAST(sum(CASE WHEN f4 = 1 AND f1 + f2 + f3 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nu4,
       |    CAST(sum(CASE WHEN f1 + f2 + f3 + f4 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS keep_now
       |  FROM f)
       |SELECT rule, n_fail, n_unique_fail, keep_now,
       |  keep_now + n_unique_fail AS keep_if_dropped
       |FROM (
       |  SELECT 'min_words' AS rule, nf1 AS n_fail, nu1 AS n_unique_fail,
       |    keep_now FROM a
       |  UNION ALL SELECT 'mwl_band', nf2, nu2, keep_now FROM a
       |  UNION ALL SELECT 'stopword', nf3, nu3, keep_now FROM a
       |  UNION ALL SELECT 'min_chars', nf4, nu4, keep_now FROM a)
       |ORDER BY rule""".stripMargin

  // ----------------------------------------------------------- canary scan

  /** The planted canary needles: two planted on disjoint doc slices, one
    * never planted — its zero-hit row must still be REPORTED (an absent
    * row and a zero row are different claims in a contamination audit). */
  val Canaries: Seq[(String, String)] = Seq(
    ("c_alpha", "CANARY-ALPHA-7f3e"),
    ("c_bravo", "CANARY-BRAVO-92d1"),
    ("c_clean", "CANARY-CLEAN-0000"))

  /** CANARY-STRING CONTAMINATION SCAN (the BIG-bench canary-GUID
    * protocol: eval suites embed unique GUIDs so a training corpus can
    * be audited for leakage by substring scan): pages carry two planted
    * canaries on deterministic doc slices; per canary the audit reports
    * hit count and first/last contaminated doc — including the explicit
    * zero row for the never-planted canary.
    *
    * Scale shape: the canary list is a literal broadcast; the scan is
    * one pass with a nested-loop contains against the tiny list (the
    * same shape a real audit ships — needles ≪ corpus); the rollup is
    * canary-cardinality-sized. */
  def qCanaryScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = Tables.documents(spark, dir)
      .filter($"text".isNotNull)
      .select($"doc_id",
        when($"doc_id" % 53 === 5, concat($"text", lit(" " + Canaries(0)._2)))
          .when($"doc_id" % 101 === 17,
            concat($"text", lit(" " + Canaries(1)._2)))
          .otherwise($"text").as("text"))
    val canaries = spark.createDataFrame(Canaries).toDF("canary_id", "needle")
    val agg = pages
      .join(broadcast(canaries), $"text".contains($"needle"))
      .groupBy($"canary_id")
      .agg(count(lit(1)).as("n_hits"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
    canaries.select($"canary_id")
      .join(agg, Seq("canary_id"), "left")
      .select($"canary_id",
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        coalesce($"first_doc", lit(-1L)).as("first_doc"),
        coalesce($"last_doc", lit(-1L)).as("last_doc"))
      .orderBy($"canary_id")
  }

  val qCanaryScanSql: String = {
    val values = Canaries
      .map { case (id, s) => s"('$id', '$s')" }.mkString(", ")
    s"""WITH pages AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 53 = 5 THEN text || ' ${Canaries(0)._2}'
       |         WHEN doc_id % 101 = 17 THEN text || ' ${Canaries(1)._2}'
       |         ELSE text END AS text
       |  FROM documents WHERE text IS NOT NULL),
       |can AS (SELECT * FROM (VALUES $values) AS t(canary_id, needle)),
       |h AS (SELECT c.canary_id, p.doc_id
       |      FROM pages p JOIN can c ON contains(p.text, c.needle)),
       |a AS (SELECT canary_id, CAST(count(*) AS BIGINT) AS n_hits,
       |        CAST(min(doc_id) AS BIGINT) AS first_doc,
       |        CAST(max(doc_id) AS BIGINT) AS last_doc
       |      FROM h GROUP BY canary_id)
       |SELECT c.canary_id,
       |  COALESCE(a.n_hits, 0) AS n_hits,
       |  COALESCE(a.first_doc, -1) AS first_doc,
       |  COALESCE(a.last_doc, -1) AS last_doc
       |FROM can c LEFT JOIN a ON a.canary_id = c.canary_id
       |ORDER BY c.canary_id""".stripMargin
  }

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_readability" -> qReadability,
    "q_word_lift" -> qWordLift,
    "q_dedup_cluster_sizes" -> qDedupClusterSizes,
    "q_kappa_labelers" -> qKappaLabelers,
    "q_corpus_drift" -> qCorpusDrift,
    "q_host_quality_norm" -> qHostQualityNorm,
    "q_cluster_best_rep" -> qClusterBestRep,
    "q_rule_marginals" -> qRuleMarginals,
    "q_canary_scan" -> qCanaryScan,
  )

  val oracleSql: Map[String, String] = Map(
    "q_readability" -> qReadabilitySql,
    "q_word_lift" -> qWordLiftSql,
    "q_dedup_cluster_sizes" -> qDedupClusterSizesSql,
    "q_kappa_labelers" -> qKappaLabelersSql,
    "q_corpus_drift" -> qCorpusDriftSql,
    "q_host_quality_norm" -> qHostQualityNormSql,
    "q_cluster_best_rep" -> qClusterBestRepSql,
    "q_rule_marginals" -> qRuleMarginalsSql,
    "q_canary_scan" -> qCanaryScanSql,
  )
}
