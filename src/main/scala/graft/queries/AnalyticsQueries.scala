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
    Tables.documents(spark, dir).filter($"text".isNotNull)
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

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_readability" -> qReadability,
    "q_word_lift" -> qWordLift,
    "q_dedup_cluster_sizes" -> qDedupClusterSizes,
    "q_kappa_labelers" -> qKappaLabelers,
    "q_corpus_drift" -> qCorpusDrift,
    "q_host_quality_norm" -> qHostQualityNorm,
  )

  val oracleSql: Map[String, String] = Map(
    "q_readability" -> qReadabilitySql,
    "q_word_lift" -> qWordLiftSql,
    "q_dedup_cluster_sizes" -> qDedupClusterSizesSql,
    "q_kappa_labelers" -> qKappaLabelersSql,
    "q_corpus_drift" -> qCorpusDriftSql,
    "q_host_quality_norm" -> qHostQualityNormSql,
  )
}
