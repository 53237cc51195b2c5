package graft.queries

import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators round 2: the C4 line-policy filter and the
  * incremental FUZZY dedup that extends the exact q_dedup_incremental
  * family to near-duplicates — the two cleaning channels a recurring
  * crawl pipeline runs on every new snapshot. Deterministic exact-integer
  * derivations throughout; each answers a DuckDB oracle bit-for-bit.
  */
object CleanQueries {

  import TextHash.{A, B, P}

  // ------------------------------------------------------- C4 line filter

  val C4MinLineWords = 5
  val C4PolicyPhrase = "please enable javascript to view this site"

  /** C4 LINE-POLICY FILTER (Raffel et al. '20 §2.2): per-LINE cleaning
    * rules — drop policy-phrase lines, lines under 5 words, and lines
    * without terminal punctuation — then reassemble each page from its
    * surviving lines. Attribution is first-failing in fixed order
    * (policy > too_short > no_terminal_punct), the same refusal
    * discipline as the document-level pipeline. The line corpus is
    * derived in-query (5 doc-lines per page; planted policy lines,
    * 3-word stubs, and punctuation-less lines) so both engines filter
    * identical bytes.
    *
    * Scale shape: every rule is a string builtin fused into the scan
    * projection (zero exchanges for the verdicts); the only shuffle is
    * the page-reassembly groupBy — keyed by the corpus's natural page
    * partitioning, carrying only surviving lines. */
  def qC4LineFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables.documents(spark, dir).select(
        floor($"doc_id" / 5).cast("long").as("page_id"),
        ($"doc_id" % 5).cast("int").as("idx"),
        expr(
          s"""concat(
             |  CASE WHEN doc_id % 17 = 0 THEN '$C4PolicyPhrase'
             |       WHEN doc_id % 11 = 0
             |       THEN array_join(slice(split(text, ' '), 1, 3), ' ')
             |       ELSE text END,
             |  CASE WHEN doc_id % 3 != 0 AND doc_id % 17 != 0 THEN '.' ELSE '' END
             |)""".stripMargin).as("line"))
      .withColumn("n_words", size(split($"line", " ")))
      .withColumn("reason", expr(
        s"""CASE
           |  WHEN contains(line, 'javascript') THEN 'policy'
           |  WHEN n_words < $C4MinLineWords THEN 'too_short'
           |  WHEN NOT (endswith(line, '.') OR endswith(line, '!')
           |            OR endswith(line, '?') OR endswith(line, '"'))
           |    THEN 'no_terminal_punct'
           |  ELSE NULL END""".stripMargin))
    lines.groupBy($"page_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when($"reason".isNull, 1)).as("n_kept"),
        count(when($"reason" === "policy", 1)).as("n_policy"),
        count(when($"reason" === "too_short", 1)).as("n_too_short"),
        count(when($"reason" === "no_terminal_punct", 1)).as("n_no_punct"),
        array_join(
          transform(
            array_sort(collect_list(when($"reason".isNull,
              struct($"idx", $"line")))),
            x => x("line")),
          "\n").as("clean_text"))
      .orderBy($"page_id")
  }

  val qC4LineFilterSql: String =
    s"""WITH lines AS (
       |  SELECT CAST(doc_id // 5 AS BIGINT) AS page_id,
       |    CAST(doc_id % 5 AS INT) AS idx,
       |    (CASE WHEN doc_id % 17 = 0 THEN '$C4PolicyPhrase'
       |          WHEN doc_id % 11 = 0
       |          THEN array_to_string(string_split(text, ' ')[1:3], ' ')
       |          ELSE text END)
       |    || (CASE WHEN doc_id % 3 != 0 AND doc_id % 17 != 0 THEN '.' ELSE '' END)
       |      AS line
       |  FROM documents),
       |flagged AS (
       |  SELECT page_id, idx, line,
       |    CASE
       |      WHEN contains(line, 'javascript') THEN 'policy'
       |      WHEN len(string_split(line, ' ')) < $C4MinLineWords THEN 'too_short'
       |      WHEN NOT (ends_with(line, '.') OR ends_with(line, '!')
       |                OR ends_with(line, '?') OR ends_with(line, '"'))
       |        THEN 'no_terminal_punct'
       |      ELSE NULL END AS reason
       |  FROM lines)
       |SELECT page_id, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(count(CASE WHEN reason IS NULL THEN 1 END) AS BIGINT) AS n_kept,
       |  CAST(count(CASE WHEN reason = 'policy' THEN 1 END) AS BIGINT) AS n_policy,
       |  CAST(count(CASE WHEN reason = 'too_short' THEN 1 END) AS BIGINT) AS n_too_short,
       |  CAST(count(CASE WHEN reason = 'no_terminal_punct' THEN 1 END) AS BIGINT) AS n_no_punct,
       |  coalesce(string_agg(CASE WHEN reason IS NULL THEN line END, chr(10)
       |    ORDER BY idx), '') AS clean_text
       |FROM flagged GROUP BY page_id
       |ORDER BY page_id""".stripMargin

  // ------------------------------------------- incremental fuzzy dedup

  /** Near-duplicate Jaccard gate (permille), matching the dedup family. */
  val FuzzyJacMin = 800L
  /** Near-dup batch docs only derive from pages long enough that the
    * planted tail stays above the gate. */
  val FuzzyNearMinChars = 200

  /** The new-crawl batch, derived in-query: exact recrawls (%10),
    * near-duplicate edits (%7 of long docs), and genuinely new pages
    * (%13, uppercased so no shingle survives). */
  private def fuzzyBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"text")
    d.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000000L).as("batch_id"), $"text")
      .unionAll(d.filter($"doc_id" % 7 === 0 && length($"text") >= FuzzyNearMinChars)
        .select(($"doc_id" + 2000000L).as("batch_id"),
          concat($"text", lit(" nearly duplicate tail")).as("text")))
      .unionAll(d.filter($"doc_id" % 13 === 0)
        .select(($"doc_id" + 3000000L).as("batch_id"), upper($"text").as("text")))
  }

  private val fuzzyBatchSql: String =
    s"""batch AS (
       |  SELECT doc_id + 1000000 AS batch_id, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL SELECT doc_id + 2000000, text || ' nearly duplicate tail'
       |    FROM documents WHERE doc_id % 7 = 0 AND length(text) >= $FuzzyNearMinChars
       |  UNION ALL SELECT doc_id + 3000000, upper(text)
       |    FROM documents WHERE doc_id % 13 = 0)""".stripMargin

  /** INCREMENTAL FUZZY DEDUP — the near-duplicate extension of
    * q_dedup_incremental (what a recurring crawl actually needs: FineWeb
    * dedups every new snapshot against all previous ones, and exact
    * digests miss every edited recrawl). Stage 1: exact — batch digests
    * against the history digest set (in production, the Bloom+semi-join
    * of q_dedup_incremental_sharded). Stage 2: fuzzy — the remaining
    * batch docs' MinHash band keys join the HISTORY BAND INDEX (a
    * materialized table in production, derived here), candidates verify
    * with exact shingle-set Jaccard, and matches ≥ 0.8 mark the doc a
    * near-duplicate of its best match (max Jaccard, min history doc on
    * ties). Verdict per batch doc: dup_exact | dup_near | new, with the
    * matched history doc and the verified Jaccard permille — evidence,
    * not just a bit, rvl-style.
    *
    * Scale shape: the exact stage shuffles only digests; the fuzzy stage
    * shuffles only (band, key, id) rows — the batch side is
    * snapshot-sized (small), so AQE broadcasts it against the history
    * index; shingle sets join back by id for candidates only; text never
    * enters any Exchange. */
  def qDedupIncrementalFuzzy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.documents(spark, dir).select($"doc_id", $"text")
    fuzzyVerdicts(spark, fuzzyBatch(spark, dir), hist)
  }

  /** The fuzzy-verdict TRANSFORM, factored so the streaming ingest can run
    * it per micro-batch (`streaming.StreamPipeline.fuzzyVerdictStream`
    * wires it through foreachBatch — the FineWeb-style per-snapshot dedup
    * IS a batch-grained job on each new crawl). `batch` must carry
    * (batch_id, text); `hist` (doc_id, text). */
  def fuzzyVerdicts(spark: SparkSession, batch: DataFrame, hist: DataFrame)
      : DataFrame = {
    import spark.implicits._
    // each input resolves against ITS OWN session's analyzer (foreachBatch
    // hands a micro-batch DF from a cloned session while the history DF
    // keeps the outer one) — register the native expressions on both
    graft.functions.GraftFunctions.ensureRegistered(batch.sparkSession)
    graft.functions.GraftFunctions.ensureRegistered(hist.sparkSession)

    // stage 1: exact content match (digest equality; min matching doc).
    // text collapses to its md5 IN THE SCAN PROJECTION on both sides —
    // the digest join shuffles (id, digest) rows only.
    val histDig = hist.select($"doc_id", md5($"text").as("dig"))
      .groupBy($"dig").agg(min($"doc_id").as("exact_doc"))
    val exact = batch.select($"batch_id", md5($"text").as("dig"))
      .join(histDig, Seq("dig"), "left")
      .select($"batch_id", $"exact_doc")

    // stage 2: fuzzy — band-key join against the history band index for
    // docs stage 1 missed, exact Jaccard verify on candidates. Text
    // collapses to its distinct shingle-hash SET in the scan projection;
    // every later join ships ids, band keys, or Long arrays — never text.
    // band_keys / jaccard_permille are the codegen'd native Expressions
    // (functions/Expressions.scala) — no boxed per-element conversion at
    // a UDF boundary on either the index or the verify side
    val histSets = hist.select($"doc_id",
      graft.functions.GraftFunctions.shingleSet(spark, $"text").as("hset"))
    val histIndex = histSets.select($"doc_id",
      posexplode(graft.functions.GraftFunctions.bandKeys(spark, $"hset"))
        .as(Seq("band", "bkey")))
    val pendSets = batch.select($"batch_id",
        graft.functions.GraftFunctions.shingleSet(spark, $"text").as("bset"))
      .join(exact.filter($"exact_doc".isNull).select($"batch_id"), "batch_id")
    val pendIndex = pendSets.select($"batch_id",
      posexplode(graft.functions.GraftFunctions.bandKeys(spark, $"bset"))
        .as(Seq("band", "bkey")))
    val cands = pendIndex.join(histIndex, Seq("band", "bkey"))
      .select($"batch_id", $"doc_id").distinct()
    val verified = cands
      .join(pendSets, "batch_id")
      .join(histSets.select($"doc_id", $"hset"), "doc_id")
      .select($"batch_id", $"doc_id",
        graft.functions.GraftFunctions
          .jaccardPermille(spark, $"bset", $"hset").as("jac"))
      .filter($"jac" >= FuzzyJacMin)
    // best match per batch doc: max jaccard, min history doc on ties —
    // struct max on (jac, -doc_id) keeps the rule a one-pass aggregate
    val best = verified.groupBy($"batch_id")
      .agg(max(struct($"jac", (-$"doc_id").as("negdoc"))).as("m"))
      .select($"batch_id", $"m.jac".as("near_jac"), (-$"m.negdoc").as("near_doc"))

    exact.join(best, Seq("batch_id"), "left")
      .select($"batch_id",
        expr(
          """CASE WHEN exact_doc IS NOT NULL THEN 'dup_exact'
            |     WHEN near_doc IS NOT NULL THEN 'dup_near'
            |     ELSE 'new' END""".stripMargin).as("verdict"),
        coalesce($"exact_doc", $"near_doc", lit(-1L)).as("matched_doc"),
        expr("CASE WHEN exact_doc IS NOT NULL THEN 1000 ELSE coalesce(near_jac, 0) END")
          .cast("long").as("jaccard_permille"))
      .orderBy($"batch_id")
  }

  val qDedupIncrementalFuzzySql: String = {
    val mins = (0 until TextHash.MinHashK)
      .map(j => s"CAST(min((${A(j)} * h0 + ${B(j)}) % $P) AS BIGINT) AS sig$j")
      .mkString(", ")
    val bandSelects = (side: String) => (0 until TextHash.MinHashK / 2)
      .map(bnd => s"SELECT id, $bnd AS band, sig${2 * bnd} * $P + sig${2 * bnd + 1} AS bkey FROM ${side}")
      .mkString("\n  UNION ALL ")
    s"""WITH $fuzzyBatchSql,
       |hd AS (SELECT md5(text) AS dig, min(doc_id) AS exact_doc
       |  FROM documents GROUP BY md5(text)),
       |b1 AS (SELECT b.batch_id, b.text, hd.exact_doc
       |  FROM batch b LEFT JOIN hd ON md5(b.text) = hd.dig),
       |pending AS (SELECT batch_id AS id, text FROM b1 WHERE exact_doc IS NULL),
       |hpos AS (SELECT doc_id AS id, text,
       |    unnest(range(1, length(text) - ${TextHash.ShingleW - 2})) AS i
       |  FROM documents),
       |hhsh AS (SELECT id, ${TextQueries.sqlShingleHash("text", "i")} AS h FROM hpos),
       |hsigs AS (SELECT id, $mins FROM (SELECT id, h % $P AS h0 FROM hhsh) GROUP BY id),
       |hband AS (
       |  ${bandSelects("hsigs")}),
       |bpos AS (SELECT id, text,
       |    unnest(range(1, length(text) - ${TextHash.ShingleW - 2})) AS i
       |  FROM pending),
       |bhsh AS (SELECT id, ${TextQueries.sqlShingleHash("text", "i")} AS h FROM bpos),
       |bsigs AS (SELECT id, $mins FROM (SELECT id, h % $P AS h0 FROM bhsh) GROUP BY id),
       |bband AS (
       |  ${bandSelects("bsigs")}),
       |cands AS (
       |  SELECT DISTINCT b.id AS batch_id, h.id AS doc_id
       |  FROM bband b JOIN hband h ON b.band = h.band AND b.bkey = h.bkey),
       |bsh AS (SELECT DISTINCT id, h FROM bhsh),
       |hsh AS (SELECT DISTINCT id, h FROM hhsh),
       |inter AS (
       |  SELECT c.batch_id, c.doc_id, count(*) AS n_inter
       |  FROM cands c
       |  JOIN bsh ON bsh.id = c.batch_id
       |  JOIN hsh ON hsh.id = c.doc_id AND hsh.h = bsh.h
       |  GROUP BY c.batch_id, c.doc_id),
       |bsz AS (SELECT id, count(*) AS n FROM bsh GROUP BY id),
       |hsz AS (SELECT id, count(*) AS n FROM hsh GROUP BY id),
       |verified AS (
       |  SELECT c.batch_id, c.doc_id,
       |    coalesce(i.n_inter, 0) * 1000 // (bz.n + hz.n - coalesce(i.n_inter, 0)) AS jac
       |  FROM cands c
       |  LEFT JOIN inter i ON i.batch_id = c.batch_id AND i.doc_id = c.doc_id
       |  JOIN bsz bz ON bz.id = c.batch_id
       |  JOIN hsz hz ON hz.id = c.doc_id),
       |best AS (
       |  SELECT batch_id, max(jac) AS near_jac,
       |    min(doc_id) FILTER (WHERE jac = mj) AS near_doc
       |  FROM (SELECT v.*, max(jac) OVER (PARTITION BY batch_id) AS mj
       |        FROM verified v WHERE jac >= $FuzzyJacMin)
       |  GROUP BY batch_id)
       |SELECT b1.batch_id,
       |  CASE WHEN b1.exact_doc IS NOT NULL THEN 'dup_exact'
       |       WHEN best.near_doc IS NOT NULL THEN 'dup_near'
       |       ELSE 'new' END AS verdict,
       |  coalesce(b1.exact_doc, best.near_doc, -1) AS matched_doc,
       |  CAST(CASE WHEN b1.exact_doc IS NOT NULL THEN 1000
       |       ELSE coalesce(best.near_jac, 0) END AS BIGINT) AS jaccard_permille
       |FROM b1 LEFT JOIN best ON best.batch_id = b1.batch_id
       |ORDER BY b1.batch_id""".stripMargin
  }

  // ------------------------------------------- temperature sampling mix

  /** Token budget the temperature mix allocates (a fixed recipe input). */
  val TempBudget = 500000L

  /** MULTILINGUAL TEMPERATURE SAMPLING (the CC-100/XLM-R/mT5 recipe,
    * Conneau '20 §3.1 with α = 0.5): per-language sampling shares
    * ∝ tokens^α, flattening the head so low-resource languages aren't
    * drowned. α = 0.5 keeps everything exact-integer: the weight is
    * isqrt(tokens) = floor(sqrt(tokens)) — bit-identical in both engines
    * because IEEE-754 sqrt is correctly rounded and token counts here are
    * far below 2^52, so the double sqrt of a perfect square is exact and
    * floor() can't straddle an integer boundary. Each language reports
    * its natural share, temperature share, allocated tokens out of the
    * fixed budget (floor division — the deployed allocator's rule), and
    * the resulting up/down-sampling factor in permille.
    *
    * Scale shape: ONE language-keyed rollup with map-side partials (the
    * per-doc token count is fused into the scan); everything after runs
    * on the ≤#languages-row table with a 1-row broadcast total — the
    * whole recipe costs one aggregation over the corpus. */
  def qMixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perLang = Tables.documents(spark, dir)
      .select($"lang", (size(split($"text", " "))).cast("long").as("toks"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("tokens"))
      .withColumn("temp_weight", floor(sqrt($"tokens")).cast("long"))
    val totals = perLang.agg(
      sum($"tokens").as("t_all"), sum($"temp_weight").as("w_all"))
    perLang.crossJoin(broadcast(totals))
      .select($"lang", $"n_docs", $"tokens", $"temp_weight",
        expr("tokens * 1000 DIV t_all").as("natural_permille"),
        expr("temp_weight * 1000 DIV w_all").as("temp_permille"),
        expr(s"($TempBudget * temp_weight) DIV w_all").as("alloc_tokens"),
        expr(s"(($TempBudget * temp_weight) DIV w_all) * 1000 DIV tokens")
          .as("upsample_permille"))
      .orderBy($"lang")
  }

  val qMixtureTemperatureSql: String =
    s"""WITH per_lang AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY lang),
       |weighted AS (
       |  SELECT lang, n_docs, tokens,
       |    CAST(floor(sqrt(tokens)) AS BIGINT) AS temp_weight
       |  FROM per_lang),
       |totals AS (SELECT CAST(sum(tokens) AS BIGINT) AS t_all,
       |                  CAST(sum(temp_weight) AS BIGINT) AS w_all FROM weighted)
       |SELECT lang, n_docs, tokens, temp_weight,
       |  tokens * 1000 // t_all AS natural_permille,
       |  temp_weight * 1000 // w_all AS temp_permille,
       |  ($TempBudget * temp_weight) // w_all AS alloc_tokens,
       |  (($TempBudget * temp_weight) // w_all) * 1000 // tokens AS upsample_permille
       |FROM weighted, totals
       |ORDER BY lang""".stripMargin

  // --------------------------------------------- wordpiece fertility

  /** Multi-char WordPiece vocabulary (plus all 26 single letters, which
    * guarantee greedy termination). A literal list, as a shipped
    * tokenizer's vocab is; grouped by length for the longest-match CASE. */
  val WpPieces: Seq[String] = Seq(
    "spark", "batch", "query", "value",
    "scan", "sort", "join", "part", "line", "hash", "fast", "data",
    "the", "key", "row", "big", "dup", "agg", "mer", "ter", "dow", "umn",
    "or", "er", "ge", "ba", "gr", "ha", "sl", "sm", "ta", "va", "co", "fi",
    "st", "wi", "ve", "cu", "qu", "lu")

  /** Longest-match step: the length of the longest vocab piece starting
    * at 1-based `pos` of `word` (0 when past the end; 1 otherwise —
    * single letters are always pieces). Pure scalar SQL, identical text
    * in Spark and DuckDB. */
  private def wpBestLen(word: String, pos: String): String = {
    val byLen = WpPieces.groupBy(_.length).toSeq.sortBy(-_._1)
    val cases = byLen.map { case (l, ps) =>
      val inList = ps.sorted.map(p => s"'$p'").mkString(", ")
      s"WHEN substr($word, $pos, $l) IN ($inList) THEN $l"
    }.mkString("\n      ")
    s"""CASE WHEN $pos > length($word) THEN 0
       |      $cases
       |      ELSE 1 END""".stripMargin
  }

  /** Greedy chain: p0=1, p_{i+1} = p_i + bestLen(p_i); a word of ≤ 8
    * letters tokenizes in ≤ 8 steps because single letters are pieces.
    * Emitted as chained SELECTs so the expression stays linear (one
    * let-bound step per level — the q_winnow lesson: never nest a
    * re-evaluating subtree). */
  private val WpSteps = 8

  /** WORDPIECE TOKENIZER APPLICATION + FERTILITY (Wu et al. '16 §4.1
    * greedy longest-match-first; fertility = pieces per word, THE
    * tokenizer-quality metric multilingual evals report). The corpus
    * collapses to its word DICTIONARY first (Sennrich '16 discipline —
    * the greedy chain runs once per DISTINCT word, never per token);
    * per-doc totals come from the (doc, word, tf) table joined against
    * the vocab-sized dictionary. Output per doc: word count, wordpiece
    * count, fertility in permille — every value an exact Long.
    *
    * Scale shape: one (doc_id, word)-keyed exchange for tf (map-side
    * partials), a vocab-sized dictionary aggregation OF it, the greedy
    * chain a pure scalar map over the dictionary (zero exchanges), and a
    * broadcast join-back. At 10^12 docs the dictionary is the only
    * wordpiece-side state and it's millions, not trillions. */
  def qWordpieceFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
    // probed and left alone: the dictionary aggregation and the join
    // probe read identical exchange subtrees, which ReuseExchange already
    // shares, and the (doc, word) partial agg barely reduces — both a
    // cache() and a scan-spread were measured SLOWER than this shape
    val tf = words.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    var dict = tf.groupBy($"word").agg(count(lit(1)).as("docs_with"))
      .withColumn("p0", lit(1)).withColumn("n0", lit(0))
    for (i <- 0 until WpSteps) {
      val step = wpBestLen("word", s"p$i")
      dict = dict
        .withColumn(s"l$i", expr(step))
        .withColumn(s"p${i + 1}", expr(s"p$i + l$i"))
        .withColumn(s"n${i + 1}", expr(s"n$i + CASE WHEN l$i > 0 THEN 1 ELSE 0 END"))
    }
    val pieces = dict.select($"word", col(s"n$WpSteps").cast("long").as("n_pieces"))
    tf.join(broadcast(pieces), "word")
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_words"),
        sum($"tf" * $"n_pieces").as("n_wordpieces"))
      .withColumn("fertility_permille",
        expr("n_wordpieces * 1000 DIV n_words"))
      .orderBy($"doc_id")
  }

  val qWordpieceFertilitySql: String = {
    val steps = (0 until WpSteps).map { i =>
      s"""s${i + 1} AS (SELECT word, p$i + bl AS p${i + 1}, n$i +
         |  CASE WHEN bl > 0 THEN 1 ELSE 0 END AS n${i + 1}
         |  FROM (SELECT word, p$i, n$i, ${wpBestLen("word", s"p$i")} AS bl FROM s$i))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       |  FROM words WHERE word != '' GROUP BY doc_id, word),
       |s0 AS (SELECT word, 1 AS p0, 0 AS n0 FROM (SELECT DISTINCT word FROM tf)),
       |$steps,
       |pieces AS (SELECT word, CAST(n$WpSteps AS BIGINT) AS n_pieces FROM s$WpSteps)
       |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_words,
       |  CAST(sum(tf.tf * p.n_pieces) AS BIGINT) AS n_wordpieces,
       |  CAST(sum(tf.tf * p.n_pieces) AS BIGINT) * 1000
       |    // CAST(sum(tf.tf) AS BIGINT) AS fertility_permille
       |FROM tf JOIN pieces p ON tf.word = p.word
       |GROUP BY tf.doc_id
       |ORDER BY tf.doc_id""".stripMargin
  }

  // ------------------------------------------------- duplicate n-gram chars

  /** Drop thresholds (‰ of non-space chars) for the duplicate-n-gram
    * fractions, n = 2/3/4 — Gopher table A1's 0.20/0.18/0.16. */
  val Dup2Permille = 200L
  val Dup3Permille = 180L
  val Dup4Permille = 160L

  /** DUPLICATE-N-GRAM CHARACTER FRACTION (Gopher §A1.1, Rae '21 table A1
    * — the repetition rule family q_repetition does NOT cover: that one
    * measures duplicate WORDS and top-word share; this one measures the
    * fraction of characters sitting in repeated word n-grams, the signal
    * that catches looping sentence fragments a word histogram misses).
    * Per doc and n ∈ {2,3,4}: every n-gram occurring c > 1 times
    * contributes (c−1)·chars(gram) duplicated characters (each repeat
    * beyond the first is "wasted text" — the standard open-source
    * reading of the rule, overlaps counted per occurrence), and
    * frac_n = dup_chars_n · 1000 / non-space chars. keep = 1 iff every
    * fraction is at or under its Gopher threshold.
    *
    * Scale shape (10^12 docs): gram expansion is a per-row lambda fused
    * into the scan (text never leaves its row); the (doc, n, gram) count
    * and the per-doc fold are BOTH keyed by doc_id, so map-side partial
    * aggs collapse each doc's grams inside its partition and the join
    * back to the doc row is co-keyed — no gram ever crosses the cluster
    * unkeyed, and no state outlives its doc. */
  def qDupNgrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .filter($"text".isNotNull && length($"text") > 0)
      .select($"doc_id", $"text")
      // the test corpus is one small parquet split, so without this the
      // whole gram expansion + partial agg serializes on ONE task (2.3 s
      // of the query's 2.8 s, measured via OneQuery); a user-specified
      // repartition is exempt from AQE coalescing. At production scale
      // the scan arrives already split and this exchange carries each
      // text exactly once — noise next to the gram volume it unlocks.
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"doc_id",
        split($"text", " ").as("ws"),
        length(regexp_replace($"text", " ", "")).cast("long").as("tot"))
    // one flattened (n, gram) expansion per row; sequence() is guarded by
    // CASE because sequence(1, 0) DESCENDS in Spark — an unguarded short
    // doc would fabricate grams
    val gramExpr = expr(
      """flatten(array(
        |  CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws)-1),
        |    i -> named_struct('n', 2, 'g', array_join(slice(ws, i, 2), ' ')))
        |    ELSE array() END,
        |  CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws)-2),
        |    i -> named_struct('n', 3, 'g', array_join(slice(ws, i, 3), ' ')))
        |    ELSE array() END,
        |  CASE WHEN size(ws) >= 4 THEN transform(sequence(1, size(ws)-3),
        |    i -> named_struct('n', 4, 'g', array_join(slice(ws, i, 4), ' ')))
        |    ELSE array() END))""".stripMargin)
    // one (doc, n, gram) count, then the per-doc pivot folded into a
    // SINGLE doc_id-keyed aggregate (conditional sums) — two exchanges
    // total, not three
    val perDoc = docs
      .select($"doc_id", explode(gramExpr).as("t"))
      .groupBy($"doc_id", $"t.n".as("n"), $"t.g".as("g"))
      .agg(count(lit(1)).as("c"))
      .filter($"c" > 1)
      .withColumn("dup_chars",
        ($"c" - 1) * length(regexp_replace($"g", " ", "")))
      .groupBy($"doc_id").agg(
        coalesce(sum(when($"n" === 2, $"dup_chars")), lit(0L)).as("dup2_chars"),
        coalesce(sum(when($"n" === 3, $"dup_chars")), lit(0L)).as("dup3_chars"),
        coalesce(sum(when($"n" === 4, $"dup_chars")), lit(0L)).as("dup4_chars"))
    docs.select($"doc_id", $"tot")
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup2_chars", "dup3_chars", "dup4_chars"))
      .withColumn("frac2_permille",
        expr("dup2_chars * 1000 DIV greatest(tot, 1)"))
      .withColumn("frac3_permille",
        expr("dup3_chars * 1000 DIV greatest(tot, 1)"))
      .withColumn("frac4_permille",
        expr("dup4_chars * 1000 DIV greatest(tot, 1)"))
      .withColumn("keep",
        ($"frac2_permille" <= Dup2Permille &&
          $"frac3_permille" <= Dup3Permille &&
          $"frac4_permille" <= Dup4Permille).cast("int").cast("long"))
      .select($"doc_id", $"tot", $"dup2_chars", $"dup3_chars", $"dup4_chars",
        $"frac2_permille", $"frac3_permille", $"frac4_permille", $"keep")
      .orderBy($"doc_id")
  }

  val qDupNgramsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS tot
       |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
       |g AS (
       |  SELECT doc_id, 2 AS n,
       |    unnest(CASE WHEN len(ws) >= 2 THEN
       |      list_transform(range(1, len(ws)),
       |        i -> array_to_string(ws[i:i+1], ' '))
       |      ELSE CAST([] AS VARCHAR[]) END) AS g
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id, 3,
       |    unnest(CASE WHEN len(ws) >= 3 THEN
       |      list_transform(range(1, len(ws)-1),
       |        i -> array_to_string(ws[i:i+2], ' '))
       |      ELSE CAST([] AS VARCHAR[]) END)
       |  FROM d
       |  UNION ALL
       |  SELECT doc_id, 4,
       |    unnest(CASE WHEN len(ws) >= 4 THEN
       |      list_transform(range(1, len(ws)-2),
       |        i -> array_to_string(ws[i:i+3], ' '))
       |      ELSE CAST([] AS VARCHAR[]) END)
       |  FROM d),
       |c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
       |p AS (
       |  SELECT doc_id,
       |    CAST(COALESCE(sum(CASE WHEN n = 2
       |      THEN (c-1) * length(replace(g, ' ', '')) END), 0) AS BIGINT)
       |      AS dup2_chars,
       |    CAST(COALESCE(sum(CASE WHEN n = 3
       |      THEN (c-1) * length(replace(g, ' ', '')) END), 0) AS BIGINT)
       |      AS dup3_chars,
       |    CAST(COALESCE(sum(CASE WHEN n = 4
       |      THEN (c-1) * length(replace(g, ' ', '')) END), 0) AS BIGINT)
       |      AS dup4_chars
       |  FROM c WHERE c > 1 GROUP BY doc_id)
       |SELECT d.doc_id, d.tot,
       |  COALESCE(p.dup2_chars, 0) AS dup2_chars,
       |  COALESCE(p.dup3_chars, 0) AS dup3_chars,
       |  COALESCE(p.dup4_chars, 0) AS dup4_chars,
       |  COALESCE(p.dup2_chars, 0) * 1000 // greatest(d.tot, 1)
       |    AS frac2_permille,
       |  COALESCE(p.dup3_chars, 0) * 1000 // greatest(d.tot, 1)
       |    AS frac3_permille,
       |  COALESCE(p.dup4_chars, 0) * 1000 // greatest(d.tot, 1)
       |    AS frac4_permille,
       |  CAST(CASE WHEN
       |      COALESCE(p.dup2_chars, 0) * 1000 // greatest(d.tot, 1)
       |        <= $Dup2Permille
       |      AND COALESCE(p.dup3_chars, 0) * 1000 // greatest(d.tot, 1)
       |        <= $Dup3Permille
       |      AND COALESCE(p.dup4_chars, 0) * 1000 // greatest(d.tot, 1)
       |        <= $Dup4Permille
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM d LEFT JOIN p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_c4_line_filter" -> qC4LineFilter,
    "q_dedup_incremental_fuzzy" -> qDedupIncrementalFuzzy,
    "q_mixture_temperature" -> qMixtureTemperature,
    "q_wordpiece_fertility" -> qWordpieceFertility,
    "q_dup_ngrams" -> qDupNgrams,
  )

  val oracleSql: Map[String, String] = Map(
    "q_c4_line_filter" -> qC4LineFilterSql,
    "q_dedup_incremental_fuzzy" -> qDedupIncrementalFuzzySql,
    "q_mixture_temperature" -> qMixtureTemperatureSql,
    "q_wordpiece_fertility" -> qWordpieceFertilitySql,
    "q_dup_ngrams" -> qDupNgramsSql,
  )
}
