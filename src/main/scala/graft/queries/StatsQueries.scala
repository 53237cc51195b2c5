package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical aggregates with exact-arithmetic oracles: interpolated
  * percentiles on integral values (both engines interpolate linearly, so
  * halves are exactly representable) and moments derived from exact
  * integer power sums (variance/stddev computed the same way in both
  * engines from the same two BIGINTs — no float-order drift).
  */
object StatsQueries {

  /** Quartiles of l_quantity per return flag (integral doubles). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        min($"l_quantity").as("q_min"),
        max($"l_quantity").as("q_max"))
      .orderBy($"l_returnflag")
  }

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.5) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  min(l_quantity) AS q_min,
      |  max(l_quantity) AS q_max
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Mean/variance of order totals per status from exact integer power
    * sums (whole dollars keep the sum of squares inside int64). */
  def qStatsMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dollars = floor($"o_totalprice").cast("long")
    Tables.orders(spark, dir)
      .select($"o_orderstatus", dollars.as("d"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"d").as("sum_d"),
        sum($"d" * $"d").as("sumsq_d"))
      .withColumn("mean_x1000",
        floor($"sum_d" * 1000.0 / $"n").cast("long"))
      .withColumn("var_x1000",
        floor(($"sumsq_d" * 1000.0 / $"n") - ($"sum_d" * 1.0 / $"n") * ($"sum_d" * 1000.0 / $"n")).cast("long"))
      .orderBy($"o_orderstatus")
  }

  val qStatsMomentsSql: String =
    """SELECT o_orderstatus, n, sum_d, sumsq_d,
      |  CAST(floor(sum_d * 1000.0 / n) AS BIGINT) AS mean_x1000,
      |  CAST(floor((sumsq_d * 1000.0 / n) - (sum_d * 1.0 / n) * (sum_d * 1000.0 / n)) AS BIGINT) AS var_x1000
      |FROM (
      |  SELECT o_orderstatus, count(*) AS n,
      |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_d,
      |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT) * CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sumsq_d
      |  FROM orders GROUP BY o_orderstatus) t
      |ORDER BY o_orderstatus""".stripMargin

  // -------------------------------------------- stratified holdout (Hare)

  /** Holdout budget allocated across language strata. */
  val HoldoutBudget = 50L

  /** STRATIFIED HOLDOUT ALLOCATION, LARGEST-REMAINDER METHOD (building
    * an eval set proportional to the corpus mix: naive floor allocation
    * under-fills the budget, naive rounding over- or under-shoots — the
    * Hare-quota largest-remainder rule is the standard exact fix): per
    * lang stratum, the floor share n_i·H div N, the remainder
    * n_i·H mod N, and +1 seats to the K largest remainders (ties broken
    * on lang bytes) until exactly [[HoldoutBudget]] seats are placed.
    * Σ alloc = H by construction — the invariant the spec asserts.
    *
    * Scale shape: one lang-cardinality rollup (map-side partials over
    * the corpus); every window below it runs on the strata table —
    * vocab-sized, not corpus-sized. */
  def qHoldoutAlloc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("n_total", sum($"n_docs").over())
      .withColumn("base_alloc",
        expr(s"n_docs * $HoldoutBudget DIV n_total"))
      .withColumn("remainder",
        expr(s"n_docs * $HoldoutBudget % n_total"))
      .withColumn("rem_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"remainder".desc, $"lang")).cast("long"))
      .withColumn("seats_left",
        lit(HoldoutBudget) - sum($"base_alloc").over())
      .withColumn("extra",
        ($"rem_rank" <= $"seats_left").cast("int").cast("long"))
      .withColumn("alloc", $"base_alloc" + $"extra")
      .select($"lang", $"n_docs", $"base_alloc", $"remainder", $"extra",
        $"alloc")
      .orderBy($"lang")
  }

  val qHoldoutAllocSql: String =
    s"""WITH s AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY lang),
       |t AS (
       |  SELECT *, CAST(sum(n_docs) OVER () AS BIGINT) AS n_total FROM s),
       |b AS (
       |  SELECT lang, n_docs,
       |    n_docs * $HoldoutBudget // n_total AS base_alloc,
       |    n_docs * $HoldoutBudget % n_total AS remainder
       |  FROM t),
       |r AS (
       |  SELECT *,
       |    CAST(row_number() OVER (ORDER BY remainder DESC, lang)
       |      AS BIGINT) AS rem_rank,
       |    $HoldoutBudget - CAST(sum(base_alloc) OVER () AS BIGINT)
       |      AS seats_left
       |  FROM b)
       |SELECT lang, n_docs, base_alloc, remainder,
       |  CAST(CASE WHEN rem_rank <= seats_left THEN 1 ELSE 0 END AS BIGINT)
       |    AS extra,
       |  base_alloc +
       |    CAST(CASE WHEN rem_rank <= seats_left THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc
       |FROM r ORDER BY lang""".stripMargin

  // ------------------------------------------------------ holdout selection

  /** HOLDOUT ROW SELECTION (the second half of q_holdout_alloc: the
    * allocation says HOW MANY eval docs each stratum owes; this picks
    * WHICH — by content-hash rank within the stratum, so the selection
    * is reproducible from the data alone, independent of row order,
    * partitioning, and arrival time — the property a random() sample
    * can never give an auditor): per doc its md5 rank within its lang
    * (ties on doc_id), held out iff rank ≤ that stratum's
    * largest-remainder allocation. Σ holdout = budget, by construction
    * of the allocation it joins.
    *
    * Scale shape: the allocation is the strata-table computation from
    * q_holdout_alloc (vocab-sized); the rank is ONE lang-partitioned
    * window; the join back is lang-keyed broadcast. */
  def qHoldoutSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val alloc = qHoldoutAlloc(spark, dir).select($"lang", $"alloc")
    val ranked = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", md5($"text").as("h"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"lang").orderBy($"h", $"doc_id")).cast("long"))
    ranked.join(broadcast(alloc), Seq("lang"))
      .withColumn("holdout",
        ($"rank" <= $"alloc").cast("int").cast("long"))
      .select($"doc_id", $"lang", $"rank", $"alloc", $"holdout")
      .orderBy($"doc_id")
  }

  val qHoldoutSelectSql: String =
    s"""WITH s AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY lang),
       |t AS (
       |  SELECT *, CAST(sum(n_docs) OVER () AS BIGINT) AS n_total FROM s),
       |b AS (
       |  SELECT lang, n_docs,
       |    n_docs * $HoldoutBudget // n_total AS base_alloc,
       |    n_docs * $HoldoutBudget % n_total AS remainder
       |  FROM t),
       |r AS (
       |  SELECT *,
       |    CAST(row_number() OVER (ORDER BY remainder DESC, lang)
       |      AS BIGINT) AS rem_rank,
       |    $HoldoutBudget - CAST(sum(base_alloc) OVER () AS BIGINT)
       |      AS seats_left
       |  FROM b),
       |alloc AS (
       |  SELECT lang, base_alloc +
       |    CAST(CASE WHEN rem_rank <= seats_left THEN 1 ELSE 0 END
       |      AS BIGINT) AS alloc
       |  FROM r),
       |ranked AS (
       |  SELECT doc_id, lang,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(text), doc_id) AS BIGINT) AS rank
       |  FROM documents)
       |SELECT k.doc_id, k.lang, k.rank, a.alloc,
       |  CAST(CASE WHEN k.rank <= a.alloc THEN 1 ELSE 0 END AS BIGINT)
       |    AS holdout
       |FROM ranked k JOIN alloc a ON a.lang = k.lang
       |ORDER BY k.doc_id""".stripMargin

  // --------------------------------------------------- Heaps' curve audit

  /** Document-prefix checkpoints for the vocabulary-growth curve. */
  val HeapsPrefixes: Seq[Long] = Seq(50L, 100L, 200L, 400L)

  /** VOCABULARY GROWTH CURVE (Heaps/Herdan law audit — the corpus-health
    * check that catches template or machine-generated text: organic text
    * grows types ≈ K·tokensᵝ with β≈0.5–0.7, while a templated corpus's
    * curve flattens): cumulative token and TYPE counts at fixed
    * document-prefix checkpoints (prefix by doc_id — the corpus's
    * arrival order), with the type-token ratio ‰ per checkpoint.
    *
    * Both unigram types (which SATURATE on a small closed vocabulary —
    * the fixed-template fingerprint itself) and word-3-gram types (the
    * combinatoric channel that keeps growing on organic text) are
    * reported, so the flat-vs-growing comparison is inside one row.
    *
    * Scale shape: types-at-checkpoint needs NO distinct-expand — each
    * word/gram contributes at its FIRST document (one min per key, a
    * key-keyed rollup with map-side partials), then a vocab-sized
    * conditional count; token counts are a doc-level projection summed.
    * Three tiny 1-row aggregates cross-joined at the end. */
  def qHeapsCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Tables.spread: three explode+aggregate branches all do their
    // map-side partial aggregation inside the scan stage — one local
    // split means one task per branch without it. CACHED because the
    // three branches each re-evaluate the spread exchange otherwise
    // (measured 3.5 s vs 1.0 s un-spread). Harness clearCache() applies.
    val docs = Tables.spread(Tables.documents(spark, dir)
      .filter($"text".isNotNull)
      .select($"doc_id", $"text"))
      .cache()
    val firstSeen = docs
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(min($"doc_id").as("first_doc"))
    val gramFirstSeen = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        """CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws)-2),
          |  i -> array_join(slice(ws, i, 3), ' '))
          |ELSE array() END""".stripMargin)).as("g"))
      .groupBy($"g").agg(min($"doc_id").as("first_doc"))
    val typeCols = HeapsPrefixes.map(p =>
      count(when($"first_doc" < p, 1)).as(s"types_$p"))
    val typeCounts = firstSeen.agg(typeCols.head, typeCols.tail: _*)
    val gramCols = HeapsPrefixes.map(p =>
      count(when($"first_doc" < p, 1)).as(s"gtypes_$p"))
    val gramCounts = gramFirstSeen.agg(gramCols.head, gramCols.tail: _*)
    val tokenCols = HeapsPrefixes.map(p =>
      coalesce(sum(when($"doc_id" < p, $"nw")), lit(0L)).as(s"tokens_$p"))
    val tokenCounts = docs
      .select($"doc_id",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("nw"))
      .agg(tokenCols.head, tokenCols.tail: _*)
    val stacked = HeapsPrefixes.map(p =>
      s"'$p', tokens_$p, types_$p, gtypes_$p").mkString(", ")
    typeCounts.crossJoin(tokenCounts).crossJoin(gramCounts)
      .selectExpr(
        s"stack(${HeapsPrefixes.size}, $stacked) AS (prefix_docs, n_tokens, n_types, n_gram3_types)")
      .withColumn("prefix_docs", $"prefix_docs".cast("long"))
      .withColumn("ttr_permille",
        expr("n_types * 1000 DIV greatest(n_tokens, 1)"))
      .withColumn("gram3_ttr_permille",
        expr("n_gram3_types * 1000 DIV greatest(n_tokens, 1)"))
      .orderBy($"prefix_docs")
  }

  val qHeapsCurveSql: String = {
    val rows = HeapsPrefixes.map(p =>
      s"""SELECT CAST($p AS BIGINT) AS prefix_docs,
         |  (SELECT CAST(COALESCE(sum(length(text) -
         |       length(replace(text, ' ', '')) + 1), 0) AS BIGINT)
         |   FROM documents WHERE text IS NOT NULL AND doc_id < $p)
         |    AS n_tokens,
         |  (SELECT CAST(count(*) AS BIGINT) FROM
         |    (SELECT w, min(doc_id) AS first_doc FROM (
         |       SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |       FROM documents WHERE text IS NOT NULL) u
         |     WHERE length(w) > 0 GROUP BY w) f
         |   WHERE first_doc < $p) AS n_types,
         |  (SELECT CAST(count(*) AS BIGINT) FROM
         |    (SELECT g, min(doc_id) AS first_doc FROM (
         |       SELECT doc_id,
         |         unnest(CASE WHEN len(ws) >= 3 THEN
         |           list_transform(range(1, len(ws)-1),
         |             i -> array_to_string(ws[i:i+2], ' '))
         |           ELSE CAST([] AS VARCHAR[]) END) AS g
         |       FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |             FROM documents WHERE text IS NOT NULL) w0) ug
         |     GROUP BY g) fg
         |   WHERE first_doc < $p) AS n_gram3_types""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""SELECT prefix_docs, n_tokens, n_types, n_gram3_types,
       |  n_types * 1000 // greatest(n_tokens, 1) AS ttr_permille,
       |  n_gram3_types * 1000 // greatest(n_tokens, 1) AS gram3_ttr_permille
       |FROM ($rows)
       |ORDER BY prefix_docs""".stripMargin
  }

  // ------------------------------------------------ reproducibility manifest

  /** DATASET EXPORT MANIFEST (the reproducibility artifact a corpus
    * release ships: per shard, row/token counts, id range, and an
    * order-independent content digest so a consumer can verify the
    * export without re-reading the pipeline): per (lang, split) — the
    * same content-keyed split rule as q_split_assign — doc count, token
    * count, id range, and a BIT_XOR fold of each doc's 32-bit md5-prefix
    * digest. XOR is commutative/associative and overflow-free, so the
    * digest is deterministic under ANY partitioning and ANY row order —
    * the property a distributed manifest needs (an additive checksum
    * would overflow; a concatenated hash would depend on order).
    *
    * Scale shape: one scan projection (digest arithmetic fused), one
    * (lang, split)-keyed rollup with map-side partials. */
  def qExportManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def nib(pos: Int) =
      expr(s"locate(substr(md5(text), $pos, 1), '0123456789abcdef') - 1")
    val docs = Tables.documents(spark, dir)
      .filter($"text".isNotNull)
      .select($"doc_id", $"lang",
        (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
          .cast("long").as("nw"),
        (nib(1) * 16 + nib(2)).cast("long").as("bucket"),
        (0 until 8).map(k => nib(k + 1).cast("long") * (1L << (4 * (7 - k))))
          .reduce(_ + _).as("digest32"))
      .withColumn("split",
        when($"bucket" < 205, "train")
          .when($"bucket" < 230, "val")
          .otherwise("test"))
    docs.groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nw").as("n_tokens"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"),
        expr("bit_xor(digest32)").as("xor_digest"))
      .orderBy($"lang", $"split")
  }

  val qExportManifestSql: String = {
    def nib(pos: Int) =
      s"(strpos('0123456789abcdef', substr(md5(text), $pos, 1)) - 1)"
    val digest = (0 until 8)
      .map(k => s"${nib(k + 1)} * ${1L << (4 * (7 - k))}").mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
       |      AS nw,
       |    CAST(${nib(1)} * 16 + ${nib(2)} AS BIGINT) AS bucket,
       |    CAST($digest AS BIGINT) AS digest32
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT lang,
       |  CASE WHEN bucket < 205 THEN 'train'
       |       WHEN bucket < 230 THEN 'val'
       |       ELSE 'test' END AS split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(nw) AS BIGINT) AS n_tokens,
       |  CAST(min(doc_id) AS BIGINT) AS min_doc,
       |  CAST(max(doc_id) AS BIGINT) AS max_doc,
       |  CAST(bit_xor(digest32) AS BIGINT) AS xor_digest
       |FROM d GROUP BY lang, 2
       |ORDER BY lang, split""".stripMargin
  }

  // -------------------------------------------- robust length outlier gate

  /** MAD multiplier (×) for the outlier cut — the classic 3×MAD rule. */
  val MadK = 3L

  /** ROBUST LENGTH-OUTLIER GATE (median + median-absolute-deviation —
    * the outlier rule that, unlike mean/stddev, a few giant pages cannot
    * drag; the standard robust cut for "suspiciously long/short page"
    * in quality filtering): lower-median of doc lengths and of absolute
    * deviations, both computed EXACTLY from value-domain histograms (no
    * quantile interpolation, no per-value buffering), then per doc the
    * deviation and the |dev| > [[MadK]]·MAD flag. Every `doc_id % 97 =
    * 13` page's length is ×20 (the runaway-concatenation page the gate
    * exists to catch — ~1% of pages, far too few to drag either
    * histogram median, which is the robustness claim itself).
    *
    * Scale shape: doc length is domain-bounded (a length histogram has
    * ~10⁴ distinct values no matter how many documents), so BOTH medians
    * are a domain-sized rollup + a window over that tiny table — the
    * scale-exact alternative to percentile aggs that buffer values. The
    * two scalars broadcast back onto the scan. */
  def qLengthMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val lens = Tables.documents(spark, dir)
      .filter($"text".isNotNull)
      .select($"doc_id",
        (length($"text") *
          when($"doc_id" % 97 === 13, 20L).otherwise(1L))
          .cast("long").as("len"))
    // lower median by histogram: smallest value whose cumulative count
    // reaches rank (n+1) div 2
    def histMedian(df: DataFrame, col: String): DataFrame = {
      val h = df.groupBy(expr(col).as("v")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum($"c").over(
          Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", sum($"c").over())
      h.filter($"cum" >= expr("(n + 1) DIV 2"))
        .agg(min($"v").as("med"))
    }
    val med = histMedian(lens, "len")
    val withDev = lens.crossJoin(broadcast(med))
      .withColumn("dev", abs($"len" - $"med"))
    val mad = histMedian(withDev, "dev")
      .withColumnRenamed("med", "mad")
    withDev.crossJoin(broadcast(mad))
      .withColumn("outlier",
        ($"dev" > lit(MadK) * greatest($"mad", lit(1L)))
          .cast("int").cast("long"))
      .select($"doc_id", $"len", $"med", $"dev", $"mad", $"outlier")
      .orderBy($"doc_id")
  }

  val qLengthMadSql: String =
    s"""WITH l AS (
       |  SELECT doc_id,
       |    CAST(length(text) *
       |      CASE WHEN doc_id % 97 = 13 THEN 20 ELSE 1 END AS BIGINT) AS len
       |  FROM documents WHERE text IS NOT NULL),
       |h1 AS (SELECT len AS v, count(*) AS c FROM l GROUP BY len),
       |m1 AS (
       |  SELECT CAST(min(v) AS BIGINT) AS med FROM (
       |    SELECT v, sum(c) OVER (ORDER BY v) AS cum,
       |      sum(c) OVER () AS n
       |    FROM h1) t WHERE cum >= (n + 1) // 2),
       |d AS (SELECT doc_id, len, med, abs(len - med) AS dev
       |      FROM l CROSS JOIN m1),
       |h2 AS (SELECT dev AS v, count(*) AS c FROM d GROUP BY dev),
       |m2 AS (
       |  SELECT CAST(min(v) AS BIGINT) AS mad FROM (
       |    SELECT v, sum(c) OVER (ORDER BY v) AS cum,
       |      sum(c) OVER () AS n
       |    FROM h2) t WHERE cum >= (n + 1) // 2)
       |SELECT doc_id, len, med, CAST(dev AS BIGINT) AS dev, mad,
       |  CAST(CASE WHEN dev > $MadK * greatest(mad, 1) THEN 1 ELSE 0 END
       |    AS BIGINT) AS outlier
       |FROM d CROSS JOIN m2 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ n-gram novelty

  /** Keep threshold on per-doc novelty (‰ of 3-grams first seen there). */
  val NoveltyMinPermille = 100L

  /** PER-DOCUMENT N-GRAM NOVELTY (the arrival-order novelty score
    * curation uses to prioritize: a page whose 3-grams have ALL been
    * seen in earlier pages adds nothing even if no single page
    * duplicates it — the cross-doc complement of the within-doc
    * repetition rules): per doc, its distinct 3-gram count, how many of
    * those FIRST appear in this doc (min doc_id over the corpus), the
    * novelty ‰, and a keep flag at [[NoveltyMinPermille]].
    *
    * Scale shape: same first-seen discipline as q_heaps_curve — one
    * (gram → min doc) rollup (map-side partials), the per-doc distinct
    * gram sets rolled up doc-keyed, the two joined on the gram key; no
    * distinct-expand, no gram ever carried past its aggregates. */
  def qNgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread the single-split scan before the gram expansion, and CACHE
    // the distinct gram table: the first-seen aggregation and the join
    // probe both read it (each re-pays the split/slice/join chain per
    // gram without the cache). Harnesses clearCache() after each query.
    val grams = Tables.spread(Tables.documents(spark, dir)
        .filter($"text".isNotNull)
        .select($"doc_id", $"text"))
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        """CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws)-2),
          |  i -> array_join(slice(ws, i, 3), ' '))
          |ELSE array() END""".stripMargin)).as("g"))
      .distinct()
      .cache()
    val firstSeen = grams.groupBy($"g").agg(min($"doc_id").as("first_doc"))
    grams.join(firstSeen, Seq("g"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_permille",
        expr("n_novel * 1000 DIV greatest(n_grams, 1)"))
      .withColumn("keep",
        ($"novelty_permille" >= NoveltyMinPermille).cast("int").cast("long"))
      .select($"doc_id", $"n_grams", $"n_novel", $"novelty_permille", $"keep")
      .orderBy($"doc_id")
  }

  val qNgramNoveltySql: String =
    s"""WITH g AS (
       |  SELECT DISTINCT doc_id, g FROM (
       |    SELECT doc_id,
       |      unnest(CASE WHEN len(ws) >= 3 THEN
       |        list_transform(range(1, len(ws)-1),
       |          i -> array_to_string(ws[i:i+2], ' '))
       |        ELSE CAST([] AS VARCHAR[]) END) AS g
       |    FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |          FROM documents WHERE text IS NOT NULL) w) u),
       |f AS (SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc
       |      FROM g GROUP BY g)
       |SELECT g.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    * 1000 // greatest(count(*), 1) AS BIGINT) AS novelty_permille,
       |  CAST(CASE WHEN
       |      sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |        * 1000 // greatest(count(*), 1) >= $NoveltyMinPermille
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM g JOIN f ON f.g = g.g
       |GROUP BY g.doc_id
       |ORDER BY g.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_percentiles" -> qPercentiles,
    "q_ngram_novelty" -> qNgramNovelty,
    "q_stats_moments" -> qStatsMoments,
    "q_holdout_alloc" -> qHoldoutAlloc,
    "q_holdout_select" -> qHoldoutSelect,
    "q_heaps_curve" -> qHeapsCurve,
    "q_export_manifest" -> qExportManifest,
    "q_length_mad" -> qLengthMad)

  val oracleSql: Map[String, String] = Map(
    "q_percentiles" -> qPercentilesSql,
    "q_ngram_novelty" -> qNgramNoveltySql,
    "q_stats_moments" -> qStatsMomentsSql,
    "q_holdout_alloc" -> qHoldoutAllocSql,
    "q_holdout_select" -> qHoldoutSelectSql,
    "q_heaps_curve" -> qHeapsCurveSql,
    "q_export_manifest" -> qExportManifestSql,
    "q_length_mad" -> qLengthMadSql)
}
