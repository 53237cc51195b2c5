package graft.queries

import graft.functions.TextHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-corpus operators round 3 — the cleaning/enrichment channels this
  * extension session adds on top of the dedup + crawl-gating + cleaning
  * families: ftfy-style mojibake repair, anchor-text aggregation over the
  * link graph, an LSH band-parameter tuning sweep (precision/recall per
  * config against exact Jaccard — "measure, don't guess" applied to the
  * dedup index itself), checksum-gated PII scrubbing (Luhn), and
  * token-budgeted training-shard assembly. Exact integer derivations
  * throughout; every query answers a DuckDB oracle bit-for-bit.
  */
object WebQueries {

  import TextHash.{A, B, P}

  // --------------------------------------------------------- mojibake fix

  /** UTF-8-decoded-as-cp1252 repair table (the ftfy core case, Speer '19:
    * text was encoded UTF-8, decoded Windows-1252, and re-encoded — "é"
    * becomes "Ã©"). The mojibake form of each clean string is COMPUTED
    * (bytes-as-UTF-8 read back as cp1252), not hand-typed, so the table
    * can't drift; only clean chars whose UTF-8 bytes avoid cp1252's five
    * undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) are eligible. Longest
    * mojibake first so 3-byte sequences never half-match after a 2-byte
    * rule fires. */
  val MojiPairs: Seq[(String, String)] = {
    val clean = Seq("—", "’", "“", // — ’ “  (3-byte UTF-8)
      "é", "è", "ü", "ñ", "ï") // é è ü ñ ï (2-byte)
    clean.map(c => (new String(c.getBytes("UTF-8"), "windows-1252"), c))
  }

  /** The planted dirty suffix: the mojibake rendering of a clean phrase
    * that exercises every table entry at least once. */
  val MojiCleanSuffix = " Café — naïve ’n señor " +
    "über père “q"
  val MojiDirtySuffix: String =
    new String(MojiCleanSuffix.getBytes("UTF-8"), "windows-1252")

  /** SQL string literal with single quotes escaped. */
  private def lit1(s: String): String = "'" + s.replace("'", "''") + "'"

  /** MOJIBAKE REPAIR (ftfy's UTF-8/cp1252 fix, the #1 real-web encoding
    * defect): docs with doc_id % 3 == 0 get the dirty suffix planted;
    * repair applies the table longest-first via chained replace and
    * reports the per-doc fix count — computed per table entry as
    * (len(t) - len(replace(t, m, ''))) / len(m) on the ORIGINAL text
    * (entries are pairwise substring-free, so counts are independent).
    * Unplanted docs prove the no-op path: repaired == raw, n_fixes == 0.
    *
    * Scale shape: a pure scalar projection fused into the scan — zero
    * exchanges, zero UDFs (builtin replace/length chains stay inside
    * whole-stage codegen). At 10^12 docs this is the cheapest possible
    * operator class: cost is exactly one pass over the text bytes. */
  def qFixMojibake(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = "CASE WHEN doc_id % 3 = 0 THEN concat(text, " +
      lit1(MojiDirtySuffix) + ") ELSE text END"
    val fixed = MojiPairs.foldLeft("raw") { case (acc, (moji, clean)) =>
      s"replace($acc, ${lit1(moji)}, ${lit1(clean)})"
    }
    val counts = MojiPairs.map { case (moji, _) =>
      s"(length(raw) - length(replace(raw, ${lit1(moji)}, ''))) DIV ${moji.length}"
    }.mkString(" + ")
    // Tables.spread: ~2 string passes per repair-table entry per row is
    // the dominant cost; the single-split local scan would run them all
    // on one task
    Tables.spread(Tables.documents(spark, dir).select($"doc_id", $"text"))
      .select($"doc_id", expr(raw).as("raw"))
      .select($"doc_id", expr(fixed).as("repaired"),
        expr(s"CAST($counts AS BIGINT)").as("n_fixes"))
      .orderBy($"doc_id")
  }

  val qFixMojibakeSql: String = {
    val fixed = MojiPairs.foldLeft("raw") { case (acc, (moji, clean)) =>
      s"replace($acc, ${lit1(moji)}, ${lit1(clean)})"
    }
    val counts = MojiPairs.map { case (moji, _) =>
      s"(length(raw) - length(replace(raw, ${lit1(moji)}, ''))) // ${moji.length}"
    }.mkString(" + ")
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN text || ${lit1(MojiDirtySuffix)}
       |         ELSE text END AS raw
       |  FROM documents)
       |SELECT doc_id, $fixed AS repaired,
       |  CAST($counts AS BIGINT) AS n_fixes
       |FROM raw ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ anchor text agg

  /** Anchor vocabulary (fixed, as a production anchor-text rollup would
    * normalize to a token space). */
  val AnchorWords: Seq[String] = Seq("home", "login", "news", "shop",
    "blog", "docs", "help", "about", "search", "forum", "wiki", "press")

  /** ANCHOR-TEXT AGGREGATION (the link-enrichment table behind anchor-text
    * pretraining and link-spam scoring): per destination host, the top-3
    * anchor words by link count (ties broken by word — deterministic).
    * Links reuse q_link_graph's derivation contract (md5-nibble targets,
    * nibbles 1-6); the anchor word for link k comes from nibble pair
    * (6+2k-1, 6+2k) mod the 12-word vocabulary, so both engines roll up
    * byte-identical (dst, word) edges. Self-links dropped as in
    * q_link_graph.
    *
    * Scale shape: anchor extraction is a per-row map fused into the scan;
    * the rollup exchanges (dst, word, partial_count) — map-side partials
    * collapse to the host×vocab key space, never page-sized. The top-3 is
    * a window PARTITIONED BY dst over that compact rollup (bounded state
    * per key, no global sort); dst_total is an aggregate OVER the rollup
    * joined back on its own key. */
  def qAnchorText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = AnchorWords.size
    val vocab = AnchorWords.map(w => s"'$w'").mkString(", ")
    val links = Tables.documents(spark, dir).filter($"text".isNotNull)
      .select($"doc_id", md5($"text").as("hh"))
      .select(expr("'h' || CAST(doc_id % 20 AS STRING)").as("src"),
        explode(expr(
          s"""transform(sequence(1, 3), k -> struct(
             |  'h' || CAST(((locate(substr(hh, 2*k - 1, 1), '0123456789abcdef') - 1) * 16
             |             + (locate(substr(hh, 2*k, 1), '0123456789abcdef') - 1)) % 20
             |       AS STRING) AS dst,
             |  element_at(array($vocab),
             |    ((locate(substr(hh, 6 + 2*k - 1, 1), '0123456789abcdef') - 1) * 16
             |     + (locate(substr(hh, 6 + 2*k, 1), '0123456789abcdef') - 1)) % $n + 1)
             |    AS word))""".stripMargin)).as("l"))
      .select($"src", $"l.dst".as("dst"), $"l.word".as("word"))
      .filter($"src" =!= $"dst")
    val rollup = links.groupBy($"dst", $"word").agg(count(lit(1)).as("cnt"))
    val totals = rollup.groupBy($"dst").agg(sum($"cnt").as("dst_total"))
    val w = Window.partitionBy($"dst").orderBy($"cnt".desc, $"word".asc)
    rollup.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .join(totals, "dst")
      .select($"dst", $"rank".cast("int").as("rank"), $"word", $"cnt",
        $"dst_total")
      .orderBy($"dst", $"rank")
  }

  val qAnchorTextSql: String = {
    val n = AnchorWords.size
    val vocab = AnchorWords.map(w => s"'$w'").mkString(", ")
    s"""WITH raw AS (
       |  SELECT doc_id, md5(text) AS hh FROM documents WHERE text IS NOT NULL),
       |lnk0 AS (
       |  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS src,
       |    'h' || CAST(((strpos('0123456789abcdef', substr(hh, 2*k - 1, 1)) - 1) * 16
       |               + (strpos('0123456789abcdef', substr(hh, 2*k, 1)) - 1)) % 20
       |         AS VARCHAR) AS dst,
       |    ([$vocab])[
       |      ((strpos('0123456789abcdef', substr(hh, 6 + 2*k - 1, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substr(hh, 6 + 2*k, 1)) - 1)) % $n + 1]
       |      AS word
       |  FROM raw CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) ks),
       |lnk AS (SELECT dst, word FROM lnk0 WHERE src <> dst),
       |rollup AS (SELECT dst, word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM lnk GROUP BY dst, word),
       |totals AS (SELECT dst, CAST(sum(cnt) AS BIGINT) AS dst_total
       |  FROM rollup GROUP BY dst),
       |ranked AS (SELECT dst, word, cnt,
       |    CAST(row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, word ASC)
       |      AS INT) AS rank
       |  FROM rollup)
       |SELECT r.dst, r.rank, r.word, r.cnt, t.dst_total
       |FROM ranked r JOIN totals t ON t.dst = r.dst
       |WHERE r.rank <= 3
       |ORDER BY r.dst, r.rank""".stripMargin
  }

  // ------------------------------------------------------ LSH tuning sweep

  /** Rows-per-band configurations swept (bands = MinHashK / r). r=1 is
    * deliberately excluded: single-sig bands collide on ANY shared
    * minhash value, so the candidate set approaches all-pairs (measured
    * 24% of pairs at sf0.01, ~40M pairs / 320 s of exact-verify CPU at
    * sf0.1) — the sweep's job is to price configs, and a config whose
    * verification is quadratic is priced out before the sweep. */
  val TuneConfigs: Seq[Int] = Seq(2, 4, 8)
  /** Band-key fold modulus (keys stay < 1e15 so k*131 + sig never
    * overflows Int64 in either engine). */
  val TuneM = 1000000000000000L
  /** Exact-Jaccard truth gate, permille. */
  val TuneJacMin = 500L

  /** Tuning corpus: every 5th doc plus planted exact (%10) and near (%15)
    * duplicates — small enough that the pooled exact-verify oracle stays
    * cheap, dup-rich enough that recall differences show. */
  private def tuneCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id", $"text")
      .filter($"doc_id" % 5 === 0)
    d.unionAll(d.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
      .unionAll(d.filter($"doc_id" % 15 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"),
          concat($"text", lit(" nearly duplicate tail")).as("text")))
  }

  private val tuneCorpusSql: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL SELECT doc_id + 2000000, text || ' nearly duplicate tail'
      |    FROM documents WHERE doc_id % 15 = 0)""".stripMargin

  /** LSH BAND-TUNING SWEEP ("measure, don't guess" pointed at the dedup
    * index itself — the (bands, rows) choice IS the precision/recall
    * dial, Leskovec MMDS §3.4): for each rows-per-band r in {2,4,8}
    * over the 8-sig MinHash, generate banded candidates, then score the
    * POOLED candidate set (union across configs — one exact-Jaccard
    * verify pass, shared) and report per config: candidate count, true
    * pairs (Jaccard ≥ 0.5), precision and recall in exact permille.
    * Recall is pooled-relative (the standard IR practice when all-pairs
    * truth is infeasible); r=2's bands make the pool a superset of every
    * stricter config's candidates (an r=4/r=8 band match implies both
    * covered r=2 bands match).
    *
    * Scale shape: ONE shingle+signature pass per doc feeds all four
    * configs (the sweep adds band keys, not text passes); band keys fold
    * r sigs into one Long (k = (k·131 + sig) mod 1e15) so the self-join
    * shuffles (cfg, band, key, id) longs only; the verify joins compact
    * sorted hash arrays back by id for POOLED candidates once, not per
    * config. Text never enters an Exchange. */
  def qLshTuning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigUdf = udf((t: String) => TextHash.minhash(t))
    val bandUdf = udf((sig: Array[Long], r: Int) => {
      val nBands = sig.length / r
      Array.tabulate(nBands) { b =>
        var k = 0L
        var j = 0
        while (j < r) { k = (k * 131L + sig(b * r + j)) % TuneM; j += 1 }
        k
      }
    })
    // shingle_set is the codegen'd native expression (byte-level ASCII
    // fast path, bit-identical to TextHash.shingleSet)
    val base = tuneCorpus(spark, dir)
      .select($"doc_id", sigUdf($"text").as("sig"),
        graft.functions.GraftFunctions.shingleSet(spark, $"text").as("hset"))
    base.persist()
    val banded = TuneConfigs.map { r =>
      base.select(lit(r).as("rows_per_band"), $"doc_id",
        posexplode(bandUdf($"sig", lit(r))).as(Seq("band", "bkey")))
    }.reduce(_ unionAll _)
    val cands = banded.as("x")
      .join(banded.as("y"), Seq("rows_per_band", "band", "bkey"))
      .filter($"x.doc_id" < $"y.doc_id")
      .select($"rows_per_band", $"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .distinct()
    // The pool's shuffle BYTES are tiny (ids only) but the per-pair
    // exact-Jaccard kernel is CPU-heavy, so AQE coalesces the verify to 2
    // tasks and serializes seconds of CPU (measured, OneQuery). A
    // user-specified repartition is exempt from AQE coalescing and
    // spreads the verify across the machine. jaccard_permille is the
    // codegen'd native expression — no boxed array conversion per pair.
    val pool = cands.select($"a", $"b").distinct()
      .repartition(spark.sparkContext.defaultParallelism)
    val verdicts = pool
      .join(base.select($"doc_id".as("a"), $"hset".as("sa")), "a")
      .join(base.select($"doc_id".as("b"), $"hset".as("sb")), "b")
      .select($"a", $"b",
        (graft.functions.GraftFunctions.jaccardPermille(spark, $"sa", $"sb")
          >= TuneJacMin).as("is_true"))
    val totalTrue = verdicts.agg(
      sum(when($"is_true", 1L).otherwise(0L)).as("total_true"))
    cands.join(verdicts, Seq("a", "b"))
      .groupBy($"rows_per_band")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when($"is_true", 1L).otherwise(0L)).as("n_true"))
      .crossJoin(broadcast(totalTrue))
      .select($"rows_per_band",
        expr(s"CAST(${TextHash.MinHashK} DIV rows_per_band AS INT)").as("n_bands"),
        $"n_candidates", $"n_true",
        expr("CASE WHEN n_candidates > 0 THEN n_true * 1000 DIV n_candidates ELSE 0 END")
          .as("precision_permille"),
        expr("CASE WHEN total_true > 0 THEN n_true * 1000 DIV total_true ELSE 0 END")
          .as("recall_permille"))
      .orderBy($"rows_per_band")
  }

  val qLshTuningSql: String = {
    val mins = (0 until TextHash.MinHashK)
      .map(j => s"CAST(min((${A(j)} * h0 + ${B(j)}) % $P) AS BIGINT) AS sig$j")
      .mkString(", ")
    // fold r sigs into one key, identical arithmetic to the Spark UDF
    def fold(r: Int, b: Int): String =
      (0 until r).foldLeft("0") { (acc, j) =>
        s"(($acc * 131 + sig${b * r + j}) % $TuneM)"
      }
    val bandSelects = TuneConfigs.flatMap { r =>
      (0 until TextHash.MinHashK / r).map { b =>
        s"SELECT doc_id, $r AS rows_per_band, $b AS band, ${fold(r, b)} AS bkey FROM sigs"
      }
    }.mkString("\n  UNION ALL ")
    s"""WITH $tuneCorpusSql,
       |pos AS (SELECT doc_id, text,
       |    unnest(range(1, length(text) - ${TextHash.ShingleW - 2})) AS i
       |  FROM corpus),
       |hsh AS (SELECT doc_id, ${TextQueries.sqlShingleHash("text", "i")} AS h FROM pos),
       |sigs AS (SELECT doc_id, $mins
       |  FROM (SELECT doc_id, h % $P AS h0 FROM hsh) GROUP BY doc_id),
       |banded AS (
       |  $bandSelects),
       |cands AS (
       |  SELECT DISTINCT x.rows_per_band, x.doc_id AS a, y.doc_id AS b
       |  FROM banded x JOIN banded y
       |    ON x.rows_per_band = y.rows_per_band
       |   AND x.band = y.band AND x.bkey = y.bkey
       |  WHERE x.doc_id < y.doc_id),
       |pool AS (SELECT DISTINCT a, b FROM cands),
       |sets AS (SELECT DISTINCT doc_id, h FROM hsh),
       |sz AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
       |inter AS (
       |  SELECT p.a, p.b, count(*) AS n_inter
       |  FROM pool p
       |  JOIN sets sa ON sa.doc_id = p.a
       |  JOIN sets sb ON sb.doc_id = p.b AND sb.h = sa.h
       |  GROUP BY p.a, p.b),
       |verdicts AS (
       |  SELECT p.a, p.b,
       |    (coalesce(i.n_inter, 0) * 1000
       |       // (za.n + zb.n - coalesce(i.n_inter, 0))) >= $TuneJacMin AS is_true
       |  FROM pool p
       |  LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
       |  JOIN sz za ON za.doc_id = p.a
       |  JOIN sz zb ON zb.doc_id = p.b),
       |tt AS (SELECT CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
       |    AS total_true FROM verdicts),
       |per AS (
       |  SELECT c.rows_per_band,
       |    CAST(count(*) AS BIGINT) AS n_candidates,
       |    CAST(sum(CASE WHEN v.is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true
       |  FROM cands c JOIN verdicts v ON v.a = c.a AND v.b = c.b
       |  GROUP BY c.rows_per_band)
       |SELECT rows_per_band,
       |  CAST(${TextHash.MinHashK} // rows_per_band AS INT) AS n_bands,
       |  n_candidates, n_true,
       |  CASE WHEN n_candidates > 0 THEN n_true * 1000 // n_candidates ELSE 0 END
       |    AS precision_permille,
       |  CASE WHEN total_true > 0 THEN n_true * 1000 // total_true ELSE 0 END
       |    AS recall_permille
       |FROM per, tt
       |ORDER BY rows_per_band""".stripMargin
  }

  // ------------------------------------------------------ Luhn card scrub

  /** Per-position digit multipliers for the synthetic 16-digit numbers
    * (distinct odd/even mix so validity varies across doc_ids). */
  val LuhnMult: Seq[Int] = Seq(3, 7, 1, 9, 2, 8, 4, 6, 5, 3, 7, 1, 9, 2, 8, 4)

  /** Shared dialect-neutral SQL for the planted number and its Luhn
    * validity: digit i = (doc_id * m_i + i) % 10; doubled positions are
    * the odd i (counting from the left of a 16-digit number = every
    * second from the right), doubled digits ≥ 10 subtract 9. Pure
    * integer scalar text accepted verbatim by Spark SQL and DuckDB. */
  private val luhnNumExpr: String =
    LuhnMult.zipWithIndex.map { case (m, i0) =>
      s"CAST((doc_id * $m + ${i0 + 1}) % 10 AS STRING)"
    }.mkString("concat(", ", ", ")")

  private val luhnSumExpr: String =
    LuhnMult.zipWithIndex.map { case (m, i0) =>
      val i = i0 + 1
      val d = s"((doc_id * $m + $i) % 10)"
      if (i % 2 == 1) s"(2 * $d - CASE WHEN $d >= 5 THEN 9 ELSE 0 END)"
      else d
    }.mkString(" + ")

  /** LUHN-GATED CARD SCRUB (checksum-validated PII redaction — the
    * production discipline that separates a card number from 16 random
    * digits and keeps the scrubber's false-positive rate near zero):
    * every doc gets a planted 16-digit number derived from doc_id; only
    * numbers passing the Luhn check (ISO/IEC 7812) are redacted to
    * [CARD]; invalid numbers pass through untouched, proving the gate
    * actually gates. Output carries the validity bit as evidence.
    *
    * Scale shape: like q_fix_mojibake, a pure scalar projection — the
    * checksum is a fixed 16-term integer expression inside whole-stage
    * codegen, zero exchanges, zero UDFs. */
  def qScrubLuhn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        expr(s"concat(text, ' pay ', $luhnNumExpr, ' now')").as("planted"),
        expr(s"CASE WHEN ($luhnSumExpr) % 10 = 0 THEN 1 ELSE 0 END")
          .as("luhn_valid"))
      .select($"doc_id", $"luhn_valid",
        expr(s"CASE WHEN luhn_valid = 1 THEN replace(planted, $luhnNumExpr, '[CARD]') ELSE planted END")
          .as("scrubbed"))
      .orderBy($"doc_id")
  }

  val qScrubLuhnSql: String =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' pay ' || $luhnNumExpr || ' now' AS planted,
       |    CASE WHEN ($luhnSumExpr) % 10 = 0 THEN 1 ELSE 0 END AS luhn_valid
       |  FROM documents)
       |SELECT doc_id, luhn_valid,
       |  CASE WHEN luhn_valid = 1 THEN replace(planted, $luhnNumExpr, '[CARD]')
       |       ELSE planted END AS scrubbed
       |FROM p ORDER BY doc_id""".stripMargin

  // --------------------------------------------------- shard assembly

  /** Token budget per output shard. */
  val ShardBudget = 2000L
  /** Minimum doc length (chars) for shard inclusion — the kept-docs gate. */
  val ShardMinChars = 120L

  /** TRAINING-SHARD ASSEMBLY (the last mile of every corpus pipeline:
    * kept docs are packed into fixed-token-budget output shards, in a
    * deterministic (lang, doc_id) order so re-runs produce byte-identical
    * shards): shard id = floor(tokens-before-this-doc / budget) within
    * the language — the standard running-sum packing rule (a doc that
    * crosses the boundary belongs to the shard it started in). Output is
    * the per-shard manifest: doc count, token count, id range — exactly
    * what the downstream trainer's data loader indexes.
    *
    * Scale shape: the running sum is a window PARTITIONED BY lang ordered
    * by doc_id — per-partition sequential state, no global sort; at
    * 10^12 docs the production variant adds warc_bucket to the partition
    * key (shards are per-(lang, bucket)), which this plan's shape already
    * is — lang here stands for the bounded partition key. The manifest
    * rollup reuses the window's partitioning (lang, shard), so AQE
    * plans it shuffle-free on the window's output. */
  def qShardAssembly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kept = Tables.documents(spark, dir)
      .filter($"n_chars" >= ShardMinChars)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("toks"))
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    kept.withColumn("before", coalesce(sum($"toks").over(w), lit(0L)))
      .withColumn("shard", expr(s"before DIV $ShardBudget"))
      .groupBy($"lang", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"shard")
  }

  val qShardAssemblySql: String =
    s"""WITH kept AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |  FROM documents WHERE n_chars >= $ShardMinChars),
       |packed AS (
       |  SELECT doc_id, lang, toks,
       |    CAST(coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      // $ShardBudget AS shard
       |  FROM kept)
       |SELECT lang, shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(toks) AS BIGINT) AS tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM packed GROUP BY lang, shard
       |ORDER BY lang, shard""".stripMargin

  // ------------------------------------------------- passage chunking

  /** Chunk window (tokens) and stride — stride < window gives the overlap
    * retrieval corpora keep so no passage boundary loses context. */
  val ChunkWinTok = 64
  val ChunkStride = 48

  /** PASSAGE CHUNKING (the retrieval-corpus counterpart of sequence
    * packing: every RAG/embedding pipeline slices documents into
    * fixed-token windows with overlap): chunk k of a doc covers tokens
    * [k·stride, k·stride + window), emitted while k·stride < n_tokens —
    * the last chunk may be short, and consecutive chunks overlap by
    * window − stride tokens. Output per chunk: token span, token count,
    * and the chunk digest (the id an embedding index would key on).
    * WebSpec proves reassembly: stride-prefixes concatenated reproduce
    * every document byte-exactly.
    *
    * Scale shape: the token array, the chunk-count sequence, and the
    * slice/join all fuse into the scan projection around one Generate
    * (explode) — no shuffle until the output sort; chunk rows carry
    * digests + offsets, never the original doc. At 10^12 docs this is
    * the embarrassingly-parallel map it should be. */
  def qChunkPassages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Tables.spread: the chunk slicing + per-chunk md5 fuse into the scan
    // stage, which is one local split without it
    Tables.spread(Tables.documents(spark, dir).select($"doc_id", $"text"))
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks", size($"toks").as("n_toks"))
      .select($"doc_id", $"n_toks", $"toks",
        explode(expr(s"sequence(0, (n_toks - 1) DIV $ChunkStride)")).as("chunk_id"))
      .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
        ($"chunk_id" * ChunkStride).cast("long").as("start_tok"),
        expr(s"slice(toks, chunk_id * $ChunkStride + 1, $ChunkWinTok)").as("ctoks"))
      .select($"doc_id", $"chunk_id", $"start_tok",
        size($"ctoks").cast("long").as("n_chunk_toks"),
        md5(array_join($"ctoks", " ")).as("chunk_digest"))
      .orderBy($"doc_id", $"chunk_id")
  }

  val qChunkPassagesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    len(string_split(text, ' ')) AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_toks, toks,
       |    unnest(range(0, (n_toks - 1) // $ChunkStride + 1)) AS chunk_id
       |  FROM t),
       |s AS (
       |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |    CAST(chunk_id * $ChunkStride AS BIGINT) AS start_tok,
       |    toks[(chunk_id * $ChunkStride + 1):(chunk_id * $ChunkStride + $ChunkWinTok)]
       |      AS ctoks
       |  FROM c)
       |SELECT doc_id, chunk_id, start_tok,
       |  CAST(len(ctoks) AS BIGINT) AS n_chunk_toks,
       |  md5(array_to_string(ctoks, ' ')) AS chunk_digest
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  // ------------------------------------------------- langid confusion

  /** Language space (matches the documents table's lang column). */
  val ConfLangs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** LANGUAGE-ID CONFUSION MATRIX (the CCNet/fastText deployment check:
    * re-identify every page's language and cross-tabulate against the
    * declared label — off-diagonal mass is the mislabel channel quality
    * filters must budget for): each doc gets a deterministic marker plant
    * — its OWN language's marker, except every 9th doc which gets the
    * next language's marker in a fixed cycle (the planted mislabels). The
    * guesser counts marker hits per language via replace-arithmetic and
    * takes the argmax (count·8 + langIdx encoded into one greatest() so
    * ties break deterministically). Output is the (declared, guessed)
    * matrix with counts.
    *
    * Scale shape: marker counting and the argmax are scalar expressions
    * fused into the scan; the rollup exchange is langs²-sized with
    * map-side partials — the cheapest possible confusion matrix at
    * 10^12 docs. */
  def qLangidConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cyc = ConfLangs.zipWithIndex.map { case (l, i) =>
      s"WHEN lang = '$l' THEN '${ConfLangs((i + 1) % ConfLangs.size)}'"
    }.mkString(" ")
    val planted =
      s"""concat(text, repeat(concat(' xx',
         |  CASE WHEN doc_id % 9 = 0 THEN CASE $cyc ELSE lang END
         |       ELSE lang END),
         |  CAST(1 + doc_id % 3 AS INT)))""".stripMargin
    val enc = ConfLangs.zipWithIndex.map { case (l, i) =>
      s"((length(planted) - length(replace(planted, ' xx$l', ''))) DIV 5) * 8 + $i"
    }.mkString("greatest(", ", ", ")")
    val dec = ConfLangs.zipWithIndex.map { case (l, i) =>
      s"WHEN $i THEN '$l'"
    }.mkString("CASE enc % 8 ", " ", " END")
    Tables.documents(spark, dir)
      .select($"lang".as("declared"), expr(planted).as("planted"))
      .withColumn("enc", expr(enc))
      .select($"declared", expr(dec).as("guessed"))
      .groupBy($"declared", $"guessed").agg(count(lit(1)).as("n_docs"))
      .orderBy($"declared", $"guessed")
  }

  val qLangidConfusionSql: String = {
    val cyc = ConfLangs.zipWithIndex.map { case (l, i) =>
      s"WHEN lang = '$l' THEN '${ConfLangs((i + 1) % ConfLangs.size)}'"
    }.mkString(" ")
    val enc = ConfLangs.zipWithIndex.map { case (l, i) =>
      s"((length(planted) - length(replace(planted, ' xx$l', ''))) // 5) * 8 + $i"
    }.mkString("greatest(", ", ", ")")
    val dec = ConfLangs.zipWithIndex.map { case (l, i) =>
      s"WHEN $i THEN '$l'"
    }.mkString("CASE enc % 8 ", " ", " END")
    s"""WITH p AS (
       |  SELECT lang AS declared,
       |    text || repeat(' xx' ||
       |      CASE WHEN doc_id % 9 = 0 THEN CASE $cyc ELSE lang END
       |           ELSE lang END,
       |      CAST(1 + doc_id % 3 AS INT)) AS planted
       |  FROM documents),
       |e AS (SELECT declared, $enc AS enc FROM p)
       |SELECT declared, $dec AS guessed, CAST(count(*) AS BIGINT) AS n_docs
       |FROM e GROUP BY declared, guessed
       |ORDER BY declared, guessed""".stripMargin
  }

  // ------------------------------------------------- HLL register sketch

  /** Register count for the distinct-count sketch. */
  val HllM = 64
  /** Width of the rank domain: the md5 32-bit window minus the 6 register
    * bits. */
  val HllW = 26

  /** Shared rank expression: position of the highest set bit from a fixed
    * 26-bit window (rank 1 = top bit set, rank 27 = value 0) — the
    * generated CASE chain is pure integer comparisons, identical text in
    * both engines. */
  private def hllRankExpr(hp: String): String = {
    val whens = (0 until HllW).map { k =>
      val exp = HllW - 1 - k // test high bits first
      s"WHEN $hp >= ${1L << exp} THEN ${k + 1}"
    }.mkString(" ")
    s"CASE $whens ELSE ${HllW + 1} END"
  }

  /** 32-bit integer from the first 8 hex nibbles of an md5 column `hh` —
    * the well-mixed hash the sketch needs (the base-31 word poly's low
    * bits are too structured for register bucketing; measured 44/64
    * registers hit and a 6x-off estimate before the switch). `pos1` is
    * the dialect's substring-position function with (needle, hay) order
    * flag. */
  private def hllHashExpr(duck: Boolean): String =
    (1 to 8).map { j =>
      val pos =
        if (duck) s"(strpos('0123456789abcdef', substr(hh, $j, 1)) - 1)"
        else s"(locate(substr(hh, $j, 1), '0123456789abcdef') - 1)"
      s"CAST($pos AS BIGINT) * ${1L << (4 * (8 - j))}"
    }.mkString(" + ")

  /** HLL-STYLE REGISTER SKETCH (Flajolet '07 — the distinct-count
    * machinery behind every planet-scale "how many unique urls" answer):
    * 64 registers of max leading-zero rank over hashed url keys. The
    * query builds the sketch the way a cluster would: PER-SOURCE partial
    * sketches first (one grouped max), then a register-wise max MERGE of
    * the partials — HLL's defining property, and the reason a 10^12-row
    * distinct count costs one pass plus a 64-row reduce instead of a
    * global shuffle of every key. The exact distinct count rides along
    * (cheap at test scale) so the oracle pins both routes; WebSpec
    * asserts merged ≡ direct and that the float HLL estimate computed
    * FROM these registers lands within the sketch's error bound.
    *
    * Scale shape: hash/register/rank are scalar per-row maps fused into
    * the scan; the per-source sketch exchange carries (source, reg,
    * partial max) — sources × 64 rows; the merge is a 64-row reduce. The
    * exact-count branch exists to certify the sketch and would be
    * dropped at 10^12. */
  def qHllRegisters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rankW = 1L << HllW
    val keyed = Tables.documents(spark, dir)
      .select($"source",
        md5(lpad($"doc_id".cast("string"), 8, "0")).as("hh"))
      .select($"source", expr(s"CAST(${hllHashExpr(duck = false)} AS BIGINT)").as("h"))
      .select($"source", expr(s"h DIV $rankW").as("reg"),
        expr(s"${hllRankExpr(s"(h % $rankW)")}").as("rank"))
    val perSource = keyed.groupBy($"source", $"reg")
      .agg(max($"rank").as("partial_rank"))
    val merged = perSource.groupBy($"reg")
      .agg(max($"partial_rank").as("max_rank"))
    val exact = Tables.documents(spark, dir)
      .agg(countDistinct($"doc_id").as("exact_distinct"))
    merged.crossJoin(broadcast(exact))
      .select($"reg", $"max_rank".cast("long").as("max_rank"),
        $"exact_distinct")
      .orderBy($"reg")
  }

  val qHllRegistersSql: String = {
    val rankW = 1L << HllW
    s"""WITH hd AS (
       |  SELECT source, md5(lpad(CAST(doc_id AS VARCHAR), 8, '0')) AS hh
       |  FROM documents),
       |keyed AS (
       |  SELECT source, CAST(${hllHashExpr(duck = true)} AS BIGINT) AS h0 FROM hd),
       |rr AS (SELECT source, h0 // $rankW AS reg,
       |    ${hllRankExpr(s"(h0 % $rankW)")} AS rank
       |  FROM keyed),
       |per_source AS (
       |  SELECT source, reg, max(rank) AS partial_rank
       |  FROM rr GROUP BY source, reg),
       |merged AS (
       |  SELECT reg, max(partial_rank) AS max_rank
       |  FROM per_source GROUP BY reg),
       |exact AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
       |    AS exact_distinct FROM documents)
       |SELECT reg, CAST(max_rank AS BIGINT) AS max_rank, exact_distinct
       |FROM merged, exact
       |ORDER BY reg""".stripMargin
  }

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fix_mojibake" -> qFixMojibake,
    "q_anchor_text" -> qAnchorText,
    "q_lsh_tuning" -> qLshTuning,
    "q_scrub_luhn" -> qScrubLuhn,
    "q_shard_assembly" -> qShardAssembly,
    "q_langid_confusion" -> qLangidConfusion,
    "q_hll_registers" -> qHllRegisters,
    "q_chunk_passages" -> qChunkPassages,
  )

  val oracleSql: Map[String, String] = Map(
    "q_fix_mojibake" -> qFixMojibakeSql,
    "q_anchor_text" -> qAnchorTextSql,
    "q_lsh_tuning" -> qLshTuningSql,
    "q_scrub_luhn" -> qScrubLuhnSql,
    "q_shard_assembly" -> qShardAssemblySql,
    "q_langid_confusion" -> qLangidConfusionSql,
    "q_hll_registers" -> qHllRegistersSql,
    "q_chunk_passages" -> qChunkPassagesSql,
  )
}
