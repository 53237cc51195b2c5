package graft.pipeline

import graft.synth.Page
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Per-document verdict row. `keep` is numeric (0/1) on purpose: the
  * rvl-style verifier diffs numeric columns with tolerance and reports the
  * smallest explaining set of flipped decisions. */
final case class QualityResult(
    url: String,
    keep: Int,
    reason: String,
    lang_pred: String,
    lang_score: Double,
    ppl: Double,
    n_tokens: Long,
    scrubbed_text: String)

/** Pipeline thresholds beyond the heuristic config. */
final case class PipelineConfig(
    heuristics: Heuristics.Config = Heuristics.default,
    minLangScore: Double = 0.75,
    maxPpl: Double = 5000.0)

/** The quality filter: extract → heuristics → langid → perplexity → scrub,
  * assembled Spark-first:
  *
  *  - models (langid weight matrix + KN LMs) are built once on the driver
  *    and BROADCAST — executors never rebuild them;
  *  - all per-doc work runs in ONE mapPartitions pass with per-partition
  *    scratch buffers (no shuffle at all: the stage is embarrassingly
  *    parallel, so it scales linearly with executors at 10^12 docs);
  *  - drop decisions carry the FIRST failing rule id (rvl refusal
  *    discipline), and `scrubbed_text` is byte-deterministic.
  */
object QualityPipeline {

  val ReasonOk = "ok"

  /** Pure per-document decision given already-materialized models.
    * Shared by the Spark path; the oracle has its own assembly. */
  def decide(
      url: String,
      html: Array[Byte],
      text: String,
      langModel: LangIdModel,
      knModels: Map[String, KnBigramModel],
      scratch: LangIdScratch,
      cfg: PipelineConfig): QualityResult = {

    // 1. canonical text: html wins when present (the crawl's source of truth)
    val canonical: Either[String, String] =
      if (html != null) Extract.extract(html) match {
        case Extract.Extracted(t) => Right(t)
        case Extract.Refused(reason) => Left(reason)
      }
      else Right(text)

    canonical match {
      case Left(reason) =>
        QualityResult(url, 0, reason, "xx", 0.0, 0.0, 0L, "")
      case Right(t) =>
        val lower = t.toLowerCase(java.util.Locale.ROOT) // one copy per doc
        val tokens = Perplexity.tokenizeLower(lower)
        val st = Heuristics.stats(t, lower, tokens)
        val (langPred, langScore) = langModel.predict(t, scratch)
        val ppl = knModels.get(langPred) match {
          case Some(m) => m.perplexity(tokens)
          case None => Double.MaxValue
        }
        // CCNet-style order (Wenzek et al. 2020, public): language
        // confidence → perplexity → heuristic rules; first failure wins.
        val reason =
          (if (langScore < cfg.minLangScore) Some("low_lang_conf") else None)
            .orElse(if (ppl > cfg.maxPpl) Some("high_ppl") else None)
            .orElse(Heuristics.firstFailure(st, cfg.heuristics))
            .getOrElse(ReasonOk)
        val keep = if (reason == ReasonOk) 1 else 0
        QualityResult(url, keep, reason, langPred, langScore, ppl,
          tokens.length.toLong, Scrub.scrub(t, st.hasAt, st.hasDigit))
    }
  }

  /** Spark assembly over a pages Dataset. */
  def run(spark: SparkSession, pages: Dataset[Page],
      cfg: PipelineConfig = PipelineConfig()): Dataset[QualityResult] = {
    import spark.implicits._
    val bcLang = spark.sparkContext.broadcast(LangId.default)
    val bcKn = spark.sparkContext.broadcast(Perplexity.models)
    pages.mapPartitions { iter =>
      val langModel = bcLang.value
      val knModels = bcKn.value
      val scratch = new LangIdScratch(langModel.langs.length)
      iter.map(p => decide(p.url, p.html, p.text, langModel, knModels, scratch, cfg))
    }
  }

  /** DataFrame overload for schema-dynamic callers: only the three columns
    * the filter actually reads are selected (parquet scan pruning +
    * cheaper row decode — warc_ts/lang never leave the scan).
    *
    * Decode path: InternalRow getters straight off the scan (UTF8String /
    * binary), not a tuple encoder — the codegen'd Tuple3 deserializer cost
    * ~10–25% of table-read throughput at 32 cores (DecodeBench A/B:
    * 350–518k docs/s tuple vs 439–549k direct). Rows are fully consumed
    * before `next()` (UnsafeRow reuse is safe; getBinary copies). */
  def runDf(spark: SparkSession, pagesDf: DataFrame,
      cfg: PipelineConfig = PipelineConfig()): Dataset[QualityResult] = {
    import spark.implicits._
    val bcLang = spark.sparkContext.broadcast(LangId.default)
    val bcKn = spark.sparkContext.broadcast(Perplexity.models)
    val rdd = pagesDf.select($"url", $"html", $"text")
      .queryExecution.toRdd.mapPartitions { iter =>
        val langModel = bcLang.value
        val knModels = bcKn.value
        val scratch = new LangIdScratch(langModel.langs.length)
        iter.map { row =>
          val url = if (row.isNullAt(0)) null else row.getUTF8String(0).toString
          val html = if (row.isNullAt(1)) null else row.getBinary(1)
          val text = if (row.isNullAt(2)) null else row.getUTF8String(2).toString
          decide(url, html, text, langModel, knModels, scratch, cfg)
        }
      }
    spark.createDataset(rdd)
  }
}
