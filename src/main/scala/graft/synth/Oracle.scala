package graft.synth

import graft.pipeline._

/** The INDEPENDENT reference labeler (FIXTURES.md §1): a single-threaded,
  * non-Spark assembly that shares only the scalar kernels with the
  * pipeline. It is the "reference labels" side of the rvl-style cogroup
  * diff — if the Spark plumbing ever reorders, drops, or double-applies a
  * kernel, the DiffJob catches the divergence per url.
  */
object Oracle {

  def label(page: Page, cfg: PipelineConfig = PipelineConfig()): QualityResult = {
    // independent decision assembly (deliberately re-stated, not shared)
    if (page.html != null) {
      Extract.extract(page.html) match {
        case Extract.Refused(reason) =>
          return QualityResult(page.url, 0, reason, "xx", 0.0, 0.0, 0L, "")
        case Extract.Extracted(t) =>
          return labelText(page.url, t, cfg)
      }
    }
    labelText(page.url, page.text, cfg)
  }

  private def labelText(url: String, t: String, cfg: PipelineConfig): QualityResult = {
    val stats = Heuristics.stats(t)
    val (langPred, langScore) = LangId.default.predict(t)
    val tokens = Perplexity.tokenize(t)
    val ppl = Perplexity.models.get(langPred).map(_.perplexity(tokens)).getOrElse(Double.MaxValue)

    var reason: String = null
    if (langScore < cfg.minLangScore) reason = "low_lang_conf"
    else if (ppl > cfg.maxPpl) reason = "high_ppl"
    else Heuristics.firstFailure(stats, cfg.heuristics) match {
      case Some(r) => reason = r
      case None =>
    }
    val keep = if (reason == null) 1 else 0
    QualityResult(url, keep, if (reason == null) QualityPipeline.ReasonOk else reason,
      langPred, langScore, ppl, tokens.length.toLong, Scrub.scrub(t))
  }

  /** Labels for a deterministic id range — driver-side loop, no Spark. */
  def labelRange(from: Long, until: Long, cfg: PipelineConfig = PipelineConfig()): Seq[QualityResult] =
    (from until until).map(i => label(PageGen.generate(i), cfg))
}
