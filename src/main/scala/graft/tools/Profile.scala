package graft.tools

import graft.pipeline._
import graft.synth._

/** Per-stage single-thread cost breakdown (dev-only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val lang = LangId.default
    val kn = Perplexity.models
    val cfg = PipelineConfig()
    val pages = (0 until n).map(i => PageGen.generate(i.toLong)).toArray
    val texts = pages.map(p => if (p.html != null) Extract.extract(p.html) match {
      case Extract.Extracted(t) => t
      case _ => p.text
    } else p.text)
    val scratch = new LangIdScratch(lang.langs.length)

    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val t0 = System.nanoTime()
      f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e3 / n}%8.1f us/doc")
    }

    time("generate") { var i = 0; while (i < n) { PageGen.generate(i.toLong); i += 1 } }
    time("extract") { var i = 0; while (i < n) { if (pages(i).html != null) Extract.extract(pages(i).html); i += 1 } }
    time("tokenize") { var i = 0; while (i < n) { Perplexity.tokenize(texts(i)); i += 1 } }
    val tokss = texts.map(Perplexity.tokenize)
    time("stats") { var i = 0; while (i < n) { Heuristics.stats(texts(i), tokss(i)); i += 1 } }
    time("langid") { var i = 0; while (i < n) { lang.predict(texts(i), scratch); i += 1 } }
    time("ppl") { var i = 0; while (i < n) { kn("en").perplexity(tokss(i)); i += 1 } }
    time("scrub") { var i = 0; while (i < n) { Scrub.scrub(texts(i)); i += 1 } }
    time("full decide") { var i = 0
      while (i < n) { QualityPipeline.decide(pages(i).url, pages(i).html, pages(i).text, lang, kn, scratch, cfg); i += 1 } }
  }
}
