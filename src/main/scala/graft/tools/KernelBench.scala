package graft.tools

import graft.pipeline._
import graft.synth._

/** Single-thread and multi-thread kernel throughput (no Spark) — isolates
  * kernel cost from Spark overhead to find the scaling bottleneck. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val threadCounts = Seq(1, 8, 32)

    // force model builds before timing
    val lang = LangId.default
    val kn = Perplexity.models
    val cfg = PipelineConfig()

    def work(from: Int, until: Int): Long = {
      val scratch = new LangIdScratch(lang.langs.length)
      var kept = 0L
      var i = from
      while (i < until) {
        val p = PageGen.generate(i.toLong)
        val r = QualityPipeline.decide(p.url, p.html, p.text, lang, kn, scratch, cfg)
        kept += r.keep
        i += 1
      }
      kept
    }

    work(0, 5000) // warmup

    for (t <- threadCounts) {
      val chunk = n / t
      val t0 = System.nanoTime()
      val threads = (0 until t).map { ti =>
        val th = new Thread(() => { work(ti * chunk, (ti + 1) * chunk); () })
        th.start(); th
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$t%2d  docs/s=${n / sec}%.0f  (per-thread ${n / sec / t}%.0f)")
    }
  }
}
