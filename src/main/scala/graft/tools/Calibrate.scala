package graft.tools

import graft.synth._
import graft.pipeline._

/** Dev-only calibration: distributions of langid score / ppl / keep reasons
  * over the synthetic corpus, plus the extract byte-identity check. */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val pages = (0L until n.toLong).map(PageGen.generate)

    // extract roundtrip
    var htmlN = 0; var ok = 0; var refusedEnc = 0; var mismatch = 0
    for (p <- pages if p.html != null) {
      htmlN += 1
      Extract.extract(p.html) match {
        case Extract.Extracted(t) => if (t == p.text) ok += 1 else {
          mismatch += 1
          if (mismatch <= 2) {
            println(s"MISMATCH url=${p.url}")
            println("  text: " + p.text.take(120).replace("\n", "\\n"))
            println("  extr: " + t.take(120).replace("\n", "\\n"))
          }
        }
        case Extract.Refused(r) => refusedEnc += 1
      }
    }
    println(s"html docs: $htmlN, roundtrip ok: $ok, refused: $refusedEnc, mismatch: $mismatch")

    // langid on clean (non-gibberish) docs
    val model = LangId.default
    var correct = 0; var tot = 0
    val scoresByClass = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (p <- pages) {
      val (pred, score) = model.predict(p.text)
      val cls = if (p.lang == "xx") "xx" else "real"
      scoresByClass(cls) ::= score
      if (p.lang != "xx") { tot += 1; if (pred == p.lang) correct += 1 }
    }
    println(f"langid acc on real-lang docs: ${correct * 100.0 / tot}%.2f%% ($correct/$tot)")
    for ((cls, ss) <- scoresByClass) {
      val sorted = ss.sorted
      def pct(p: Double) = sorted((p * (sorted.size - 1)).toInt)
      println(f"  score[$cls]: p1=${pct(0.01)}%.3f p5=${pct(0.05)}%.3f p50=${pct(0.5)}%.3f p95=${pct(0.95)}%.3f")
    }

    // ppl under predicted lang
    val pplByClass = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (p <- pages) {
      val (pred, _) = model.predict(p.text)
      val ppl = Perplexity.score(p.text, pred)
      val cls = if (p.lang == "xx") "xx" else p.lang
      pplByClass(cls) ::= ppl
    }
    for ((cls, ss) <- pplByClass.toSeq.sortBy(_._1)) {
      val sorted = ss.sorted
      def pct(p: Double) = sorted((p * (sorted.size - 1)).toInt)
      println(f"  ppl[$cls]: p5=${pct(0.05)}%.1f p50=${pct(0.5)}%.1f p95=${pct(0.95)}%.1f p99=${pct(0.99)}%.1f")
    }

    // oracle keep/reason distribution
    val reasons = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (p <- pages) {
      val r = Oracle.label(p)
      reasons(r.reason) += 1
    }
    println("reasons: " + reasons.toSeq.sortBy(-_._2).mkString(", "))
  }
}
