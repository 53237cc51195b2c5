package graft

import graft.core._
import graft.pipeline._
import graft.synth._
import graft.verify.{DiffConfig, DiffJob}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: synthetic pages → Spark pipeline vs independent oracle →
  * rvl-style DiffJob. The miniature three-outcome contract (SURVEY §7.3):
  * NO_REAL_CHANGE on agreement, REAL_CHANGE with exactly one contributor on
  * a single perturbation, E_KEY_DUP on a duplicated url.
  */
class PipelineSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val N = 2000L

  private lazy val pages = SynthSpark.pages(spark, N, partitions = 8).cache()
  private lazy val got = QualityPipeline.run(spark, pages).cache()
  private lazy val ref = spark.createDataset(Oracle.labelRange(0L, N)).cache()

  private val cfg = DiffConfig(
    numericCols = Seq("keep", "lang_score", "ppl", "n_tokens"),
    textCols = Seq("reason", "lang_pred", "scrubbed_text"))

  test("pipeline vs oracle -> NO_REAL_CHANGE (proof over every cell)") {
    DiffJob.run(spark, ref.toDF(), got.toDF(), cfg) match {
      case Outcome.NoRealChange(counts, maxAbs, _) =>
        assert(counts.rowsAligned === N)
        assert(counts.cellsChecked === N * 7)
        assert(maxAbs === 0.0)
      case other => fail(s"expected NoRealChange, got $other")
    }
  }

  test("single perturbation -> REAL_CHANGE with exactly 1 contributor") {
    val perturbedUrl = ref.filter($"keep" === 1).orderBy($"url").limit(1)
      .collect().head.url
    val perturbed = ref.map(r => if (r.url == perturbedUrl) r.copy(keep = 0) else r)
    DiffJob.run(spark, perturbed.toDF(), got.toDF(), cfg) match {
      case Outcome.RealChange(_, total, _, coverage, contributors, fieldChanges) =>
        assert(total === 1.0)
        assert(contributors.size === 1)
        assert(contributors.head.url === perturbedUrl)
        assert(contributors.head.column === "keep")
        assert(coverage === 1.0)
        assert(fieldChanges.isEmpty)
      case other => fail(s"expected RealChange, got $other")
    }
  }

  test("duplicated url -> E_KEY_DUP naming the url") {
    val dup = got.toDF().union(got.toDF().orderBy("url").limit(1))
    DiffJob.run(spark, ref.toDF(), dup, cfg) match {
      case Outcome.Refused(code, msg, _, _) =>
        assert(code === RefusalCode.KeyDup)
        assert(msg.contains("https://"))
      case other => fail(s"expected E_KEY_DUP, got $other")
    }
  }

  test("langid accuracy >= 0.99 on keep-eligible real-language docs (truth labels)") {
    // too-short docs (< minWords) are dropped by the heuristics regardless
    // of language, so accuracy is measured where the prediction matters
    val joinedAcc = got.join(pages.select($"url", $"lang".as("true_lang")), "url")
      .filter($"true_lang" =!= "xx" && $"n_tokens" >= 25)
    val n = joinedAcc.count()
    val correct = joinedAcc.filter($"lang_pred" === $"true_lang").count()
    assert(correct.toDouble / n >= 0.99, s"$correct/$n")
  }

  test("keep rate is in the calibrated band and every drop has a reason") {
    val keepRate = got.filter($"keep" === 1).count().toDouble / N
    assert(keepRate > 0.5 && keepRate < 0.9, s"keep rate $keepRate")
    assert(got.filter($"keep" === 0 && $"reason" === "ok").count() === 0)
    assert(got.filter($"keep" === 1 && $"reason" =!= "ok").count() === 0)
  }

  test("scrubbed text carries no PII survivors") {
    val pii = got.filter($"scrubbed_text".rlike(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|\\b[0-9]{3}-[0-9]{2,3}-[0-9]{4}\\b"))
    assert(pii.count() === 0)
    assert(got.filter($"scrubbed_text".contains("[EMAIL]")).count() > 0)
    assert(got.filter($"scrubbed_text".contains("[SSN]")).count() > 0)
  }

  test("extract invariant: html docs reproduce `text` byte-identically") {
    val htmlPages = pages.filter(p => p.html != null)
    val bad = htmlPages.map { p =>
      Extract.extract(p.html) match {
        case Extract.Extracted(t) => if (t == p.text) 0 else 1
        case Extract.Refused(_) => 0 // encoding-corrupt docs are refusals, not mismatches
      }
    }.reduce(_ + _)
    assert(bad === 0)
  }

  test("generation is deterministic under different partitioning") {
    val a = SynthSpark.pages(spark, 500, partitions = 1).collect()
    val b = SynthSpark.pages(spark, 500, partitions = 7).collect()
    val am = a.map(p => p.url -> p).toMap
    assert(a.length === b.length)
    for (p <- b) {
      val q = am(p.url)
      assert(q.text === p.text)
      assert(q.lang === p.lang)
      assert(java.util.Arrays.equals(
        Option(q.html).getOrElse(Array.empty[Byte]),
        Option(p.html).getOrElse(Array.empty[Byte])))
    }
  }
}
