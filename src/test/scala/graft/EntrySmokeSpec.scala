package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exactly what the driver's t1 smoke does: entry() must return rows. */
class EntrySmokeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  test("SparkEntry.entry returns a non-empty verdict table") {
    val df = SparkEntry.entry(spark)
    assert(df.count() === 2000L)
    assert(df.columns.toSet === Set("url", "keep", "reason", "lang_pred",
      "lang_score", "ppl", "n_tokens", "scrubbed_text"))
  }
}
