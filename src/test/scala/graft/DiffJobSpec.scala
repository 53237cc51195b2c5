package graft

import graft.core._
import graft.verify.{DiffConfig, DiffJob}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Verifier fixture matrix (FIXTURES.md §2) — the table-shaped analogue of
  * the reference's must-pass list (/root/reference/docs/PLAN_RVL.md:553-577).
  */
class DiffJobSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def labels(rows: (String, Double, Double, String)*): DataFrame =
    rows.toDF("url", "keep", "ppl", "scrubbed_text")

  private val numCfg = DiffConfig(numericCols = Seq("keep", "ppl"), textCols = Seq("scrubbed_text"))

  private val base = labels(
    ("https://a/1", 1.0, 120.0, "alpha text"),
    ("https://b/2", 0.0, 90.5, "beta text"),
    ("https://c/3", 1.0, 300.25, "gamma text"))

  test("identical sides -> NO_REAL_CHANGE with zero max delta") {
    DiffJob.run(spark, base, base, numCfg) match {
      case Outcome.NoRealChange(counts, maxAbs, _) =>
        assert(counts.rowsAligned === 3)
        assert(counts.cellsChecked === 9)
        assert(maxAbs === 0.0)
      case other => fail(s"expected NoRealChange, got $other")
    }
  }

  test("sub-tolerance noise -> NO_REAL_CHANGE, max_abs_delta reported") {
    val got = labels(
      ("https://a/1", 1.0, 120.0 + 1e-12, "alpha text"),
      ("https://b/2", 0.0, 90.5, "beta text"),
      ("https://c/3", 1.0, 300.25, "gamma text"))
    DiffJob.run(spark, base, got, numCfg.copy(tolerance = 1e-9)) match {
      case Outcome.NoRealChange(_, maxAbs, tol) =>
        assert(maxAbs > 0.0 && maxAbs <= tol)
      case other => fail(s"expected NoRealChange, got $other")
    }
  }

  test("single keep flip -> REAL_CHANGE with exactly 1 contributor, 100% coverage") {
    val got = labels(
      ("https://a/1", 0.0, 120.0, "alpha text"),
      ("https://b/2", 0.0, 90.5, "beta text"),
      ("https://c/3", 1.0, 300.25, "gamma text"))
    DiffJob.run(spark, base, got, numCfg) match {
      case Outcome.RealChange(_, total, _, coverage, contributors, fieldChanges) =>
        assert(contributors.size === 1)
        assert(contributors.head.url === "https://a/1")
        assert(contributors.head.column === "keep")
        assert(contributors.head.delta === -1.0)
        assert(total === 1.0)
        assert(coverage === 1.0)
        assert(fieldChanges.isEmpty)
      case other => fail(s"expected RealChange, got $other")
    }
  }

  test("smallest prefix: deltas 90/8/2 at threshold 0.95 -> 2 contributors") {
    val ref = labels(
      ("u1", 0.0, 0.0, "t"), ("u2", 0.0, 0.0, "t"), ("u3", 0.0, 0.0, "t"))
    val got = labels(
      ("u1", 90.0, 0.0, "t"), ("u2", 8.0, 0.0, "t"), ("u3", 2.0, 0.0, "t"))
    DiffJob.run(spark, ref, got, numCfg) match {
      case Outcome.RealChange(_, total, _, coverage, contributors, _) =>
        assert(total === 100.0)
        assert(contributors.map(_.url) === Seq("u1", "u2"))
        assert(coverage === 0.98)
      case other => fail(s"expected RealChange, got $other")
    }
  }

  test("diffuse: 1000 equal deltas -> E_DIFFUSE with top_k_coverage 0.025") {
    val ref = (1 to 1000).map(i => (f"u$i%04d", 0.0, 0.0, "t")).toDF("url", "keep", "ppl", "scrubbed_text")
    val got = (1 to 1000).map(i => (f"u$i%04d", 1.0, 0.0, "t")).toDF("url", "keep", "ppl", "scrubbed_text")
    DiffJob.run(spark, ref, got, numCfg) match {
      case Outcome.Refused(code, _, detail, _) =>
        assert(code === RefusalCode.Diffuse)
        assert(detail.exists(_.contains("0.025")))
      case other => fail(s"expected E_DIFFUSE, got $other")
    }
  }

  test("duplicate key -> E_KEY_DUP naming the url") {
    val dup = base.union(labels(("https://a/1", 1.0, 1.0, "x")))
    DiffJob.run(spark, base, dup, numCfg) match {
      case Outcome.Refused(code, msg, _, _) =>
        assert(code === RefusalCode.KeyDup)
        assert(msg.contains("https://a/1"))
      case other => fail(s"expected E_KEY_DUP, got $other")
    }
  }

  test("empty key -> E_KEY_EMPTY") {
    val bad = base.union(labels(("  \t ", 1.0, 1.0, "x")))
    DiffJob.run(spark, bad, base, numCfg) match {
      case Outcome.Refused(code, _, _, _) => assert(code === RefusalCode.KeyEmpty)
      case other => fail(s"expected E_KEY_EMPTY, got $other")
    }
  }

  test("key mismatch -> E_KEY_MISMATCH with sorted samples") {
    val got = labels(
      ("https://a/1", 1.0, 120.0, "alpha text"),
      ("https://d/4", 1.0, 1.0, "delta text"))
    DiffJob.run(spark, base, got, numCfg) match {
      case Outcome.Refused(code, msg, detail, _) =>
        assert(code === RefusalCode.KeyMismatch)
        assert(msg.contains("2 key(s) missing"))
        assert(msg.contains("1 extra"))
        assert(detail === Seq("missing: https://b/2", "missing: https://c/3", "extra: https://d/4"))
      case other => fail(s"expected E_KEY_MISMATCH, got $other")
    }
  }

  test("mixed types in a string-typed numeric column -> E_MIXED_TYPES, first offender") {
    val ref = Seq(("u1", "1.5"), ("u2", "2.5"), ("u3", "oops"), ("u2x", "abc"))
      .toDF("url", "score")
    val got = Seq(("u1", "1.5"), ("u2", "2.5"), ("u3", "3.5"), ("u2x", "4.5"))
      .toDF("url", "score")
    DiffJob.run(spark, ref, got, DiffConfig(numericCols = Seq("score"))) match {
      case Outcome.Refused(code, msg, _, _) =>
        assert(code === RefusalCode.MixedTypes)
        assert(msg.contains("u2x"), s"first offender by key order should be u2x: $msg")
      case other => fail(s"expected E_MIXED_TYPES, got $other")
    }
  }

  test("string-typed numeric columns parse finance formats and match") {
    val ref = Seq(("u1", "$1,234.56"), ("u2", "(500.00)"), ("u3", "NA"))
      .toDF("url", "amount")
    val got = Seq(("u1", "1234.56"), ("u2", "-500"), ("u3", "null"))
      .toDF("url", "amount")
    DiffJob.run(spark, ref, got, DiffConfig(numericCols = Seq("amount"))) match {
      case Outcome.NoRealChange(_, maxAbs, _) => assert(maxAbs === 0.0)
      case other => fail(s"expected NoRealChange (finance formats equal), got $other")
    }
  }

  test("numeric vs missing -> E_MISSINGNESS") {
    val ref = Seq(("u1", Some(1.0)), ("u2", Some(2.0))).toDF("url", "v")
    val got = Seq(("u1", Some(1.0)), ("u2", None: Option[Double])).toDF("url", "v")
    DiffJob.run(spark, ref, got, DiffConfig(numericCols = Seq("v"))) match {
      case Outcome.Refused(code, msg, _, _) =>
        assert(code === RefusalCode.Missingness)
        assert(msg.contains("u2"))
      case other => fail(s"expected E_MISSINGNESS, got $other")
    }
  }

  test("no columns in scope -> E_NO_NUMERIC") {
    DiffJob.run(spark, base, base, DiffConfig()) match {
      case Outcome.Refused(code, _, _, _) => assert(code === RefusalCode.NoNumeric)
      case other => fail(s"expected E_NO_NUMERIC, got $other")
    }
  }

  test("field change: one text byte differs -> REAL_CHANGE, 1 field_change, numeric total 0") {
    val got = labels(
      ("https://a/1", 1.0, 120.0, "alpha texT"),
      ("https://b/2", 0.0, 90.5, "beta text"),
      ("https://c/3", 1.0, 300.25, "gamma text"))
    DiffJob.run(spark, base, got, numCfg) match {
      case Outcome.RealChange(_, total, _, _, contributors, fieldChanges) =>
        assert(total === 0.0)
        assert(contributors.isEmpty)
        assert(fieldChanges === Seq(FieldChange("https://a/1", "scrubbed_text", "alpha text", "alpha texT")))
      case other => fail(s"expected RealChange with field change, got $other")
    }
  }

  test("audit overflow -> E_AUDIT_LIMIT") {
    val ref = (1 to 50).map(i => (s"u$i", 0.0, 0.0, s"text$i")).toDF("url", "keep", "ppl", "scrubbed_text")
    val got = (1 to 50).map(i => (s"u$i", 0.0, 0.0, s"TEXT$i")).toDF("url", "keep", "ppl", "scrubbed_text")
    DiffJob.run(spark, ref, got, numCfg.copy(maxAuditChanges = 10)) match {
      case Outcome.Refused(code, _, _, _) => assert(code === RefusalCode.AuditLimit)
      case other => fail(s"expected E_AUDIT_LIMIT, got $other")
    }
  }

  test("tie-break determinism: equal contributions ordered by url asc") {
    val ref = labels(("b", 0.0, 0.0, "t"), ("a", 0.0, 0.0, "t"), ("c", 0.0, 0.0, "t"))
    val got = labels(("b", 5.0, 0.0, "t"), ("a", 5.0, 0.0, "t"), ("c", 5.0, 0.0, "t"))
    DiffJob.run(spark, ref, got, numCfg.copy(threshold = 0.99)) match {
      case Outcome.RealChange(_, _, _, _, contributors, _) =>
        assert(contributors.map(_.url) === Seq("a", "b", "c"))
        assert(contributors.map(_.cumulativeShare).last > 0.99)
      case other => fail(s"expected RealChange, got $other")
    }
  }

  test("exhaustive mode lists every changed cell, coverage 1.0") {
    val got = labels(
      ("https://a/1", 0.0, 121.0, "alpha text"),
      ("https://b/2", 1.0, 90.5, "beta text"),
      ("https://c/3", 1.0, 300.25, "gamma text"))
    DiffJob.run(spark, base, got, numCfg.copy(exhaustive = true)) match {
      case Outcome.RealChange(_, _, _, coverage, contributors, _) =>
        assert(coverage === 1.0)
        assert(contributors.size === 3)
      case other => fail(s"expected exhaustive RealChange, got $other")
    }
  }

  test("missing key column -> E_NO_KEY naming the side") {
    val noKey = base.drop("url").withColumnRenamed("keep", "keep2")
    DiffJob.run(spark, base, noKey, numCfg) match {
      case Outcome.Refused(code, msg, _, _) =>
        assert(code === RefusalCode.NoKey)
        assert(msg.contains("pipeline side"))
      case other => fail(s"expected E_NO_KEY, got $other")
    }
  }

  test("autoTypes: classifies numeric vs text per op 12 and diffs accordingly") {
    val ref = Seq(("u1", "$1,234.56", "10", "hello"), ("u2", "(500.00)", "NA", "world"))
      .toDF("url", "amount", "qty", "note")
    val got = Seq(("u1", "1234.56", "10", "hello"), ("u2", "-500", "NA", "world!"))
      .toDF("url", "amount", "qty", "note")
    DiffJob.run(spark, ref, got, DiffConfig(autoTypes = true)) match {
      case Outcome.RealChange(counts, total, _, _, contributors, fieldChanges) =>
        assert(counts.numericColumns === 2) // amount + qty (NA = missing both)
        assert(counts.textColumns === 1) // note
        assert(total === 0.0 && contributors.isEmpty)
        assert(fieldChanges.map(_.url) === Seq("u2"))
      case other => fail(s"expected RealChange with only a field change, got $other")
    }
  }

  test("autoTypes: a column mixing numbers and words -> E_MIXED_TYPES") {
    val ref = Seq(("u1", "12"), ("u2", "34"), ("u3", "oops"))
      .toDF("url", "v")
    DiffJob.run(spark, ref, ref, DiffConfig(autoTypes = true)) match {
      case Outcome.Refused(code, msg, _, _) =>
        assert(code === RefusalCode.MixedTypes)
        assert(msg.contains("u3"))
      case other => fail(s"expected E_MIXED_TYPES, got $other")
    }
  }

  test("autoTypes: pure-text columns diff as text, no numeric refusal") {
    val ref = Seq(("u1", "abc"), ("u2", "def")).toDF("url", "w")
    val got = Seq(("u1", "abc"), ("u2", "DEF")).toDF("url", "w")
    DiffJob.run(spark, ref, got, DiffConfig(autoTypes = true)) match {
      case Outcome.RealChange(counts, _, _, _, _, fieldChanges) =>
        assert(counts.numericColumns === 0 && counts.textColumns === 1)
        assert(fieldChanges.size === 1)
      case other => fail(s"expected text-only RealChange, got $other")
    }
  }
}
