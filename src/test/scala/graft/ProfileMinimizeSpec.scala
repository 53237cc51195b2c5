package graft

import graft.core._
import graft.verify._
import org.scalatest.funsuite.AnyFunSuite

/** Profile scoping (op 41) and repro minimization (op 40). */
class ProfileMinimizeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("profile parse: include_columns, key, aliases") {
    val p = Profile.parse(
      """# verifier scope
        |include_columns:
        |  - keep
        |  - ppl
        |key: url
        |aliases:
        |  old_name: keep
        |""".stripMargin)
    assert(p.includeColumns === Some(Seq("keep", "ppl")))
    assert(p.key === Some("url"))
    assert(p.aliases === Map("old_name" -> "keep"))
  }

  test("explicit key conflicting with profile key -> E_KEY_CONFLICT") {
    val p = Profile.parse("key: url\n")
    Profile.resolveKey(Some("doc_id"), p) match {
      case Left(r) => assert(r.code === RefusalCode.KeyConflict)
      case Right(_) => fail("expected E_KEY_CONFLICT")
    }
    assert(Profile.resolveKey(Some("url"), p) === Right(Some("url")))
    assert(Profile.resolveKey(None, p) === Right(Some("url")))
  }

  test("missing profile file -> E_PROFILE_NOT_FOUND") {
    Profile.load("/tmp/definitely-not-a-profile.yaml") match {
      case Left(r) => assert(r.code === RefusalCode.ProfileNotFound)
      case Right(_) => fail("expected refusal")
    }
  }

  test("scoping restricts columns, unknown names silently ignored, key kept") {
    val cfg = DiffConfig(numericCols = Seq("keep", "ppl", "n_tokens"),
      textCols = Seq("reason", "scrubbed_text"))
    val scoped = Profile.scope(cfg, Profile.parse(
      "include_columns:\n  - keep\n  - reason\n  - no_such_column\n"))
    assert(scoped.numericCols === Seq("keep"))
    assert(scoped.textCols === Seq("reason"))
    // scoped diff actually runs and only checks the scoped cells
    val ref = Seq(("u1", 1.0, 100.0, "ok"), ("u2", 0.0, 200.0, "x"))
      .toDF("url", "keep", "ppl", "reason")
    val got = Seq(("u1", 1.0, 999.0, "ok"), ("u2", 0.0, 200.0, "x"))
      .toDF("url", "keep", "ppl", "reason")
    DiffJob.run(spark, ref, got, scoped) match {
      case Outcome.NoRealChange(counts, _, _) =>
        assert(counts.cellsChecked === 4) // ppl excluded by the profile
      case other => fail(s"expected NoRealChange under scope, got $other")
    }
  }

  test("minimize extracts a tiny fixture that reproduces the verdict") {
    val n = 40
    val ref = (1 to n).map(i => (f"u$i%03d", i.toDouble, "t")).toDF("url", "v", "s")
    val got = (1 to n).map(i =>
      (f"u$i%03d", if (i == 7) 1000.0 else i.toDouble, if (i == 9) "T" else "t"))
      .toDF("url", "v", "s")
    val cfg = DiffConfig(numericCols = Seq("v"), textCols = Seq("s"))
    val outcome = DiffJob.run(spark, ref, got, cfg) match {
      case rc: Outcome.RealChange => rc
      case other => fail(s"expected RealChange, got $other")
    }
    val m = Minimize(spark, ref, got, cfg, outcome)
    assert(m.urls.toSet === Set("u007", "u009"))
    assert(m.ref.count() === 2 && m.got.count() === 2)
    // the minimized pair reproduces the same leading contributor
    DiffJob.run(spark, m.ref, m.got, Minimize.scopedConfig(cfg, m)) match {
      case rc: Outcome.RealChange =>
        assert(rc.contributors.head.url === outcome.contributors.head.url)
        assert(rc.contributors.head.delta === outcome.contributors.head.delta)
        assert(rc.fieldChanges.map(_.url) === outcome.fieldChanges.map(_.url))
      case other => fail(s"minimized fixture no longer reproduces: $other")
    }
  }
}
