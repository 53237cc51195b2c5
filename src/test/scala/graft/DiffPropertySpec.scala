package graft

import graft.core._
import graft.verify.{DiffConfig, DiffJob}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the diff verdict (SURVEY §5 grafted plan):
  * tolerance monotonicity, coverage-prefix minimality, topK ⊆ exhaustive.
  * Deterministic seed; each property runs a bounded number of small Spark
  * jobs (fixtures ≤ 24 rows).
  */
class DiffPropertySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val cfg = DiffConfig(numericCols = Seq("v"))

  private def outcome(deltas: Seq[Double], tolerance: Double,
      threshold: Double = 0.95, exhaustive: Boolean = false): Outcome = {
    val ref = deltas.indices.map(i => (f"u$i%03d", 0.0)).toDF("url", "v")
    val got = deltas.zipWithIndex.map { case (d, i) => (f"u$i%03d", d) }.toDF("url", "v")
    DiffJob.run(spark, ref, got,
      cfg.copy(tolerance = tolerance, threshold = threshold, exhaustive = exhaustive))
  }

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(12).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  private val deltasGen: Gen[List[Double]] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50.0, 50.0).map(d => math.rint(d * 4) / 4)))

  test("property: raising tolerance never flips NO->REAL") {
    check(Prop.forAll(deltasGen, Gen.chooseNum(0.0, 10.0)) { (ds, tol) =>
      val lower = outcome(ds, tol)
      val higher = outcome(ds, tol * 2 + 1.0)
      lower match {
        case _: Outcome.NoRealChange => higher.isInstanceOf[Outcome.NoRealChange]
        case _ => true
      }
    })
  }

  test("property: REAL_CHANGE contributor prefix is minimal and covers threshold") {
    check(Prop.forAll(deltasGen) { ds =>
      outcome(ds, tolerance = 0.0) match {
        case Outcome.RealChange(_, total, _, _, contributors, _) if total > 0 =>
          val shares = contributors.map(_.contribution / total)
          val cum = shares.scanLeft(0.0)(_ + _).tail
          // covers the threshold (or the hard cap truncated it)
          val covered = cum.last >= 0.95 || contributors.size == 25
          // minimal: dropping the last contributor would fall below
          val minimal = contributors.size <= 1 || cum(contributors.size - 2) < 0.95
          covered && minimal
        case _ => true
      }
    })
  }

  test("property: topK is a prefix of the exhaustive list under the canonical order") {
    check(Prop.forAll(deltasGen) { ds =>
      (outcome(ds, 0.0), outcome(ds, 0.0, exhaustive = true)) match {
        case (Outcome.RealChange(_, _, _, _, top, _), Outcome.RealChange(_, _, _, _, all, _)) =>
          val key = (c: Contributor) => (c.url, c.column)
          top.map(key) == all.take(top.size).map(key)
        case (a, b) => a.getClass == b.getClass ||
          (a.isInstanceOf[Outcome.Refused] || b.isInstanceOf[Outcome.Refused])
      }
    })
  }

  test("property: cells_changed counts exactly the above-tolerance cells") {
    check(Prop.forAll(deltasGen, Gen.chooseNum(0.0, 5.0)) { (ds, tol) =>
      val expected = ds.count(d => math.abs(d) > tol)
      outcome(ds, tol, exhaustive = true) match {
        case Outcome.NoRealChange(counts, _, _) => expected == 0 && counts.cellsChanged == 0
        case Outcome.RealChange(counts, _, _, _, _, _) => counts.cellsChanged == expected
        case _: Outcome.Refused => true
      }
    })
  }
}
