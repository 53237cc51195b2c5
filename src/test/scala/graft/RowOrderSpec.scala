package graft

import graft.core._
import graft.verify.{DiffConfig, DiffJob, KeyDiscovery}
import org.scalatest.funsuite.AnyFunSuite

/** Row-order alignment + shuffle veto + key discovery (reference ops 22-24).
  * Single-partition inputs give the defined row order the mode requires. */
class RowOrderSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val cfg = DiffConfig(numericCols = Seq("v"))

  private def df(rows: (String, Double)*) =
    rows.toDF("id", "v").coalesce(1)

  test("identical row-order inputs -> NO_REAL_CHANGE") {
    val a = df(("a", 1.0), ("b", 2.0), ("c", 3.0))
    DiffJob.runRowOrder(spark, a, a, cfg) match {
      case Outcome.NoRealChange(counts, _, _) => assert(counts.rowsAligned === 3)
      case other => fail(s"expected NoRealChange, got $other")
    }
  }

  test("positional delta without reorder -> REAL_CHANGE with row-id contributor") {
    val ref = df(("a", 1.0), ("b", 2.0), ("c", 3.0))
    val got = df(("a", 1.0), ("b", 5.0), ("c", 3.0))
    DiffJob.runRowOrder(spark, ref, got, cfg) match {
      case Outcome.RealChange(_, total, _, _, contributors, _) =>
        assert(total === 3.0)
        assert(contributors.map(_.url) === Seq("000000000002"))
      case other => fail(s"expected RealChange, got $other")
    }
  }

  test("row count mismatch -> E_ROWCOUNT with suggested keys") {
    val ref = df(("a", 1.0), ("b", 2.0), ("c", 3.0))
    val got = df(("a", 1.0), ("b", 2.0))
    DiffJob.runRowOrder(spark, ref, got, cfg) match {
      case Outcome.Refused(code, msg, detail, next) =>
        assert(code === RefusalCode.RowCount)
        assert(msg.contains("3") && msg.contains("2"))
        assert(detail.contains("suggested_key=id"))
        assert(next.contains("key mode"))
      case other => fail(s"expected E_ROWCOUNT, got $other")
    }
  }

  test("reordered rows with a perfect key -> E_NEED_KEY veto (never a misleading verdict)") {
    val ref = df(("a", 1.0), ("b", 2.0), ("c", 3.0))
    val got = df(("b", 2.0), ("a", 1.0), ("c", 3.0)) // same data, shuffled
    DiffJob.runRowOrder(spark, ref, got, cfg) match {
      case Outcome.Refused(code, _, detail, _) =>
        assert(code === RefusalCode.NeedKey)
        assert(detail.contains("suggested_key=id"))
      case other => fail(s"expected E_NEED_KEY, got $other")
    }
  }

  test("key discovery classifies perfect vs joinable vs excluded") {
    val ref = Seq(("k1", "x", 1.0), ("k2", "x", 2.0), ("k3", "y", 3.0))
      .toDF("id", "grp", "v")
    val got = Seq(("k1", "x", 1.0), ("k2", "y", 2.0), ("k9", "z", 3.0))
      .toDF("id", "grp", "v")
    val cands = KeyDiscovery.discover(ref, got)
    val byName = cands.map(c => c.name -> c.kind).toMap
    // id: unique+non-empty both sides but value sets differ -> Joinable
    assert(byName("id") === KeyDiscovery.Joinable)
    // grp: duplicated on ref side -> excluded
    assert(!byName.contains("grp"))
    // v: unique both sides, sets differ -> Joinable; perfect ordering first
    val perfectFirst = cands.takeWhile(_.kind == KeyDiscovery.Perfect)
    assert(cands.drop(perfectFirst.size).forall(_.kind == KeyDiscovery.Joinable))
  }

  test("key discovery: identical sides give perfect candidates") {
    val a = Seq(("k1", 1.0), ("k2", 2.0)).toDF("id", "v")
    val cands = KeyDiscovery.discover(a, a)
    assert(cands.map(_.name).toSet === Set("id", "v"))
    assert(cands.forall(_.kind === KeyDiscovery.Perfect))
  }
}
