package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Contract-binding tests (reference tests/golden_rules.rs:4-18 binds the
  * binary ⇔ operator.json ⇔ source): `describe`'s advertised surfaces must
  * equal their sources of truth — refusal codes ⇔ RefusalCode.all,
  * commands ⇔ Main's actual dispatch patterns, sql functions ⇔ the
  * registered set — so the capability contract cannot drift. */
class ContractSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val mapper = new ObjectMapper()

  /** `describe` prints one JSON object and does not exit — capture it. */
  private lazy val describe: com.fasterxml.jackson.databind.JsonNode = {
    val baos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(baos, true, "UTF-8")) {
      Main.main(Array("describe"))
    }
    mapper.readTree(baos.toString("UTF-8"))
  }

  private def strings(field: String): Seq[String] = {
    val n = describe.get(field)
    (0 until n.size()).map(n.get(_).asText())
  }

  test("describe.refusal_codes == RefusalCode.all, exactly and in order") {
    assert(strings("refusal_codes") === graft.core.RefusalCode.all.map(_.code))
  }

  test("describe.commands == Main's top-level dispatch patterns (source-bound)") {
    val src = Files.readString(Paths.get("src/main/scala/graft/Main.scala"))
    // top-level commands are the 4-space-indented `case "x" :: ...` patterns
    // of main's match; deeper matches (doctor/ledger subactions) are indented
    // further and excluded by the anchor
    val dispatched = """(?m)^    case "((?:--)?[a-z0-9-]+)" ::""".r
      .findAllMatchIn(src).map(_.group(1)).toSet
    val advertised = strings("commands").toSet
    assert(advertised === dispatched,
      s"advertised-not-dispatched=${advertised.diff(dispatched)} " +
        s"dispatched-not-advertised=${dispatched.diff(advertised)}")
    // the usage text must name every dispatched command too
    val usageBlock = src.substring(src.indexOf("usage: graft.Main"))
    for (c <- dispatched)
      assert(usageBlock.contains(c), s"usage text omits command '$c'")
  }

  test("describe.sql_functions == the registered set, each resolvable") {
    assert(strings("sql_functions") === graft.functions.GraftFunctions.names)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    for (f <- graft.functions.GraftFunctions.names)
      assert(spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(f)),
        s"advertised sql function '$f' is not registered")
  }

  test("describe exit codes state the rvl trinity and match Outcome") {
    val ec = describe.get("exit_codes")
    assert(ec.get("no_real_change").asInt() === 0)
    assert(ec.get("real_change").asInt() === 1)
    assert(ec.get("refusal").asInt() === 2)
    // and the Outcome ADT agrees
    import graft.core._
    val counts = DiffCounts(0, 0, 0, 0, 0, 0, 0)
    assert(Outcome.NoRealChange(counts, 0.0, 0.0).exitCode === 0)
    assert(Outcome.RealChange(counts, 0, 0, 0, Seq.empty, Seq.empty).exitCode === 1)
    assert(Outcome.Refused(RefusalCode.Io, "", Seq.empty, "").exitCode === 2)
  }

  test("describe.scrub_version matches the pipeline's scrub version") {
    assert(describe.get("scrub_version").asText() === graft.pipeline.Scrub.version)
  }

  test("Tables.all covers every table accessor (bench-warmup binding)") {
    // the warmup registry's claim ("a new table can never miss warmup")
    // only holds if adding an accessor without registering it fails a test
    val accessors = graft.queries.Tables.getClass.getDeclaredMethods
      .filter(m => m.getReturnType.getSimpleName == "Dataset" &&
        m.getParameterCount == 2 && !m.getName.contains("$"))
      .map(_.getName).toSet
    assert(graft.queries.Tables.all.map(_._1).toSet === accessors)
  }
}
