package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The read-only discovery surface: health/capabilities/schema must emit
  * valid JSON with the contract fields agents key on. */
class DoctorSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("doctor health JSON is valid and healthy in this environment") {
    val n = mapper.readTree(Doctor.healthJson())
    assert(n.get("schema_version").asText() === Doctor.SchemaVersion)
    assert(n.get("status").asText() === "healthy")
    assert(n.get("exit_code").asInt() === 0)
    assert(n.get("findings").isArray)
  }

  test("capabilities JSON declares read_only and the discovery commands") {
    val n = mapper.readTree(Doctor.capabilitiesJson())
    assert(n.get("read_only").asBoolean())
    val cmds = (0 until n.get("commands").size()).map(n.get("commands").get(_).asText())
    assert(cmds.contains("doctor health --json"))
    assert(cmds.contains("--schema"))
  }

  test("--schema is a valid JSON Schema covering the graft.v0 envelope") {
    val n = mapper.readTree(Doctor.schemaJson())
    assert(n.get("$schema").asText().contains("2020-12"))
    val props = n.get("properties")
    for (f <- Seq("version", "mode", "explicit", "outcome", "contributors",
        "field_changes", "refusal"))
      assert(props.has(f), s"schema missing property $f")
    val modes = props.get("mode").get("enum")
    assert((0 until modes.size()).map(modes.get(_).asText()).toSet === Set("key", "row_order"))
  }

  test("robot docs name the read-only guarantee and exit codes") {
    val docs = Doctor.robotDocs()
    assert(docs.contains("read-only"))
    assert(docs.contains("0: healthy"))
    assert(docs.contains("--fix is unavailable"))
  }
}
