package graft

import graft.core.Json._

/** Read-only agent-discovery surface (reference op 42: src/doctor.rs,
  * --schema at src/lib.rs:121-220). The discovery commands never write
  * files, run Spark jobs, or change diff behavior; `doctor --fix` is
  * deliberately unavailable (exit 2, no stdout), matching the reference's
  * repair policy.
  */
object Doctor {

  val SchemaVersion = "graft.doctor.v1"
  val ContractVersion = "graft.read_only_doctor.v1"

  final case class Finding(id: String, summary: String, next: String)

  /** Environment health checks — all read-only. */
  def findings(): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    val jv = System.getProperty("java.version", "")
    if (!jv.startsWith("17") && !jv.startsWith("21"))
      out += Finding("jvm_version",
        s"JVM $jv is untested (expected 17 or 21)",
        "Next: run under Java 17.")
    try {
      val v = org.apache.spark.SPARK_VERSION
      if (!v.startsWith("4.")) out += Finding("spark_version",
        s"Spark $v on the classpath (built against 4.x)",
        "Next: put Spark 4.x jars on the classpath.")
    } catch {
      case _: Throwable => out += Finding("spark_missing",
        "Spark classes are not on the classpath",
        "Next: add /opt/spark/jars (or your distribution) to the classpath.")
    }
    if (!new java.io.File(System.getProperty("java.io.tmpdir", "/tmp")).canWrite)
      out += Finding("tmpdir",
        "java.io.tmpdir is not writable (shuffle spill will fail)",
        "Next: point java.io.tmpdir at a writable directory.")
    out.result()
  }

  def healthJson(): String = healthJson(findings())

  /** Overload taking precomputed findings: callers that also decide the
    * process exit code pass the SAME list to both, so the JSON's embedded
    * exit_code can never disagree with the actual exit. */
  def healthJson(fs: Seq[Finding]): String = {
    obj(
      "schema_version" -> esc(SchemaVersion),
      "contract_version" -> esc(ContractVersion),
      "status" -> esc(if (fs.isEmpty) "healthy" else "findings"),
      "checks_passed" -> (3 - fs.length).toString,
      "findings" -> arr(fs.map(f => obj(
        "id" -> esc(f.id),
        "summary" -> esc(f.summary),
        "next" -> esc(f.next)))),
      "exit_code" -> (if (fs.isEmpty) "0" else "1"))
  }

  def healthHuman(): String = healthHuman(findings())

  def healthHuman(fs: Seq[Finding]): String = {
    val sb = new StringBuilder
    sb ++= "GRAFT DOCTOR\n\n"
    sb ++= s"Status: ${if (fs.isEmpty) "healthy" else "findings"}\n"
    sb ++= s"Checks passed: ${3 - fs.length}\n"
    sb ++= s"Findings: ${fs.length}\n"
    if (fs.nonEmpty) {
      sb ++= "\n"
      fs.foreach { f =>
        sb ++= s"- ${f.id}: ${f.summary}\n  next: ${f.next}\n"
      }
    }
    sb ++= "\nNext: graft.Main doctor capabilities --json\n"
    sb.result()
  }

  def capabilitiesJson(): String = obj(
    "schema_version" -> esc(SchemaVersion),
    "contract_version" -> esc(ContractVersion),
    "read_only" -> "true",
    "commands" -> arr(Seq(
      "doctor", "doctor health", "doctor health --json",
      "doctor capabilities --json", "doctor robot-docs",
      "doctor --robot-triage", "describe", "--schema").map(esc)),
    "exit_codes" -> obj("healthy" -> "0", "findings" -> "1", "usage" -> "2"))

  def robotDocs(): String =
    """# graft robot-docs guide
      |
      |graft's agent discovery surface is read-only. The discovery commands
      |never repair files, delete files, run Spark jobs, write ledgers,
      |create checkpoints, or change diff behavior.
      |
      |Commands:
      |- graft.Main doctor --robot-triage
      |- graft.Main doctor health [--json]
      |- graft.Main doctor capabilities --json
      |- graft.Main doctor robot-docs
      |- graft.Main describe
      |- graft.Main --schema
      |- graft.Main diff <ref> <got> --key <column> --json
      |
      |Exit codes:
      |- 0: healthy / NO_REAL_CHANGE
      |- 1: findings present / REAL_CHANGE
      |- 2: usage error / REFUSAL
      |
      |Repair policy: doctor --fix is unavailable and exits 2 without
      |stdout. Use doctor --robot-triage or doctor capabilities --json for
      |read-only diagnostics.
      |""".stripMargin

  /** JSON Schema (draft 2020-12) for the graft.v0 diff envelope. */
  def schemaJson(): String = {
    val counts = obj("type" -> esc("object"))
    val contributor = obj(
      "type" -> esc("object"),
      "properties" -> obj(
        "url" -> obj("type" -> esc("string")),
        "column" -> obj("type" -> esc("string")),
        "direction" -> obj("type" -> esc("string"), "enum" -> arr(Seq("+", "-", "~").map(esc))),
        "old" -> obj("type" -> arr(Seq("number", "null").map(esc))),
        "new" -> obj("type" -> arr(Seq("number", "null").map(esc))),
        "delta" -> obj("type" -> esc("number")),
        "contribution" -> obj("type" -> esc("number")),
        "share" -> obj("type" -> esc("number")),
        "cumulative_share" -> obj("type" -> esc("number"))),
      "required" -> arr(Seq("url", "column", "share", "cumulative_share").map(esc)))
    val fieldChange = obj(
      "type" -> esc("object"),
      "properties" -> obj(
        "url" -> obj("type" -> esc("string")),
        "column" -> obj("type" -> esc("string")),
        "old" -> obj("type" -> esc("string")),
        "new" -> obj("type" -> esc("string"))),
      "required" -> arr(Seq("url", "column").map(esc)))
    obj(
      "$schema" -> esc("https://json-schema.org/draft/2020-12/schema"),
      "$id" -> esc("https://graft.v0/schema.json"),
      "title" -> esc("graft Output Schema"),
      "description" -> esc("JSON schema for the graft.v0 output envelope"),
      "type" -> esc("object"),
      "required" -> arr(Seq("version", "mode", "explicit", "tolerance",
        "threshold", "outcome", "exit_code").map(esc)),
      "properties" -> obj(
        "version" -> obj("type" -> esc("string"), "const" -> esc("graft.v0")),
        "mode" -> obj("type" -> esc("string"), "enum" -> arr(Seq("key", "row_order").map(esc))),
        "key" -> obj("type" -> esc("string")),
        "contributor_id" -> obj("type" -> esc("string"), "const" -> esc("row_index")),
        "explicit" -> obj("type" -> esc("boolean")),
        "tolerance" -> obj("type" -> esc("number")),
        "threshold" -> obj("type" -> esc("number")),
        "outcome" -> obj("type" -> esc("string"),
          "enum" -> arr(Seq("no_real_change", "real_change", "refusal").map(esc))),
        "exit_code" -> obj("type" -> esc("integer"), "enum" -> "[0,1,2]"),
        "counts" -> counts,
        "total_change" -> obj("type" -> esc("number")),
        "max_abs_delta" -> obj("type" -> esc("number")),
        "coverage" -> obj("type" -> esc("number")),
        "contributors" -> obj("type" -> esc("array"), "items" -> contributor),
        "field_changes" -> obj("type" -> esc("array"), "items" -> fieldChange),
        "refusal" -> obj(
          "type" -> esc("object"),
          "properties" -> obj(
            "code" -> obj("type" -> esc("string")),
            "reason" -> obj("type" -> esc("string")),
            "message" -> obj("type" -> esc("string")),
            "detail" -> obj("type" -> esc("array")),
            "next" -> obj("type" -> esc("string"))),
          "required" -> arr(Seq("code", "message").map(esc)))))
  }
}
