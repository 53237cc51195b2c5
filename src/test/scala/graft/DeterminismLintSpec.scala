package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Static determinism lints — the mechanical enforcement the reference gets
  * from its ast-grep rules (/root/reference/rules/no-hashmap-in-output.yml,
  * witness-must-append.yml, exit-code-range.yml). A future edit that
  * iterates an unordered Map into a report, truncates the witness ledger,
  * exits with a code outside the trinity, or adds an unbounded collect()
  * fails HERE instead of silently breaking determinism at scale. */
class DeterminismLintSpec extends AnyFunSuite {

  private val mainRoot = Paths.get("src/main/scala/graft")

  private def read(rel: String): String = Files.readString(mainRoot.resolve(rel))

  private def scalaFiles: Seq[Path] = {
    val s = Files.walk(mainRoot)
    try s.iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
    finally s.close()
  }

  /** Files whose bytes reach a user/machine-readable artifact (reports,
    * JSON envelopes, ledger rows, capsule manifests). */
  private val outputFiles = Seq(
    "verify/Report.scala", "verify/DiffCapsule.scala", "core/Json.scala",
    "core/Fmt.scala", "Doctor.scala", "ledger/RunLedger.scala",
    "ledger/Checkpoint.scala", "ledger/Witness.scala", "io/TableIO.scala",
    "io/BloomStore.scala")

  test("no-hashmap-in-output: output files never iterate unordered structures") {
    // ops whose result does not depend on iteration order
    val orderFree = """(sum|min|max|size|count|contains|toSet|forall|exists)"""
    for (rel <- outputFiles) {
      val src = read(rel)
      for (banned <- Seq("mutable.Map", "mutable.HashMap", "java.util.HashMap",
          "TrieMap", ".par."))
        assert(!src.contains(banned),
          s"$rel uses $banned — non-deterministic iteration order in an output path")
      for ((line, i) <- src.linesIterator.zipWithIndex
           if """\.(keys|values|keySet)\b""".r.findFirstIn(line).isDefined)
        assert(
          line.contains("sorted") || line.contains("sortBy") ||
            (orderFree + """\(|\.""" + orderFree).r.findFirstIn(line).isDefined,
          s"$rel:${i + 1} reads unordered keys/values without sorting: ${line.trim}")
    }
  }

  test("witness-must-append: the ledger only ever appends, with fsync") {
    val src = read("ledger/RunLedger.scala")
    assert(src.contains("StandardOpenOption.APPEND"), "ledger open must APPEND")
    assert(!src.contains("TRUNCATE_EXISTING"), "ledger must never truncate")
    assert(src.contains("force(true)"), "ledger append must fsync (force)")
  }

  test("exit-code-range: every sys.exit uses the 0/1/2 trinity") {
    val allowed = Set("0", "1", "2", "outcome.exitCode")
    for (f <- scalaFiles; (line, i) <- Files.readString(f).linesIterator.zipWithIndex;
         m <- """sys\.exit\(([^)]*)\)""".r.findAllMatchIn(line))
      assert(allowed.contains(m.group(1).trim),
        s"$f:${i + 1} exits with '${m.group(1)}' — outside the 0/1/2 trinity")
  }

  test("collect-guard: no new unbounded collect() without explicit review") {
    // Every .collect() in src/main was reviewed as bounded (evidence lists
    // capped at 25/10 rows, single-row aggregates, ≤16 centroids, bench
    // harness sums). A NEW collect() anywhere — or an extra one in a listed
    // file — fails here until it is reviewed and the allowlist updated.
    val allowed = Map(
      "Bench.scala" -> 1, // single-row sum(keep) action
      "bench/ScalingBench.scala" -> 2, // single-row sums in the paired harness
      "io/TableIO.scala" -> 1, // per-bucket counts agg: ≤ #buckets rows
      "io/BloomStore.scala" -> 2, // per-shard filter aggs: ≤ numShards rows
      "pipeline/PipelineJob.scala" -> 1, // per-bucket stats agg: ≤ #buckets rows
      // flat IVF quantizer (16 centroids) + two-level hierarchy builder +
      // trained-IVF seed / per-iteration centroid update / cell-size
      // evidence (all ≤ numCells rows) — all bounded
      "queries/VectorQueries.scala" -> 5,
      // local-finish union-find (both engines): collects guarded by the
      // signature/sym count (≤ localFinish = 200k edges); hash-min's is
      // opt-in per call site, alternating's runs after ≥2 distributed
      // rounds
      "queries/ConnectedComponents.scala" -> 2,
      "queries/VerifierQueries.scala" -> 1, // ≤25-row coverage prefix fold
      // MemoryStream driver feed — the sandbox stand-in for the Kafka/file
      // source a production stream reads; bounded by the test table
      "queries/StreamQueries.scala" -> 1,
      "verify/DiffJob.scala" -> 11, // evidence/limit(≤25)/single-row aggs
      "verify/KeyDiscovery.scala" -> 1, // single-row candidate-stats agg
      "tools/DecodeBench.scala" -> 2, // dev A/B harness, single-row sums
      "tools/Spark32.scala" -> 1) // dev harness, single-row sum
    for (f <- scalaFiles) {
      val rel = mainRoot.relativize(f).toString
      val n = "\\.collect\\(\\)".r.findAllIn(Files.readString(f)).size
      assert(n <= allowed.getOrElse(rel, 0),
        s"$rel has $n collect() calls (allowed ${allowed.getOrElse(rel, 0)}); " +
          "review the new call is bounded, then update the allowlist")
    }
  }

  test("nonfatal-guard: no bare Throwable catches in swallow paths") {
    // The never-affect-the-verdict rule swallows ledger/bench failures —
    // but `case _: Throwable` also swallows a dying JVM (OOM,
    // InterruptedException) and masks it as "unhashable"/-1. Swallow
    // catches must use NonFatal. Exception: Doctor probes for MISSING
    // Spark classes, which throw LinkageError (fatal by NonFatal's
    // definition) — that catch is the probe's entire point.
    for (f <- scalaFiles; rel = mainRoot.relativize(f).toString
         if rel != "Doctor.scala") {
      val src = Files.readString(f)
      assert(!src.contains(": Throwable"),
        s"$rel catches Throwable — use scala.util.control.NonFatal " +
          "so fatal JVM errors still propagate")
    }
  }

  test("broadcast-guard: no closure-captured collected arrays feeding UDFs") {
    // A driver-collected model array (centroids, weights) consumed by a
    // udf must be broadcast — a closure-captured array serializes into
    // EVERY task (~0.5 GB/task at suggestedCells(10^12) cells), a
    // broadcast ships once per executor. File-granular heuristic: any
    // query file defining udf()s AND collecting rows must also broadcast.
    for (f <- scalaFiles; rel = mainRoot.relativize(f).toString
         if rel.startsWith("queries/")) {
      val src = Files.readString(f)
      if (src.contains("udf(") && src.contains(".collect()"))
        assert(src.contains("sparkContext.broadcast("),
          s"$rel collects driver-side data and defines UDFs without a " +
            "broadcast — a collected array captured by a udf closure " +
            "serializes into every task; use sparkContext.broadcast")
    }
  }

  test("fd-guard: Files.list/walk only through the closing helper") {
    // every directory listing goes through TableIO.listDir (try/finally
    // close) — a raw Files.list leaks one fd per call (round-2 ADVICE)
    for (f <- scalaFiles; rel = mainRoot.relativize(f).toString
         if rel != "io/TableIO.scala") {
      val src = Files.readString(f)
      for (banned <- Seq("Files.list(", "Files.walk("))
        assert(!src.contains(banned),
          s"$rel calls $banned directly — use TableIO.listDir (closes the stream)")
    }
  }

  test("no wall-clock or randomness inside rendered report bytes") {
    // reports/manifests must be reproducible from (outcome, cfg) alone;
    // timestamps belong only in ledger rows (nowIso) and run ids
    for (rel <- Seq("verify/Report.scala", "verify/DiffCapsule.scala",
        "core/Json.scala", "core/Fmt.scala")) {
      val src = read(rel)
      for (banned <- Seq("System.currentTimeMillis", "System.nanoTime",
          "Instant.now", "scala.util.Random", "new java.util.Random"))
        assert(!src.contains(banned), s"$rel embeds $banned in report bytes")
    }
  }
}
