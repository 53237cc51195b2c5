package graft

import graft.io.TableIO
import graft.ledger.{Checkpoint, RunLedger}
import graft.pipeline.{PipelineConfig, PipelineJob}
import graft.synth.SynthSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The north rule's resume claim under a REAL mid-run kill (round-4
  * verdict, Next #6): a child JVM running the checkpointed pipeline is
  * halted (Runtime.halt — no shutdown hooks, the in-process stand-in for
  * SIGKILL/OOM-kill/node loss) either between checkpoint-manifest writes
  * or mid-output-write, then a clean re-run must
  *   - skip every bucket whose manifest committed before the kill,
  *   - reprocess the interrupted range exactly once (a third run is a
  *     no-op), and
  *   - converge to the SAME per-bucket content hashes as a run that was
  *     never interrupted.
  */
class CrashResumeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val N = 600L
  private val NBuckets = 8

  private lazy val root = {
    val dir = Files.createTempDirectory("graft-crash-table").toString
    TableIO.writePages(spark, SynthSpark.pages(spark, N, partitions = 4), dir, NBuckets)
    dir
  }

  /** Uninterrupted reference run (in this JVM): bucket -> contentHash. */
  private lazy val referenceHashes: Map[Int, String] = {
    val out = Files.createTempDirectory("graft-crash-ref").toString
    val res = PipelineJob.run(spark, root, out, s"$out/ledger.jsonl", runId = "ref")
    res.processed.map(s => s.bucket -> s.contentHash).toMap
  }

  private def runChild(mode: String, out: String, k: Int = -1): (Int, String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val inherited = scala.jdk.CollectionConverters.ListHasAsScala(
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments).asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("-XX:") ||
        a.startsWith("-Dspark.local.dir"))
    val cmd = Seq(javaBin) ++ inherited ++ Seq("-Xmx3g", "-cp", cp,
      "graft.tools.CrashResumeChild", mode, root, out, s"$out/ledger.jsonl") ++
      (if (k >= 0) Seq(k.toString) else Seq.empty)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val outS = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val errS = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    (code, outS + (if (code != 0 && code != 137) s"\nSTDERR:\n$errS" else ""))
  }

  private def parseResult(out: String): (Seq[Int], Seq[Int]) = {
    val line = out.linesIterator.find(_.startsWith("RESULT ")).getOrElse(
      fail(s"no RESULT line in child output:\n$out"))
    def ints(s: String) =
      if (s.isEmpty) Seq.empty[Int] else s.split(",").toSeq.map(_.toInt)
    val m = """RESULT processed=([0-9,]*) skipped=([0-9,]*)""".r
      .findFirstMatchIn(line).getOrElse(fail(s"unparseable RESULT: $line"))
    (ints(m.group(1)), ints(m.group(2)))
  }

  private def manifestHashes(out: String): Map[Int, String] = {
    val all = TableIO.snapshot(root).get.buckets.keys.toSeq.sorted
    all.flatMap(b => Checkpoint.read(out, b).map(m => b -> m.contentHash)).toMap
  }

  test("kill between checkpoint writes: completed buckets skip, rest reprocess once, hashes converge") {
    val out = Files.createTempDirectory("graft-crash-ckpt").toString
    val crashAfter = 3

    val (code1, _) = runChild("ckpt", out, crashAfter)
    assert(code1 === 137, "child must die by its own halt(137)")
    val all = TableIO.snapshot(root).get.buckets.keys.toSeq.sorted
    val ph = PipelineJob.paramsHash(PipelineConfig())
    val committed = Checkpoint.completed(out, all, ph)
    assert(committed.size === crashAfter,
      s"exactly $crashAfter manifests must have committed before the kill")

    // resume: committed buckets skip, the interrupted remainder reprocesses
    val (code2, out2) = runChild("clean", out)
    assert(code2 === 0, s"resume run failed:\n$out2")
    val (processed2, skipped2) = parseResult(out2)
    assert(skipped2.toSet === committed, "every committed bucket must skip")
    assert(processed2.toSet === all.toSet -- committed,
      "exactly the unchecked buckets must reprocess")

    // exactly once: a third run is a complete no-op
    val (code3, out3) = runChild("clean", out)
    assert(code3 === 0)
    val (processed3, skipped3) = parseResult(out3)
    assert(processed3.isEmpty && skipped3.toSet === all.toSet)

    // the final table equals an uninterrupted run: per-bucket content
    // hashes identical, no duplicated or lost rows
    assert(manifestHashes(out) === referenceHashes)
    assert(spark.read.parquet(s"$out/data").count() === N)

    // ledger: append-only through the crash, every surviving row verifies
    val lines = RunLedger.readAll(s"$out/ledger.jsonl")
    assert(lines.forall(RunLedger.verifyLine), "ledger rows must verify after a crash")
  }

  test("kill mid-output-write: partial staging never corrupts; re-run converges bit-identically") {
    val out = Files.createTempDirectory("graft-crash-write").toString

    val (code1, _) = runChild("write", out, 2)
    assert(code1 === 137, "child must die mid-write by its own halt(137)")
    // nothing may have committed a checkpoint before the write finished
    val all = TableIO.snapshot(root).get.buckets.keys.toSeq.sorted
    val ph = PipelineJob.paramsHash(PipelineConfig())
    assert(Checkpoint.completed(out, all, ph).isEmpty,
      "no checkpoint may commit before the output write completes")

    val (code2, out2) = runChild("clean", out)
    assert(code2 === 0, s"recovery run failed:\n$out2")
    val (processed2, _) = parseResult(out2)
    assert(processed2.toSet === all.toSet, "after a mid-write kill every bucket reprocesses")

    assert(manifestHashes(out) === referenceHashes)
    assert(spark.read.parquet(s"$out/data").count() === N,
      "recovered table must contain exactly the input rows — no dup/partial files")
  }
}
