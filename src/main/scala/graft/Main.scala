package graft

import graft.pipeline._
import graft.synth._
import graft.verify._
import org.apache.spark.sql.SparkSession

/** spark-submit entry (SURVEY §7.1): synth | pipeline | verify | e2e.
  * Exit codes follow the rvl trinity: 0 = NO_REAL_CHANGE, 1 = REAL_CHANGE,
  * 2 = REFUSAL / usage error (/root/reference/src/cli/exit.rs:26-32).
  * Refusal reports go to stderr, JSON to stdout (exit.rs:38-44).
  */
object Main {

  /** Malformed command-line VALUES (non-numeric counts, empty delimiters)
    * are usage errors: exit 2, never an uncaught throw — an uncaught
    * exception exits the JVM with 1, which the 0/1/2 trinity misreads as
    * REAL_CHANGE. A dedicated type so engine-internal
    * IllegalArgumentExceptions (Scala `require`, Spark) are NOT absorbed
    * into the usage path. */
  final class UsageError(msg: String) extends RuntimeException(msg)

  private def parseNum[T](v: String, name: String, parse: String => T): T =
    try parse(v)
    catch {
      case _: NumberFormatException =>
        throw new UsageError(s"invalid value '$v' for $name (expected a number)")
    }

  /** Shared delimiter-value parser (diff and csv): char, \t, or 0xNN. */
  private def parseDelimiter(d: String): Byte =
    try (if (d == "\\t") '\t'.toInt
         else if (d.startsWith("0x")) Integer.parseInt(d.drop(2), 16)
         else d.charAt(0).toInt).toByte
    catch {
      case _: NumberFormatException | _: IndexOutOfBoundsException =>
        throw new UsageError(s"invalid value '$d' for --delimiter (char, \\t, or 0xNN)")
    }

  private def session(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** The diff command's core, shared by `diff` and `replay-capsule`:
    * parse flags, load both inputs (parquet dir or CSV front door), resolve
    * the profile, run the keyed (or row-order) diff. Returns the outcome
    * plus the config the run actually used — data/profile problems are
    * Refused OUTCOMES; a malformed flag VALUE (non-numeric --tolerance,
    * empty --delimiter) throws [[UsageError]], which callers turn into a
    * usage error (exit 2). Flag precedence mirrors the
    * reference orchestrator.rs:1095-1128: explicit flags > profile >
    * defaults, with key disagreement refused (E_KEY_CONFLICT). */
  private[graft] def runDiffCommand(
      spark: SparkSession,
      refPath: String,
      gotPath: String,
      rest: List[String]): (graft.core.Outcome, DiffConfig) = {
    def flag(name: String): Option[String] =
      rest.sliding(2).collectFirst { case Seq(`name`, v) => v }
    def numFlag[T](name: String, parse: String => T): Option[T] =
      flag(name).map(v => parseNum(v, name, parse))
    val forcedDelim = flag("--delimiter").map(parseDelimiter)
    def load(path: String): Either[graft.core.Outcome.Refused, org.apache.spark.sql.DataFrame] =
      if (path.endsWith(".csv")) {
        val bytes =
          try java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
          catch {
            case e: java.io.IOException =>
              return Left(graft.core.Outcome.Refused(graft.core.RefusalCode.Io,
                s"file read error: ${e.getMessage}", Seq.empty,
                "Next: check the path and permissions."))
          }
        graft.sources.CsvFrontDoor.parse(bytes, forcedDelim)
          .map(p => graft.sources.CsvFrontDoor.toDataFrame(spark, p))
      } else
        try Right(spark.read.parquet(path))
        catch {
          case e: Exception =>
            Left(graft.core.Outcome.Refused(graft.core.RefusalCode.Io,
              s"cannot read '$path': ${e.getMessage}", Seq.empty,
              "Next: check the path (parquet dir or .csv file)."))
        }
    val baseCfg = DiffConfig(
      numericCols = flag("--numeric").map(_.split(",").toSeq).getOrElse(Seq.empty),
      textCols = flag("--text").map(_.split(",").toSeq).getOrElse(Seq.empty),
      tolerance = numFlag("--tolerance", _.toDouble).getOrElse(0.0),
      threshold = numFlag("--threshold", _.toDouble).getOrElse(0.95),
      maxAuditChanges = numFlag("--max-audit-changes", _.toLong).getOrElse(10000L),
      exhaustive = rest.contains("--exhaustive"),
      explicit = rest.contains("--explicit"),
      autoTypes = flag("--numeric").isEmpty && flag("--text").isEmpty)
    // profile (op 41) through the real CLI path: exactly ONE selector
    // (--profile path | --profile-id registry id) — both at once is
    // E_AMBIGUOUS_PROFILE (orchestrator.rs:289); an explicit --key that
    // disagrees with the profile's key refuses, never silently resolves
    val profileOpt: Option[Profile] =
      (flag("--profile"), flag("--profile-id")) match {
        case (Some(_), Some(_)) =>
          return (graft.core.Outcome.Refused(graft.core.RefusalCode.AmbiguousProfile,
            "both --profile and --profile-id were provided",
            Seq.empty, "Next: provide exactly one profile selector."), baseCfg)
        case (Some(path), None) =>
          Profile.load(path) match {
            case Left(r) => return (r, baseCfg)
            case Right(p) => Some(p)
          }
        case (None, Some(id)) =>
          Profile.resolveId(id, flag("--profile-dir").getOrElse("profiles")) match {
            case Left(r) => return (r, baseCfg)
            case Right(p) => Some(p)
          }
        case (None, None) => None
      }
    val cfg = profileOpt match {
      case None => baseCfg.copy(key = flag("--key").getOrElse("url"))
      case Some(p) =>
        Profile.resolveKey(flag("--key"), p) match {
          case Left(r) => return (r, baseCfg)
          case Right(k) =>
            Profile.scope(baseCfg.copy(key = k.getOrElse("url")), p)
        }
    }
    val rowOrderMode = rest.contains("--row-order")
    def prepared(df: org.apache.spark.sql.DataFrame) =
      profileOpt.map(p => Profile.applyAliases(df, p)).getOrElse(df)
    val outcome = (load(refPath), load(gotPath)) match {
      case (Left(r), _) => r
      case (_, Left(r)) => r
      case (Right(a), Right(b)) =>
        if (rowOrderMode) DiffJob.runRowOrder(spark, prepared(a), prepared(b), cfg)
        else DiffJob.run(spark, prepared(a), prepared(b), cfg)
    }
    // report with the cfg the run actually used: row-order mode aligns by
    // the synthetic row index, and the envelope must say so
    val reportCfg =
      if (rowOrderMode) cfg.copy(key = DiffJob.RowKey, alignMode = "row_order")
      else cfg
    (outcome, reportCfg)
  }

  def main(args: Array[String]): Unit =
    try dispatch(args.toList)
    catch {
      case e: UsageError =>
        System.err.println(s"usage error: ${e.getMessage}")
        sys.exit(2)
    }

  private def dispatch(args: List[String]): Unit = args match {
    case "synth" :: n :: out :: Nil =>
      val count = parseNum(n, "<nDocs>", _.toLong)
      val spark = session("graft-synth")
      SynthSpark.pages(spark, count).write.mode("overwrite").parquet(out)
      spark.stop()

    case "pipeline" :: in :: out :: Nil =>
      val spark = session("graft-pipeline")
      QualityPipeline.runDf(spark, spark.read.parquet(in))
        .write.mode("overwrite").parquet(out)
      spark.stop()

    case "e2e" :: n :: rest if rest.size <= 1 =>
      // synth n pages -> pipeline vs independent oracle -> rvl-style diff
      val count = parseNum(n, "<nDocs>", _.toLong)
      val spark = session("graft-e2e")
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val pages = SynthSpark.pages(spark, count)
      val got = QualityPipeline.run(spark, pages)
      val ref = spark.createDataset(Oracle.labelRange(0L, count))
      val cfg = DiffConfig(
        numericCols = Seq("keep", "lang_score", "ppl", "n_tokens"),
        textCols = Seq("reason", "lang_pred", "scrubbed_text"))
      val outcome = DiffJob.run(spark, ref.toDF(), got.toDF(), cfg)
      // witness the run (stage=diff): inputs are deterministic in-memory
      // derivations of n, identified by their generator descriptor
      graft.ledger.Witness.recordDiff(
        sys.env.getOrElse("GRAFT_LEDGER", ".graft/ledger.jsonl"),
        s"e2e-${System.currentTimeMillis}",
        s"oracle:$count", s"pipeline:$count", cfg, outcome)
      val asJson = rest.headOption.contains("--json")
      if (asJson) println(Report.json(outcome, cfg))
      else outcome match {
        case r: graft.core.Outcome.Refused => System.err.println(Report.human(outcome, cfg))
        case _ => println(Report.human(outcome, cfg))
      }
      spark.stop()
      sys.exit(outcome.exitCode)

    case "ingest" :: n :: root :: Nil =>
      // synth -> Iceberg-style bucketed table + snapshot manifest
      val count = parseNum(n, "<nDocs>", _.toLong)
      val spark = session("graft-ingest")
      val id = graft.io.TableIO.writePages(spark, SynthSpark.pages(spark, count), root)
      println(s"snapshot: $id")
      spark.stop()

    case "run-buckets" :: tableRoot :: outRoot :: Nil =>
      // checkpointed, idempotently-resumable pipeline over pending buckets
      val spark = session("graft-run-buckets")
      spark.sparkContext.setLogLevel("WARN")
      val res = PipelineJob.run(spark, tableRoot, outRoot, s"$outRoot/ledger.jsonl")
      println(s"processed ${res.processed.size} bucket(s), skipped ${res.skipped.size} (checkpointed)")
      res.processed.foreach(s =>
        println(s"  bucket ${s.bucket}: ${s.rowsIn} in, ${s.rowsKept} kept, ${s.contentHash}"))
      spark.stop()

    case "diff" :: refPath :: gotPath :: rest =>
      // the reference's own workflow, on Spark: diff two tables (parquet or
      // CSV via the front door) by key, auto-typing columns per rvl op 12.
      val spark = session("graft-diff")
      spark.sparkContext.setLogLevel("ERROR")
      def flag(name: String): Option[String] =
        rest.sliding(2).collectFirst { case Seq(`name`, v) => v }
      val (outcome, reportCfg) =
        try runDiffCommand(spark, refPath, gotPath, rest)
        catch {
          case e: UsageError =>
            // usage error: exit 2 like any refusal, never a bare throw
            // (JVM exit 1 would read as REAL_CHANGE). ONLY the dedicated
            // type — engine-internal IllegalArgumentExceptions must
            // surface as failures, not masquerade as clean refusals.
            System.err.println(s"usage error: ${e.getMessage}")
            spark.stop()
            sys.exit(2)
        }
      // witness EVERY diff run — including refusals — with content hashes
      // of both inputs; a ledger failure never changes the verdict
      // (reference src/lib.rs:250-251, witness/mod.rs:15-26)
      // --deep-hash: full-content manifest hashes (manifest-full:sha256:)
      // for byte-level input certainty on small tables; the default
      // (manifest2) is the footer-and-tail scheme documented in Witness
      val deepHash = rest.contains("--deep-hash")
      graft.ledger.Witness.recordDiff(
        flag("--ledger").getOrElse(
          sys.env.getOrElse("GRAFT_LEDGER", ".graft/ledger.jsonl")),
        s"diff-${System.currentTimeMillis}",
        graft.ledger.Witness.inputHash(refPath, deepHash),
        graft.ledger.Witness.inputHash(gotPath, deepHash), reportCfg, outcome)
      // self-contained replay capsule (reference --capsule-out,
      // capsule.rs:128-372): inputs + report + replay.sh + manifest;
      // capsule failures never change the verdict either
      flag("--capsule-out").foreach { dir =>
        try graft.verify.DiffCapsule.writeDiff(
          dir, refPath, gotPath, rest, outcome, reportCfg)
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"warning: capsule write failed: ${e.getMessage}")
        }
      }
      if (rest.contains("--json")) println(Report.json(outcome, reportCfg))
      else outcome match {
        case _: graft.core.Outcome.Refused => System.err.println(Report.human(outcome, reportCfg))
        case _ => println(Report.human(outcome, reportCfg))
      }
      spark.stop()
      sys.exit(outcome.exitCode)

    case "replay-capsule" :: dir :: Nil =>
      // re-run a diff capsule against its own input copies and verify the
      // report hash (reference tests/capsule_replay.rs round-trip)
      graft.verify.DiffCapsule.readManifest(dir) match {
        case None =>
          System.err.println(s"REFUSAL (E_IO): no capsule manifest in $dir")
          sys.exit(2)
        case Some(m) =>
          // integrity first: a corrupted copy must not read as a code
          // regression (manifest artifact hashes, reference capsule parity)
          graft.verify.DiffCapsule.verifyInputs(dir, m).foreach { msg =>
            System.err.println(s"REPLAY FAILED: $msg")
            sys.exit(2)
          }
          val spark = session("graft-replay-capsule")
          spark.sparkContext.setLogLevel("ERROR")
          // capsule-relative paths (inputs/, inputs/profile.yaml) resolve
          // against the capsule root
          val flags = m.flags.map {
            case f if f.startsWith("inputs/") => s"$dir/$f"
            case f => f
          }
          val (outcome, cfg) =
            try runDiffCommand(spark, s"$dir/${m.ref}", s"$dir/${m.got}", flags.toList)
            catch {
              case e: UsageError =>
                System.err.println(s"usage error in capsule flags: ${e.getMessage}")
                spark.stop()
                sys.exit(2)
            }
          spark.stop()
          val gotHash = graft.io.TableIO.sha256(Report.json(outcome, cfg))
          val word = graft.ledger.Witness.outcomeWord(outcome)
          if (word == m.outcome && gotHash == m.reportSha256) {
            println(s"REPLAY OK: capsule $dir reproduced outcome '$word', report sha256:$gotHash")
          } else {
            System.err.println(
              s"REPLAY FAILED: capsule $dir expected (${m.outcome}, ${m.reportSha256}), got ($word, $gotHash)")
            sys.exit(2)
          }
      }

    case "csv" :: path :: rest =>
      // CSV front door: encoding guard -> sep= -> dialect detect -> parse;
      // same delimiter grammar as diff (char, \t, 0xNN — its own dialect
      // output prints tabs as \t, so the output must feed back in)
      val forced = rest.sliding(2).collectFirst { case Seq("--delimiter", d) =>
        parseDelimiter(d)
      }
      val bytes =
        try java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
        catch {
          case e: java.io.IOException =>
            // E_IO (reference op: file read errors are refusals, exit 2)
            System.err.println(s"REFUSAL (E_IO): file read error: ${e.getMessage}")
            System.err.println("Next: check the path and permissions.")
            sys.exit(2)
        }
      graft.sources.CsvFrontDoor.parse(bytes, forced) match {
        case Right(p) =>
          val d = p.dialect.delimiter.toChar match {
            case '\t' => "\\t"
            case c if c.isControl => f"0x${p.dialect.delimiter}%02x"
            case c => c.toString
          }
          println(s"dialect: delimiter=$d escape=${p.dialect.escape.display}")
          println(s"headers: ${p.headers.mkString(", ")}")
          println(s"records: ${p.records.size}")
        case Left(r) =>
          System.err.println(s"REFUSAL (${r.code.code}): ${r.message}")
          System.err.println(r.next)
          sys.exit(2)
      }

    case "replay" :: tableRoot :: outRoot :: bucketStr :: Nil =>
      // replay-capsule check (reference op 39): re-run ONE bucket from the
      // table and verify it reproduces the checkpointed content hash
      val bucket = parseNum(bucketStr, "<bucket>", _.toInt)
      graft.ledger.Checkpoint.read(outRoot, bucket) match {
        case None =>
          System.err.println(s"REFUSAL (E_IO): no checkpoint manifest for bucket $bucket")
          sys.exit(2)
        case Some(before) =>
          val spark = session("graft-replay")
          spark.sparkContext.setLogLevel("ERROR")
          graft.ledger.Checkpoint.invalidate(outRoot, bucket)
          PipelineJob.run(spark, tableRoot, outRoot, s"$outRoot/ledger.jsonl",
            runId = s"replay-$bucket")
          spark.stop()
          graft.ledger.Checkpoint.read(outRoot, bucket) match {
            case Some(after) if after.contentHash == before.contentHash &&
                after.rowsIn == before.rowsIn =>
              println(s"REPLAY OK: bucket $bucket reproduced ${after.rowsIn} rows, ${after.contentHash}")
            case other =>
              System.err.println(s"REPLAY FAILED: bucket $bucket was $before, now $other")
              sys.exit(2)
          }
      }

    // read-only agent-discovery surface (reference op 42, src/doctor.rs)
    case "doctor" :: rest =>
      val json = rest.contains("--json")
      if (rest.contains("--fix")) {
        // repair policy: --fix is unavailable, exits 2 with no stdout
        System.err.println("doctor --fix is unavailable; diagnostics are read-only")
        sys.exit(2)
      } else {
        // findings are computed ONCE and drive both the rendered report
        // and the exit code, so the two can never disagree (reference
        // emit_robot_triage returns the report's exit code)
        def healthAndExit(asJson: Boolean): Unit = {
          val fs = Doctor.findings()
          if (asJson) println(Doctor.healthJson(fs)) else print(Doctor.healthHuman(fs))
          if (fs.nonEmpty) sys.exit(1)
        }
        if (rest.contains("--robot-triage")) healthAndExit(asJson = true)
        else rest.filterNot(_.startsWith("--")) match {
          case "health" :: _ => healthAndExit(json)
          case "capabilities" :: _ => println(Doctor.capabilitiesJson())
          case "robot-docs" :: _ => print(Doctor.robotDocs())
          case Nil => healthAndExit(json)
          case other =>
            System.err.println(s"unknown doctor action: ${other.mkString(" ")}")
            sys.exit(2)
        }
      }

    case "--schema" :: Nil =>
      println(Doctor.schemaJson())

    case "describe" :: Nil =>
      // capability contract (reference op 42, --describe: read-only JSON)
      import graft.core.Json._
      println(obj(
        "name" -> esc("rvlspark"),
        "version" -> esc("0.1.0"),
        "envelope" -> esc("graft.v0"),
        "exit_codes" -> obj("no_real_change" -> "0", "real_change" -> "1", "refusal" -> "2"),
        "refusal_codes" -> arr(graft.core.RefusalCode.all.map(c => esc(c.code))),
        "pipeline_stages" -> arr(Seq("extract", "langid", "perplexity", "heuristics", "scrub").map(esc)),
        "languages" -> arr(graft.synth.Vocab.languages.toSeq.map(esc)),
        "scrub_version" -> esc(graft.pipeline.Scrub.version),
        "sql_functions" -> arr(graft.functions.GraftFunctions.names.map(esc)),
        "commands" -> arr(Seq("synth", "ingest", "pipeline", "run-buckets", "e2e",
          "diff", "csv", "replay", "replay-capsule", "ledger", "describe",
          "doctor", "--schema").map(esc))))

    // ledger audit surface (reference witness query/last/count,
    // /root/reference/src/lib.rs:259-323)
    case "ledger" :: "count" :: path :: Nil =>
      println(graft.ledger.RunLedger.readAll(path).size)

    case "ledger" :: "last" :: path :: Nil =>
      graft.ledger.RunLedger.readAll(path).lastOption match {
        case Some(line) => println(line)
        case None => System.err.println("ledger is empty"); sys.exit(1)
      }

    case "ledger" :: "query" :: path :: rest =>
      // witness-query parity (reference src/witness/query.rs:24): stage,
      // time range (ISO-8601 lexicographic), outcome (case-insensitive),
      // content-hash substring, limit
      def qflag(name: String): Option[String] =
        rest.sliding(2).collectFirst { case Seq(`name`, v) => v }
      graft.ledger.RunLedger.query(path, graft.ledger.RunLedger.Query(
        stage = qflag("--stage"),
        since = qflag("--since"),
        until = qflag("--until"),
        outcome = qflag("--outcome"),
        hash = qflag("--hash"),
        limit = qflag("--limit").map(parseNum(_, "--limit", _.toInt))
          .getOrElse(Int.MaxValue)))
        .foreach(println)

    case "ledger" :: "verify" :: path :: Nil =>
      val lines = graft.ledger.RunLedger.readAll(path)
      val bad = lines.count(!graft.ledger.RunLedger.verifyLine(_))
      println(s"${lines.size} row(s), $bad failed content-address verification")
      if (bad > 0) sys.exit(2)

    case other =>
      System.err.println(
        s"""usage: graft.Main <command>
           |  synth <nDocs> <outDir>            generate the pages table (plain parquet)
           |  ingest <nDocs> <tableRoot>        generate + commit Iceberg-style snapshot
           |  pipeline <pagesDir> <outDir>      run the quality filter
           |  run-buckets <tableRoot> <outRoot> checkpointed bucket-range pipeline (resumable)
           |  e2e <nDocs> [--json]              synth -> pipeline vs oracle -> diff verdict
           |  diff <ref> <got> [--key k] [--profile p.yaml] [--delimiter d]
           |       [--numeric a,b] [--text c] [--tolerance t] [--threshold p]
           |       [--max-audit-changes n] [--exhaustive] [--row-order]
           |       [--explicit] [--json]        rvl-style keyed diff (values redacted by default)
           |       [--ledger path]              witness ledger (default .graft/ledger.jsonl)
           |       [--deep-hash]                full-content input hashes in the witness row
           |       [--capsule-out dir]          write a self-contained replay capsule
           |  csv <path> [--delimiter d]        CSV front door (dialect detect + parse)
           |  replay <tableRoot> <outRoot> <b>  re-run one bucket, verify content hash
           |  replay-capsule <dir>              re-run a diff capsule, verify report hash
           |  ledger count|last|verify <path>
           |  ledger query <path> [--stage s] [--since ts] [--until ts]
           |       [--outcome o] [--hash sub] [--limit n]
           |  describe                          capability contract JSON
           |  doctor [health|capabilities|robot-docs] [--json] [--robot-triage]
           |  --schema                          graft.v0 envelope JSON Schema
           |(got: ${other.mkString(" ")})""".stripMargin)
      sys.exit(2)
  }
}
