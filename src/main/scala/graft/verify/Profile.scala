package graft.verify

import graft.core.{Outcome, RefusalCode}
import java.nio.file.{Files, Paths}

/** Profile scoping (reference op 41, src/profile.rs): a small hand-rolled
  * YAML subset — `include_columns` (list), `key` (single), `aliases`
  * (exact map), `profile_id` (registry selector), `column_registry`
  * (alias-mapping directory) — that restricts the diff's column scope.
  * Conflict rules kept from the reference: an explicitly passed key that
  * disagrees with the profile's key is E_KEY_CONFLICT (never silently
  * resolved); a missing profile file is E_PROFILE_NOT_FOUND; BOTH a path
  * and an id selector is E_AMBIGUOUS_PROFILE (orchestrator.rs:289); a
  * broken column_registry reference is E_PROFILE_REGISTRY
  * (profile.rs:424-470); unknown include_columns are silently ignored
  * (docs/PLAN_RVL.md:755-761 discipline).
  */
final case class Profile(
    includeColumns: Option[Seq[String]],
    key: Option[String],
    aliases: Map[String, String],
    profileId: Option[String] = None,
    columnRegistry: Option[String] = None)

object Profile {

  private def listDir(d: java.nio.file.Path): Seq[java.nio.file.Path] =
    graft.io.TableIO.listDir(d) // closes the Files.list stream (round-2 ADVICE)

  def parse(text: String): Profile = {
    var include: Option[Vector[String]] = None
    var key: Option[String] = None
    var profileId: Option[String] = None
    var registry: Option[String] = None
    val aliases = Map.newBuilder[String, String]
    var section: String = ""
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#')
      val t = line.trim
      if (t.nonEmpty) {
        if (!line.startsWith(" ") && !line.startsWith("-") && t.endsWith(":")) {
          section = t.dropRight(1)
          if (section == "include_columns") include = Some(Vector.empty)
        } else if (t.startsWith("- ")) {
          val v = t.drop(2).trim
          section match {
            case "include_columns" => include = Some(include.getOrElse(Vector.empty) :+ v)
            case "key" => if (key.isEmpty) key = Some(v)
            case _ =>
          }
        } else if (t.contains(":")) {
          val Array(k, v) = t.split(":", 2)
          // Dispatch on the SECTION first: an indented `key: canonical`
          // under `aliases:` is an alias whose source column is literally
          // named "key", NOT a top-level key override — otherwise a
          // resolved capsule profile carrying such an alias parses back
          // with the alias dropped and a phantom key, and replay fails
          // while misattributing it to a code regression. Top-level keys
          // only match on unindented lines.
          val effSection =
            if (line.startsWith(" ") || line.startsWith("\t")) section else ""
          (effSection, k.trim, v.trim) match {
            case ("aliases", from, to) if to.nonEmpty => aliases += (from -> to)
            case ("", "key", value) if value.nonEmpty => key = Some(value)
            case ("", "profile_id", value) if value.nonEmpty => profileId = Some(value)
            case ("", "column_registry", value) if value.nonEmpty => registry = Some(value)
            case _ =>
          }
        }
      }
    }
    Profile(include, key, aliases.result(), profileId, registry)
  }

  def load(path: String): Either[Outcome.Refused, Profile] = {
    val p = Paths.get(path)
    if (!Files.exists(p))
      Left(Outcome.Refused(RefusalCode.ProfileNotFound,
        s"profile file not found: $path", Seq.empty,
        "Next: check the profile path."))
    else {
      val prof = parse(new String(Files.readAllBytes(p), "UTF-8"))
      prof.columnRegistry match {
        case None => Right(prof)
        case Some(ref) => loadRegistry(p, ref).map(reg =>
          // registry aliases resolve first; inline profile aliases win
          prof.copy(aliases = reg ++ prof.aliases))
      }
    }
  }

  /** Resolve a `--profile-id` selector against a profile directory
    * (reference resolve_profile_id_in_directory, profile.rs:371-407):
    * scan `*.yaml` in sorted order, pick the first whose profile_id
    * matches; a matching profile with a broken registry surfaces
    * E_PROFILE_REGISTRY rather than being skipped. */
  def resolveId(selector: String, dir: String): Either[Outcome.Refused, Profile] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d))
      return Left(Outcome.Refused(RefusalCode.ProfileNotFound,
        s"profile directory not found: $dir", Seq(s"selector=$selector"),
        "Next: create the profile directory or pass --profile <path>."))
    val yamls = listDir(d)
      .filter(_.toString.endsWith(".yaml")).sortBy(_.toString)
    for (path <- yamls) {
      val prof = parse(new String(Files.readAllBytes(path), "UTF-8"))
      if (prof.profileId.contains(selector)) {
        return prof.columnRegistry match {
          case None => Right(prof)
          case Some(ref) => loadRegistry(path, ref).map(reg =>
            prof.copy(aliases = reg ++ prof.aliases))
        }
      }
    }
    Left(Outcome.Refused(RefusalCode.ProfileNotFound,
      s"no profile with profile_id '$selector' in $dir", Seq.empty,
      "Next: check the selector or the profile directory."))
  }

  /** Load a column_registry directory (reference load_column_registry,
    * profile.rs:424-470): `registry.json` must exist and be a JSON object;
    * every other `*.json` is a mapping file — an array of
    * `{"canonical_type":"column_name","canonical":c,"aliases":[...]}`
    * entries. Any violation is E_PROFILE_REGISTRY naming the file. */
  def loadRegistry(profilePath: java.nio.file.Path, reference: String)
      : Either[Outcome.Refused, Map[String, String]] = {
    def refuse(reason: String, file: Option[String]) =
      Left(Outcome.Refused(RefusalCode.ProfileRegistry,
        s"column_registry '$reference': $reason",
        file.map(f => s"file=$f").toSeq,
        "Next: repair the registry directory or drop column_registry from the profile."))
    val base = Option(profilePath.getParent).getOrElse(Paths.get("."))
    val root = base.resolve(reference).normalize()
    if (!Files.isDirectory(root))
      return refuse("registry directory does not exist or is not a directory", None)
    val regJson = root.resolve("registry.json")
    if (!Files.exists(regJson))
      return refuse("registry.json is missing", Some("registry.json"))
    val regBody = new String(Files.readAllBytes(regJson), "UTF-8").trim
    if (!(regBody.startsWith("{") && regBody.endsWith("}")))
      return refuse("registry.json must be a JSON object", Some("registry.json"))
    val aliases = Map.newBuilder[String, String]
    val mappingFiles = listDir(root)
      .filter(p => p.toString.endsWith(".json") && p.getFileName.toString != "registry.json")
      .sortBy(_.toString)
    for (mf <- mappingFiles) {
      val body = new String(Files.readAllBytes(mf), "UTF-8").trim
      if (!(body.startsWith("[") && body.endsWith("]")))
        return refuse("mapping file is not a registry entry array",
          Some(mf.getFileName.toString))
      // parse each {...} block's keys INDEPENDENTLY — JSON objects are
      // unordered, so a valid entry written canonical-first must load the
      // same as canonical_type-first (round-2 ADVICE: the old single regex
      // required one exact key order and silently dropped the rest)
      val objRe = """\{[^{}]*\}""".r
      val ctRe = """"canonical_type"\s*:\s*"([^"]*)"""".r
      val canRe = """"canonical"\s*:\s*"([^"]*)"""".r
      val alRe = """"aliases"\s*:\s*\[([^\]]*)\]""".r
      val blocks = objRe.findAllMatchIn(body).map(_.matched).toSeq
      if (blocks.isEmpty && body != "[]")
        return refuse("mapping file is not a registry entry array",
          Some(mf.getFileName.toString))
      for (block <- blocks) {
        (ctRe.findFirstMatchIn(block).map(_.group(1)),
          canRe.findFirstMatchIn(block).map(_.group(1)),
          alRe.findFirstMatchIn(block).map(_.group(1))) match {
          case (Some(t), Some(canonical), Some(arr)) =>
            if (t == "column_name")
              """"([^"]*)"""".r.findAllMatchIn(arr)
                .foreach(a => aliases += (a.group(1) -> canonical))
          case _ =>
            // genuinely malformed entry (a required key is missing)
            return refuse("registry entry is missing canonical_type/canonical/aliases",
              Some(mf.getFileName.toString))
        }
      }
    }
    Right(aliases.result())
  }

  /** True iff every string in the profile survives the hand-rolled
    * unquoted-YAML round-trip: the renderer has no quoting, so a name
    * containing ':' or '#' (or edge whitespace / newlines) would parse
    * back DIFFERENTLY — callers must fall back to referencing the
    * original profile rather than store a silently-diverging copy. */
  def renderableResolved(p: Profile): Boolean = {
    def ok(s: String): Boolean = s.nonEmpty && s == s.trim &&
      !s.exists(c => c == ':' || c == '#' || c == '\n' || c == '\r')
    p.key.forall(ok) && p.includeColumns.forall(_.forall(ok)) &&
      p.aliases.forall { case (a, b) => ok(a) && ok(b) }
  }

  /** Canonical YAML of a RESOLVED profile: column_registry aliases folded
    * in, selector/registry fields dropped — what a diff capsule stores so
    * replay never needs the original registry directory or profile-id
    * lookup to exist. Aliases render sorted → deterministic bytes; the
    * output round-trips through [[parse]] ONLY for profiles passing
    * [[renderableResolved]]. */
  def renderResolved(p: Profile): String = {
    val sb = new StringBuilder
    sb ++= "# resolved profile (registry aliases folded in; selectors dropped)\n"
    p.key.foreach(k => sb ++= s"key: $k\n")
    p.includeColumns.foreach { inc =>
      sb ++= "include_columns:\n"
      inc.foreach(c => sb ++= s"  - $c\n")
    }
    if (p.aliases.nonEmpty) {
      sb ++= "aliases:\n"
      p.aliases.toSeq.sortBy(_._1).foreach { case (f, t) => sb ++= s"  $f: $t\n" }
    }
    sb.toString
  }

  /** Rename alias columns to their canonical names (the registry/alias
    * application point; unknown aliases are ignored, canonical collisions
    * keep the existing column). */
  def applyAliases(df: org.apache.spark.sql.DataFrame, profile: Profile)
      : org.apache.spark.sql.DataFrame =
    profile.aliases.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from) && !d.columns.contains(to))
        d.withColumnRenamed(from, to)
      else d
    }

  /** Resolve the active key: explicit key vs profile key must agree. */
  def resolveKey(explicit: Option[String], profile: Profile): Either[Outcome.Refused, Option[String]] =
    (explicit, profile.key) match {
      case (Some(a), Some(b)) if a != b =>
        Left(Outcome.Refused(RefusalCode.KeyConflict,
          s"explicit key '$a' conflicts with profile key '$b'",
          Seq(s"explicit=$a", s"profile=$b"),
          "Next: drop one of the two key selections."))
      case (a, b) => Right(a.orElse(b))
    }

  /** Scope a DiffConfig: restrict to include_columns (unknown names are
    * silently ignored, matching the reference), never the key. */
  def scope(cfg: DiffConfig, profile: Profile): DiffConfig =
    profile.includeColumns match {
      case None => cfg
      case Some(inc) =>
        val allow = inc.toSet
        cfg.copy(
          numericCols = cfg.numericCols.filter(allow.contains),
          textCols = cfg.textCols.filter(allow.contains))
    }
}
