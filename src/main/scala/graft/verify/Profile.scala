package graft.verify

import graft.core.{Outcome, RefusalCode}
import java.nio.file.{Files, Paths}

/** Profile scoping (reference op 41, src/profile.rs): a small hand-rolled
  * YAML subset — `include_columns` (list), `key` (single), `aliases`
  * (exact map) — that restricts the diff's column scope. Conflict rules
  * kept from the reference: an explicitly passed key that disagrees with
  * the profile's key is E_KEY_CONFLICT (never silently resolved); a
  * missing profile file is E_PROFILE_NOT_FOUND; unknown include_columns
  * are silently ignored (docs/PLAN_RVL.md:755-761 discipline).
  */
final case class Profile(
    includeColumns: Option[Seq[String]],
    key: Option[String],
    aliases: Map[String, String])

object Profile {

  def parse(text: String): Profile = {
    var include: Option[Vector[String]] = None
    var key: Option[String] = None
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
          (section, k.trim, v.trim) match {
            case (_, "key", value) if value.nonEmpty => key = Some(value)
            case ("aliases", from, to) if to.nonEmpty => aliases += (from -> to)
            case _ =>
          }
        }
      }
    }
    Profile(include, key, aliases.result())
  }

  def load(path: String): Either[Outcome.Refused, Profile] = {
    val p = Paths.get(path)
    if (!Files.exists(p))
      Left(Outcome.Refused(RefusalCode.ProfileNotFound,
        s"profile file not found: $path", Seq.empty,
        "Next: check the profile path."))
    else Right(parse(new String(Files.readAllBytes(p), "UTF-8")))
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
