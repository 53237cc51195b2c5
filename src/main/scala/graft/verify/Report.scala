package graft.verify

import graft.core._

/** Output renderers (reference ops 34/35: src/output/human/header.rs,
  * real_change.rs, no_real.rs, refusal.rs and src/output/json.rs). Same
  * discipline: a fixed header block, one body per outcome, a machine
  * envelope `graft.v0` with stable field order — and the reference's
  * REDACTION DEFAULT (real_change.rs:34-120): raw cell values and field
  * text appear only under `explicit`; the default shows direction and
  * share-of-change, because on a PII pipeline the changed values are
  * exactly the data that was scrubbed.
  */
object Report {

  private def rowOrder(cfg: DiffConfig): Boolean = cfg.alignMode == "row_order"

  def human(outcome: Outcome, cfg: DiffConfig): String = {
    val sb = new StringBuilder
    if (rowOrder(cfg)) {
      sb ++= "graft verify — row-order diff (positional)\n"
      sb ++= "Alignment: row-order; contributor ids are 1-based row indexes\n"
    } else {
      sb ++= "graft verify — keyed diff by '" + cfg.key + "'\n"
      sb ++= s"Alignment: key (${cfg.key})\n"
    }
    // prefer the outcome's detected counts (auto-typed runs resolve the
    // column scope only after classification)
    val (nNum, nText) = outcome match {
      case Outcome.NoRealChange(c, _, _) => (c.numericColumns, c.textColumns)
      case Outcome.RealChange(c, _, _, _, _, _) => (c.numericColumns, c.textColumns)
      case _ => (cfg.numericCols.size, cfg.textCols.size)
    }
    sb ++= s"Columns: ${nNum + nText} in scope ($nNum numeric, $nText text)\n"
    sb ++= s"Settings: tolerance ${Fmt.floatShortest(cfg.tolerance)}, " +
      s"threshold ${Fmt.percent1(cfg.threshold)}, " +
      s"max contributors ${cfg.maxContributors}\n"

    outcome match {
      case Outcome.NoRealChange(counts, maxAbs, tol) =>
        sb ++= s"Checked: ${Fmt.intCommas(counts.cellsChecked)} cells across " +
          s"${Fmt.intCommas(counts.rowsAligned)} aligned rows\n\n"
        sb ++= "NO REAL CHANGE\n"
        sb ++= s"Max abs delta: ${Fmt.floatShortest(maxAbs)} (<= tolerance ${Fmt.floatShortest(tol)})\n"

      case Outcome.RealChange(counts, total, maxAbs, coverage, contributors, fieldChanges) =>
        sb ++= s"Checked: ${Fmt.intCommas(counts.cellsChecked)} cells across " +
          s"${Fmt.intCommas(counts.rowsAligned)} aligned rows\n\n"
        sb ++= s"REAL CHANGE — ${contributors.size} contributor(s) cover " +
          s"${Fmt.percent1(coverage)} of total change ${Fmt.floatShortest(total)}\n"
        contributors.zipWithIndex.foreach { case (c, i) =>
          if (cfg.explicit)
            sb ++= f"${i + 1}%3d. ${Fmt.identHuman(c.url)} ${c.column} " +
              s"${c.oldValue.map(Fmt.floatShortest).getOrElse("-")} -> " +
              s"${c.newValue.map(Fmt.floatShortest).getOrElse("-")} " +
              s"(${Fmt.delta(c.delta)}, share ${Fmt.percent1(c.share)}, " +
              s"cum ${Fmt.percent1(c.cumulativeShare)})\n"
          else {
            // redacted: direction + share only (reference real_change.rs:66-80)
            val dir = if (c.delta > 0) "+" else if (c.delta < 0) "-" else "~"
            sb ++= f"${i + 1}%3d. ${Fmt.identHuman(c.url)} ${c.column} " +
              s"$dir${Fmt.percent1(c.share)} of total change " +
              s"(cum ${Fmt.percent1(c.cumulativeShare)})\n"
          }
        }
        if (fieldChanges.nonEmpty) {
          sb ++= s"Field changes: ${Fmt.intCommas(fieldChanges.size.toLong)}\n"
          fieldChanges.take(25).foreach { fc =>
            if (cfg.explicit)
              sb ++= s"  ${Fmt.identHuman(fc.url)} ${fc.column}: " +
                s"${Fmt.identHuman(fc.oldValue)} -> ${Fmt.identHuman(fc.newValue)}\n"
            else
              sb ++= s"  ${Fmt.identHuman(fc.url)} ${fc.column}: text differs\n"
          }
        }
        sb ++= s"Max abs delta: ${Fmt.floatShortest(maxAbs)}\n"
        if (!cfg.explicit)
          sb ++= "(values redacted; rerun with --explicit to print them)\n"

      case Outcome.Refused(code, message, detail, next) =>
        sb ++= "\n"
        sb ++= s"REFUSAL (${code.code}): ${code.reason}\n"
        sb ++= s"  $message\n"
        detail.take(10).foreach(d => sb ++= s"  - $d\n")
        sb ++= s"$next\n"
    }
    sb.result()
  }

  def json(outcome: Outcome, cfg: DiffConfig): String = {
    import Json._
    def countsJson(c: DiffCounts): String = obj(
      "rows_ref" -> c.rowsRef.toString,
      "rows_got" -> c.rowsGot.toString,
      "rows_aligned" -> c.rowsAligned.toString,
      "numeric_columns" -> c.numericColumns.toString,
      "text_columns" -> c.textColumns.toString,
      "cells_checked" -> c.cellsChecked.toString,
      "cells_changed" -> c.cellsChanged.toString)

    val common = Seq(
      "version" -> esc("graft.v0"),
      "mode" -> esc(cfg.alignMode)) ++
      (if (rowOrder(cfg)) Seq("contributor_id" -> esc("row_index"))
       else Seq("key" -> esc(cfg.key))) ++ Seq(
      "explicit" -> cfg.explicit.toString,
      "tolerance" -> num(cfg.tolerance),
      "threshold" -> num(cfg.threshold))

    val body = outcome match {
      case Outcome.NoRealChange(counts, maxAbs, _) => Seq(
        "outcome" -> esc("no_real_change"),
        "exit_code" -> "0",
        "counts" -> countsJson(counts),
        "max_abs_delta" -> num(maxAbs))
      case Outcome.RealChange(counts, total, maxAbs, coverage, contributors, fieldChanges) => Seq(
        "outcome" -> esc("real_change"),
        "exit_code" -> "1",
        "counts" -> countsJson(counts),
        "total_change" -> num(total),
        "max_abs_delta" -> num(maxAbs),
        "coverage" -> num(coverage),
        "contributors" -> arr(contributors.map { c =>
          val head = Seq(
            "url" -> esc(Fmt.identJson(c.url)),
            "column" -> esc(c.column))
          val values =
            if (cfg.explicit) Seq(
              "old" -> optNum(c.oldValue),
              "new" -> optNum(c.newValue),
              "delta" -> num(c.delta),
              "contribution" -> num(c.contribution))
            else Seq(
              "direction" -> esc(if (c.delta > 0) "+" else if (c.delta < 0) "-" else "~"))
          obj((head ++ values ++ Seq(
            "share" -> num(c.share),
            "cumulative_share" -> num(c.cumulativeShare))): _*)
        }),
        "field_changes" -> arr(fieldChanges.map { fc =>
          val head = Seq(
            "url" -> esc(Fmt.identJson(fc.url)),
            "column" -> esc(fc.column))
          val values =
            if (cfg.explicit) Seq("old" -> esc(fc.oldValue), "new" -> esc(fc.newValue))
            else Seq.empty
          obj((head ++ values): _*)
        }))
      case Outcome.Refused(code, message, detail, next) => Seq(
        "outcome" -> esc("refusal"),
        "exit_code" -> "2",
        "refusal" -> obj(
          "code" -> esc(code.code),
          "reason" -> esc(code.reason),
          "message" -> esc(message),
          "detail" -> arr(detail.map(esc)),
          "next" -> esc(next)))
    }
    obj((common ++ body): _*)
  }
}
