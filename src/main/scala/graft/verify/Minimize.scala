package graft.verify

import graft.core.Outcome
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Repro minimization (reference op 40, src/repro/minimize.rs:44-128):
  * deterministically select ≤64 rows / ≤16 columns that reproduce a
  * REAL_CHANGE outcome — contributor rows first, field-change rows next,
  * contributing columns first, the key always kept. The minimized pair is
  * a tiny failing fixture for bug reports; `MinimizeSpec` asserts it
  * reproduces the same leading contributor.
  */
object Minimize {

  val MaxRows = 64
  val MaxCols = 16

  final case class Minimized(ref: DataFrame, got: DataFrame, urls: Seq[String], cols: Seq[String])

  def apply(spark: SparkSession, ref: DataFrame, got: DataFrame,
      cfg: DiffConfig, outcome: Outcome.RealChange): Minimized = {
    val urls = (outcome.contributors.map(_.url) ++ outcome.fieldChanges.map(_.url))
      .distinct.take(MaxRows)
    val contributingCols =
      (outcome.contributors.map(_.column) ++ outcome.fieldChanges.map(_.column)).distinct
    val rest = (cfg.numericCols ++ cfg.textCols).filterNot(contributingCols.contains)
    val cols = (contributingCols ++ rest).take(MaxCols - 1)

    def shrink(df: DataFrame): DataFrame =
      df.filter(col(cfg.key).isin(urls: _*))
        .select((cfg.key +: cols).map(col): _*)

    Minimized(shrink(ref), shrink(got), urls, cols)
  }

  /** Shrunken DiffConfig matching the minimized column set. */
  def scopedConfig(cfg: DiffConfig, m: Minimized): DiffConfig =
    cfg.copy(
      numericCols = cfg.numericCols.filter(m.cols.contains),
      textCols = cfg.textCols.filter(m.cols.contains))
}
