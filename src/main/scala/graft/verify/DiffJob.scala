package graft.verify

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Verifier configuration (the grafted analogue of rvl's CLI args +
  * profile: /root/reference/src/cli/args.rs, src/profile.rs). */
final case class DiffConfig(
    key: String = "url",
    numericCols: Seq[String] = Seq.empty,
    textCols: Seq[String] = Seq.empty,
    tolerance: Double = 0.0,
    threshold: Double = 0.95,
    maxContributors: Int = 25,
    exhaustive: Boolean = false,
    maxAuditChanges: Long = 10000L,
    autoTypes: Boolean = false, // classify common columns per rvl op 12
    alignMode: String = "key", // "key" | "row_order" (set by runRowOrder)
    explicit: Boolean = false) // raw values in reports (default: redacted)

/** The rvl-semantics keyed diff, re-expressed Spark-first.
  *
  * One full-outer shuffle join by key feeds every check; evidence lists are
  * tiny and explicitly sorted (Spark shuffles are unordered — determinism is
  * re-imposed, SURVEY §4). The reference's single-threaded pass
  * (/root/reference/src/orchestrator.rs:606-1054) becomes:
  *
  *   key-health aggs → full-outer join → long-format per-cell projection →
  *   global agg (decimal L1 sum — exact, order-independent) +
  *   TakeOrderedAndProject top-25 → driver coverage decision.
  *
  * Refusal precedence follows the reference: E_KEY_EMPTY → E_KEY_DUP →
  * E_KEY_MISMATCH → E_NO_NUMERIC → E_MIXED_TYPES → E_MISSINGNESS →
  * verdict (E_DIFFUSE / E_AUDIT_LIMIT inside the verdict path).
  * Top-K tie-break: (contribution desc, key asc, column asc) — the
  * distributable total order PLAN_RVL.md:541-543 names canonical; the
  * reference's arrival-order counter (src/diff/order.rs:69-79) does not
  * distribute and is intentionally replaced.
  */
object DiffJob {

  private val isMissingUdf = udf((s: String) => Missing.isMissing(s))

  def run(spark: SparkSession, ref: DataFrame, got: DataFrame, cfg: DiffConfig): Outcome = {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val k = cfg.key

    if (!cfg.autoTypes && cfg.numericCols.isEmpty && cfg.textCols.isEmpty)
      return Outcome.Refused(RefusalCode.NoNumeric,
        "no numeric or text columns in scope",
        Seq.empty,
        "Next: pass at least one column in DiffConfig.numericCols or textCols.")

    // E_NO_KEY: the key column must exist on both sides (reference op 18/19
    // gate — key index lookup per side, orchestrator.rs run_key_mode)
    for ((side, df) <- Seq("reference" -> ref, "pipeline" -> got))
      if (!df.columns.contains(k))
        return Outcome.Refused(RefusalCode.NoKey,
          s"key column '$k' not found on the $side side (columns: ${df.columns.mkString(", ")})",
          Seq(s"side=$side"),
          s"Next: pass an existing column as the key.")

    // ---- key health (E_KEY_EMPTY / E_KEY_DUP), ref side first ------------
    // ONE groupBy per side yields both checks (null/blank keys group too),
    // instead of separate empties + dups scans — one pass per side at scale
    for ((side, df) <- Seq("reference" -> ref, "pipeline" -> got)) {
      val keyCol = trimKey(col(k))
      val keyGroups = df.groupBy(
          when(col(k).isNull || keyCol === "", lit(null)).otherwise(keyCol).as("k"))
        .count().cache()
      try {
        val emptiesRow = keyGroups.filter($"k".isNull).collect()
        if (emptiesRow.nonEmpty) {
          val empties = emptiesRow.head.getLong(1)
          return Outcome.Refused(RefusalCode.KeyEmpty,
            s"$side side has $empties empty key value(s) in column '$k'",
            Seq(s"side=$side", s"count=$empties"),
            s"Next: drop or repair rows with empty '$k' before diffing.")
        }
        val dups = keyGroups.filter($"count" > 1)
        val dupSample = dups.orderBy($"k").limit(10).collect()
        if (dupSample.nonEmpty) {
          val total = dups.count()
          return Outcome.Refused(RefusalCode.KeyDup,
            s"$side side has $total duplicated key value(s) in column '$k'; first: ${dupSample.head.getString(0)} (${dupSample.head.getLong(1)} occurrences)",
            dupSample.map(r => s"${r.getString(0)} x${r.getLong(1)}").toSeq,
            s"Next: deduplicate '$k' on the $side side (every url must be unique).")
        }
      } finally keyGroups.unpersist()
    }

    // ---- align: one full-outer join by key ------------------------------
    val refCols =
      if (cfg.autoTypes) ref.columns.filter(c => c != k && got.columns.contains(c)).toSeq
      else (cfg.numericCols ++ cfg.textCols).distinct
    if (refCols.isEmpty)
      return Outcome.Refused(RefusalCode.NoNumeric,
        "no common columns besides the key",
        Seq.empty, "Next: align the two schemas.")
    val refSel = ref.select((trimKey(col(k)).as(k) +: refCols.map(c => col(c).as(s"ref_$c"))): _*)
    val gotSel = got.select((trimKey(col(k)).as(k) +: refCols.map(c => col(c).as(s"got_$c"))): _*)
    val joined = refSel
      .withColumn("in_ref", lit(1))
      .join(gotSel.withColumn("in_got", lit(1)), Seq(k), "full_outer")
      .cache()

    try {
      // ---- key-set comparison (E_KEY_MISMATCH) --------------------------
      val missingInGot = joined.filter($"in_got".isNull)
      val extraInGot = joined.filter($"in_ref".isNull)
      val nMissing = missingInGot.count()
      val nExtra = extraInGot.count()
      if (nMissing > 0 || nExtra > 0) {
        val sampleMissing = missingInGot.select(k).orderBy(col(k)).limit(10)
          .as[String].collect()
        val sampleExtra = extraInGot.select(k).orderBy(col(k)).limit(10)
          .as[String].collect()
        return Outcome.Refused(RefusalCode.KeyMismatch,
          s"key sets differ: $nMissing key(s) missing from pipeline side, $nExtra extra",
          sampleMissing.map(u => s"missing: $u").toSeq ++ sampleExtra.map(u => s"extra: $u"),
          s"Next: run both sides on the same snapshot of '$k' values.")
      }

      val rowsRef = ref.count()
      val rowsGot = got.count()
      val rowsAligned = rowsRef // sets equal ⇒ aligned = either side

      // ---- column typing (op 12, detect_numeric_columns semantics):
      // a common column is numeric iff no non-missing cell fails the parse
      // and at least one aligned pair parses on both sides; a column with
      // BOTH parses and non-numeric cells is E_MIXED_TYPES with the first
      // offender by key order (columns.rs:136-275)
      val (numericCols: Seq[String], textCols: Seq[String]) =
        if (!cfg.autoTypes) (cfg.numericCols, cfg.textCols)
        else {
          // ONE aggregation pass types every column at once (a per-column
          // loop would rescan the aligned data N_cols times — a non-starter
          // at 10^12 rows; rvl's single in-memory pass becomes a single
          // distributed pass)
          val numeric = Seq.newBuilder[String]
          val textB = Seq.newBuilder[String]
          def sideExprs(p: String, c: String, t: org.apache.spark.sql.types.DataType)
              : Option[(Column, Column)] = t match { // (parses, badCell)
            case StringType =>
              val raw = col(s"${p}_$c")
              val parsed = call_function("rvl_parse", raw)
              Some((parsed.isNotNull, !isMissingUdf(raw) && parsed.isNull))
            case _: org.apache.spark.sql.types.NumericType =>
              Some((col(s"${p}_$c").isNotNull, lit(false)))
            case _ => None // dates/bools/etc diff as text
          }
          val classifiable = refCols.flatMap { c =>
            (sideExprs("ref", c, refSel.schema(s"ref_$c").dataType),
              sideExprs("got", c, gotSel.schema(s"got_$c").dataType)) match {
              case (Some((pr, br)), Some((pg, bg))) => Some((c, pr, br, pg, bg))
              case _ => textB += c; None
            }
          }
          if (classifiable.nonEmpty) {
            val aggs = classifiable.flatMap { case (c, pr, br, pg, bg) => Seq(
              sum((pr && pg).cast("long")).as(s"np_$c"),
              sum(pr.cast("long") + pg.cast("long")).as(s"na_$c"),
              sum((br || bg).cast("long")).as(s"nb_$c"),
              min(when(br || bg, col(k))).as(s"fb_$c"))
            }
            val row = joined.filter($"in_ref".isNotNull && $"in_got".isNotNull)
              .agg(aggs.head, aggs.tail: _*).collect()(0)
            def long(n: String) = { val i = row.fieldIndex(n); if (row.isNullAt(i)) 0L else row.getLong(i) }
            for ((c, _, _, _, _) <- classifiable) {
              val nBad = long(s"nb_$c")
              if (long(s"na_$c") > 0 && nBad > 0)
                return Outcome.Refused(RefusalCode.MixedTypes,
                  s"column '$c' mixes numeric and non-numeric values; first offender at key ${row.getString(row.fieldIndex(s"fb_$c"))}",
                  Seq(s"column=$c", s"key=${row.getString(row.fieldIndex(s"fb_$c"))}", s"non_numeric_cells=$nBad"),
                  "Next: clean the column or exclude it from the scope.")
              else if (long(s"np_$c") > 0) numeric += c
              else textB += c
            }
          }
          (numeric.result(), textB.result())
        }

      // ---- per-cell long format for numeric columns ---------------------
      // (string-typed numeric columns go through the rvl finance parse;
      //  unparseable non-missing cells are E_MIXED_TYPES evidence)
      def cellExprs(c: String): (Column, Column, Column, Column) = {
        val refT = refSel.schema(s"ref_$c").dataType
        val gotT = gotSel.schema(s"got_$c").dataType
        def side(prefix: String, t: org.apache.spark.sql.types.DataType): (Column, Column) =
          t match {
            case StringType =>
              // codegen'd native expression (graft.functions.RvlNumericParse)
              val raw = col(s"${prefix}_$c")
              val parsed = call_function("rvl_parse", raw)
              (parsed, !isMissingUdf(raw) && parsed.isNull)
            case _ => (col(s"${prefix}_$c").cast(DoubleType), lit(false))
          }
        val (refV, refBad) = side("ref", refT)
        val (gotV, gotBad) = side("got", gotT)
        (refV, gotV, refBad, gotBad)
      }

      val numericLong: Option[DataFrame] =
        if (numericCols.isEmpty) None
        else Some(numericCols.zipWithIndex.map { case (c, i) =>
          val (refV, gotV, refBad, gotBad) = cellExprs(c)
          joined.select(
            col(k),
            lit(i).as("col_ord"),
            lit(c).as("column"),
            refV.as("old"),
            gotV.as("new"),
            (refBad || gotBad).as("mixed"))
        }.reduce(_ unionAll _))

      for (cells <- numericLong) {
        // E_MIXED_TYPES: deterministic first offender (col order, key asc)
        val mixedFirst = cells.filter($"mixed")
          .orderBy($"col_ord", col(k)).limit(1).collect()
        if (mixedFirst.nonEmpty) {
          val r = mixedFirst.head
          return Outcome.Refused(RefusalCode.MixedTypes,
            s"column '${r.getAs[String]("column")}' holds a non-numeric value at key ${r.getAs[String](k)}",
            Seq(s"key=${r.getAs[String](k)}", s"column=${r.getAs[String]("column")}"),
            "Next: exclude the column from numericCols or fix the producer.")
        }
        // E_MISSINGNESS: numeric-vs-missing in an aligned cell
        val missFirst = cells.filter($"old".isNull =!= $"new".isNull)
          .orderBy($"col_ord", col(k)).limit(1).collect()
        if (missFirst.nonEmpty) {
          val r = missFirst.head
          val side = if (r.isNullAt(r.fieldIndex("old"))) "reference" else "pipeline"
          return Outcome.Refused(RefusalCode.Missingness,
            s"column '${r.getAs[String]("column")}' is missing on the $side side at key ${r.getAs[String](k)} but numeric on the other",
            Seq(s"key=${r.getAs[String](k)}", s"column=${r.getAs[String]("column")}", s"missing_side=$side"),
            "Next: make missingness agree, or exclude the column.")
        }
      }

      // ---- tolerance + L1 + top-K --------------------------------------
      val changedCells = numericLong.map { cells =>
        cells.filter($"old".isNotNull && $"new".isNotNull)
          .withColumn("delta", $"new" - $"old")
          .withColumn("abs_delta", abs($"delta"))
          .withColumn("contribution",
            when($"abs_delta" <= cfg.tolerance, 0.0).otherwise($"abs_delta"))
      }

      val (totalChange, maxAbsDelta, cellsChanged) = changedCells match {
        case Some(cells) =>
          // decimal sum: exact, associative ⇒ REAL/NO-REAL can't flip with
          // partitioning (SURVEY §7.5 hard-part 3)
          val aggRow = cells.agg(
            sum($"contribution".cast(DecimalType(38, 12))).as("total"),
            max($"abs_delta").as("max_abs"),
            sum(when($"contribution" > 0.0, 1L).otherwise(0L)).as("n_changed")).collect()(0)
          val total = Option(aggRow.getDecimal(0)).map(_.doubleValue()).getOrElse(0.0)
          val maxAbs = if (aggRow.isNullAt(1)) 0.0 else aggRow.getDouble(1)
          val nChanged = if (aggRow.isNullAt(2)) 0L else aggRow.getLong(2)
          (total, maxAbs, nChanged)
        case None => (0.0, 0.0, 0L)
      }

      // ---- field audit (byte-identical text per key) --------------------
      val fieldChangedDf = if (textCols.isEmpty) None else Some(
        textCols.zipWithIndex.map { case (c, i) =>
          joined.select(col(k), lit(i).as("col_ord"), lit(c).as("column"),
            col(s"ref_$c").cast(StringType).as("old_s"),
            col(s"got_$c").cast(StringType).as("new_s"))
        }.reduce(_ unionAll _)
          .filter(!(col("old_s") <=> col("new_s"))))

      val nFieldChanges = fieldChangedDf.map(_.count()).getOrElse(0L)
      if (nFieldChanges > cfg.maxAuditChanges)
        return Outcome.Refused(RefusalCode.AuditLimit,
          s"$nFieldChanges text cells differ (limit ${cfg.maxAuditChanges})",
          Seq(s"count=$nFieldChanges"),
          s"Next: rerun with a higher maxAuditChanges, or fix the producer first.")

      val fieldChanges: Seq[FieldChange] = fieldChangedDf match {
        case Some(df) =>
          df.orderBy($"col_ord", col(k)).limit(cfg.maxAuditChanges.toInt)
            .collect()
            .map(r => FieldChange(r.getAs[String](k), r.getAs[String]("column"),
              r.getAs[String]("old_s"), r.getAs[String]("new_s")))
            .toSeq
        case None => Seq.empty
      }

      val counts = DiffCounts(
        rowsRef = rowsRef,
        rowsGot = rowsGot,
        rowsAligned = rowsAligned,
        numericColumns = numericCols.size,
        textColumns = textCols.size,
        cellsChecked = rowsAligned * (numericCols.size + textCols.size),
        cellsChanged = cellsChanged + nFieldChanges)

      // ---- verdict ------------------------------------------------------
      if (totalChange == 0.0 && fieldChanges.isEmpty)
        return Outcome.NoRealChange(counts, maxAbsDelta, cfg.tolerance)

      // exhaustive mode: every changed cell (guarded), coverage := 1.0
      if (cfg.exhaustive) {
        val all = changedCells.map { cells =>
          val n = cells.filter($"contribution" > 0.0).count()
          if (n + nFieldChanges > cfg.maxAuditChanges)
            return Outcome.Refused(RefusalCode.AuditLimit,
              s"${n + nFieldChanges} changed cells (limit ${cfg.maxAuditChanges})",
              Seq(s"count=${n + nFieldChanges}"),
              "Next: raise maxAuditChanges or narrow the column scope.")
          collectContributors(cells, totalChange, Int.MaxValue, k)
        }.getOrElse(Seq.empty)
        return Outcome.RealChange(counts, totalChange, maxAbsDelta, 1.0, all, fieldChanges)
      }

      val top = changedCells
        .map(cells => collectContributors(cells, totalChange, cfg.maxContributors, k))
        .getOrElse(Seq.empty)

      if (totalChange > 0.0) {
        val topCoverage = top.map(_.contribution).sum / totalChange
        if (topCoverage < cfg.threshold)
          return Outcome.Refused(RefusalCode.Diffuse,
            f"change is diffuse: top ${cfg.maxContributors} cover ${topCoverage * 100}%.1f%% < ${cfg.threshold * 100}%.1f%%",
            Seq(f"top_k_coverage=$topCoverage%.6f"),
            "Next: rerun with exhaustive=true to list every changed cell.")
        // smallest prefix reaching the threshold
        val cut = top.indexWhere(_.cumulativeShare >= cfg.threshold)
        val chosen = if (cut < 0) top else top.take(cut + 1)
        Outcome.RealChange(counts, totalChange, maxAbsDelta,
          chosen.lastOption.map(_.cumulativeShare).getOrElse(1.0), chosen, fieldChanges)
      } else {
        // numeric total zero but text differs: field-change-only verdict
        Outcome.RealChange(counts, totalChange, maxAbsDelta, 1.0, Seq.empty, fieldChanges)
      }
    } finally joined.unpersist()
  }

  /** Byte-exact ASCII trim via the codegen'd native expression (never
    * Spark's `trim`, which strips more than 0x20/0x09). Numeric/any-typed
    * keys are cast to string first — `--key id` on an integer column must
    * diff normally, not throw an AnalysisException. */
  private def trimKey(c: Column): Column =
    call_function("ascii_trim", c.cast("string"))

  /** Synthetic positional key: zero-padded so lexicographic string order ==
    * numeric row order (the contributor sort stays canonical). */
  val RowKey = "__rvl_row"

  private def withRowIndex(df: DataFrame): DataFrame = {
    val schema = df.schema.add(RowKey, StringType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ f"${i + 1}%012d")
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Row-order mode (reference ops 22+24, orchestrator.rs:515-591 +
    * alignment/shuffle.rs): pair rows by position; refuse E_ROWCOUNT on
    * length mismatch (suggesting up to 3 discovered keys); after the diff,
    * if total change > 0 and any PERFECT key candidate's value sequence
    * differs between the sides, VETO the verdict with E_NEED_KEY — never
    * print a positional verdict the evidence contradicts
    * (docs/PLAN_RVL.md:203-205). Requires inputs with a defined row order
    * (single-partition or explicitly ordered upstream). */
  def runRowOrder(spark: SparkSession, ref: DataFrame, got: DataFrame,
      cfg: DiffConfig): Outcome = {
    val nRef = ref.count()
    val nGot = got.count()
    if (nRef != nGot) {
      val suggested = KeyDiscovery.discover(ref, got).take(3).map(_.name)
      return Outcome.Refused(RefusalCode.RowCount,
        s"row counts differ: reference=$nRef pipeline=$nGot",
        suggested.map(n => s"suggested_key=$n"),
        if (suggested.nonEmpty)
          s"Next: rerun in key mode with one of: ${suggested.mkString(", ")}."
        else "Next: align the inputs or rerun in key mode.")
    }
    val refIdx = withRowIndex(ref)
    val gotIdx = withRowIndex(got)
    val outcome = run(spark, refIdx, gotIdx,
      cfg.copy(key = RowKey, alignMode = "row_order"))
    outcome match {
      case rc: Outcome.RealChange if rc.totalChange > 0 || rc.fieldChanges.nonEmpty =>
        val candidates = KeyDiscovery.discover(ref, got)
        if (KeyDiscovery.detectShuffle(refIdx, gotIdx, candidates, RowKey)) {
          val suggested = candidates.take(3).map(_.name)
          Outcome.Refused(RefusalCode.NeedKey,
            "rows appear reordered: a positional verdict would be misleading",
            suggested.map(n => s"suggested_key=$n"),
            s"Next: rerun in key mode with one of: ${suggested.mkString(", ")}.")
        } else rc
      case o => o
    }
  }

  /** Top-K by the canonical total order, shares computed on the driver. */
  private def collectContributors(
      cells: DataFrame, total: Double, limit: Int, k: String): Seq[Contributor] = {
    import cells.sparkSession.implicits._
    val rows =
      (if (limit == Int.MaxValue)
        cells.filter($"contribution" > 0.0)
          .orderBy($"contribution".desc, col(k), $"column").collect()
      else
        cells.filter($"contribution" > 0.0)
          .orderBy($"contribution".desc, col(k), $"column").limit(limit).collect())
    var cum = 0.0
    rows.toSeq.map { r =>
      val contribution = r.getAs[Double]("contribution")
      val share = if (total == 0.0) 0.0 else contribution / total
      cum += share
      Contributor(
        url = r.getAs[String](k),
        column = r.getAs[String]("column"),
        oldValue = Option(r.getAs[java.lang.Double]("old")).map(_.doubleValue()),
        newValue = Option(r.getAs[java.lang.Double]("new")).map(_.doubleValue()),
        delta = r.getAs[Double]("delta"),
        contribution = contribution,
        share = share,
        cumulativeShare = cum)
    }
  }
}
