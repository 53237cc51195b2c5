package graft.verify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key discovery (reference op 23, src/alignment/key_discovery.rs:83-149):
  * a candidate key is a column present on both sides whose values are all
  * non-empty (post ASCII-trim) and unique per side; PERFECT if the two
  * sides' value sets are equal. Ordered perfect-first, then header order.
  * Advisory only — never auto-selected (the reference's rule).
  *
  * Distributed re-expression: one aggregation per side computes per-column
  * (rows, distinct, empties); set equality uses an order-independent
  * bit_xor of value hashes over the DISTINCT values — no all-pairs join.
  */
object KeyDiscovery {

  sealed trait Kind
  case object Perfect extends Kind
  case object Joinable extends Kind

  final case class Candidate(name: String, kind: Kind)

  private def trimmed(c: String) =
    regexp_replace(col(c).cast("string"), "^[ \\t]+|[ \\t]+$", "")

  /** Per-column stats for one side: (rows, nDistinct, nEmpty, xorHash) —
    * ONE aggregation pass over all candidate columns (a per-column loop
    * would rescan the side N_cols times). */
  private def stats(df: DataFrame, cols: Seq[String]): Map[String, (Long, Long, Long, Long)] = {
    if (cols.isEmpty) return Map.empty
    val proj = df.select(cols.zipWithIndex.map { case (c, i) => trimmed(c).as(s"v_$i") }: _*)
    val aggs = count(lit(1)).as("n") +: cols.indices.flatMap { i =>
      val v = col(s"v_$i")
      Seq(
        countDistinct(v).as(s"nd_$i"),
        sum((v.isNull || v === "").cast("long")).as(s"ne_$i"),
        expr(s"bit_xor(distinct xxhash64(v_$i))").as(s"xh_$i"))
    }
    val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
    def l(name: String) = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) 0L else row.getLong(i)
    }
    val n = l("n")
    cols.zipWithIndex.map { case (c, i) =>
      c -> (n, l(s"nd_$i"), l(s"ne_$i"), l(s"xh_$i"))
    }.toMap
  }

  def discover(ref: DataFrame, got: DataFrame): Seq[Candidate] = {
    val common = ref.columns.filter(got.columns.contains(_)).toSeq
    if (common.isEmpty) return Seq.empty
    val refStats = stats(ref, common)
    val gotStats = stats(got, common)
    val all = common.flatMap { c =>
      val (rn, rd, re, rx) = refStats(c)
      val (gn, gd, ge, gx) = gotStats(c)
      val joinableRef = re == 0 && rd == rn && rn > 0
      val joinableGot = ge == 0 && gd == gn && gn > 0
      if (joinableRef && joinableGot) {
        // equal distinct counts + equal xor-of-hashes ⇒ equal value sets
        val perfect = rd == gd && rx == gx
        Some(Candidate(c, if (perfect) Perfect else Joinable))
      } else None
    }
    all.filter(_.kind == Perfect) ++ all.filter(_.kind == Joinable)
  }

  /** Shuffle detection (reference op 24, src/alignment/shuffle.rs:28-58):
    * true when any PERFECT candidate's value SEQUENCE differs between the
    * two position-indexed sides. */
  def detectShuffle(refIdx: DataFrame, gotIdx: DataFrame,
      candidates: Seq[Candidate], indexCol: String): Boolean = {
    val perfect = candidates.filter(_.kind == Perfect)
    perfect.exists { cand =>
      val a = refIdx.select(col(indexCol), trimmed(cand.name).as("va"))
      val b = gotIdx.select(col(indexCol), trimmed(cand.name).as("vb"))
      a.join(b, indexCol)
        .filter(!(col("va") <=> col("vb")))
        .limit(1).count() > 0
    }
  }
}
