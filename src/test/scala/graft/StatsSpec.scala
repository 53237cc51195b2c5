package graft

import graft.queries.StatsQueries
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the corpus-stats additions
  * (largest-remainder holdout allocation, Heaps vocabulary-growth curve,
  * reproducibility export manifest) over sf0.001, plus the semantic
  * invariants the hash oracle can't state: the holdout allocation sums
  * EXACTLY to the budget; unigram types saturate while 3-gram types keep
  * growing (the flat-vs-growing fingerprint the audit exists to show);
  * the manifest conserves document mass and its xor digest is invariant
  * under row order. */
class StatsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String)] =
    graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang")
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  // -------------------------------------------------- holdout allocation

  test("q_holdout_alloc: largest-remainder exact; allocation sums to budget") {
    val all = graft.queries.Tables.documents(spark, dir)
      .select($"lang").collect().map(_.getString(0))
    val strata = all.groupBy(identity).map { case (l, xs) => l -> xs.length.toLong }
    val n = all.length.toLong
    val h = StatsQueries.HoldoutBudget
    val base = strata.map { case (l, c) => l -> (c * h / n) }
    val rem = strata.map { case (l, c) => l -> (c * h % n) }
    val seats = h - base.values.sum
    val ranked = rem.toSeq.sortBy { case (l, r) => (-r, l) }.map(_._1)
      .zipWithIndex.map { case (l, i) => l -> (i + 1L) }.toMap
    val expect = strata.map { case (l, c) =>
      val extra = if (ranked(l) <= seats) 1L else 0L
      (l, c, base(l), rem(l), extra, base(l) + extra)
    }.toSet
    val got = StatsQueries.qHoldoutAlloc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    assert(got.toSeq.map(_._6).sum === StatsQueries.HoldoutBudget,
      "allocation must sum exactly to the budget — the method's whole point")
    assert(got.exists(_._5 == 1L), "no remainder seat placed — floors exact?")
  }

  // ------------------------------------------------------- Heaps curve

  test("q_heaps_curve: driver replica exact; 3-gram types grow, unigrams flat") {
    val ordered = docs.sortBy(_._1)
    val expect = StatsQueries.HeapsPrefixes.map { p =>
      val prefix = ordered.filter(_._1 < p)
      val tokens = prefix.map { case (_, t, _) =>
        t.length - t.replace(" ", "").length + 1L }.sum
      val types = prefix.flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
        .distinct.size.toLong
      val gram3 = prefix.flatMap { case (_, t, _) =>
        val ws = t.split(" ", -1)
        if (ws.length < 3) Nil else ws.sliding(3).map(_.mkString(" ")).toSeq
      }.distinct.size.toLong
      (p, tokens, types, gram3, types * 1000 / math.max(tokens, 1L),
        gram3 * 1000 / math.max(tokens, 1L))
    }
    val got = StatsQueries.qHeapsCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got === expect)
    // the audit's reason to exist: the closed unigram vocabulary saturates
    // (flat between the last two checkpoints) while 3-gram types keep
    // growing — organic combinatorics vs a template's fixed word set
    assert(got.last._3 === got(got.size - 2)._3, "unigram types still growing")
    assert(got.map(_._4).distinct.size === got.size,
      "3-gram types must strictly grow across checkpoints")
  }

  // --------------------------------------------------- export manifest

  test("q_export_manifest: conserves mass; digest is order-independent") {
    val got = StatsQueries.qExportManifest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(_._3).sum === docs.size.toLong,
      "manifest must conserve document mass")
    assert(got.map(p => (p._1, p._2)).distinct.length === got.length)
    // every (lang, split) row is internally consistent
    assert(got.forall(r => r._5 <= r._6 && r._3 > 0))
    // order-independence: recompute the digest from a driver-side replica
    // in doc_id order AND in reverse order — xor must agree with the query
    def nib(md5: String, pos: Int): Long =
      "0123456789abcdef".indexOf(md5.charAt(pos - 1)).toLong
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val rows = docs.map { case (id, t, lang) =>
      val m = md5hex(t)
      val bucket = nib(m, 1) * 16 + nib(m, 2)
      val split =
        if (bucket < 205) "train" else if (bucket < 230) "val" else "test"
      val digest = (0 until 8).map(k => nib(m, k + 1) * (1L << (4 * (7 - k)))).sum
      ((lang, split), (id, t.length - t.replace(" ", "").length + 1L, digest))
    }
    for (order <- Seq(rows, rows.reverse)) {
      val expect = order.groupBy(_._1).map { case ((lang, split), xs) =>
        (lang, split, xs.size.toLong, xs.map(_._2._2).sum,
          xs.map(_._2._1).min, xs.map(_._2._1).max,
          xs.map(_._2._3).reduce(_ ^ _))
      }.toSet
      assert(got.toSet === expect)
    }
  }

  // ------------------------------------------------------ holdout selection

  test("q_holdout_select: hash-rank selection exact; holdout sums to budget") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val allocs = StatsQueries.qHoldoutAlloc(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val expect = docs.groupBy(_._3).flatMap { case (lang, xs) =>
      val ranked = xs.map(d => (d._1, md5hex(d._2)))
        .sortBy(d => (d._2, d._1)).zipWithIndex
      ranked.map { case ((id, _), i) =>
        val rank = i + 1L
        (id, lang, rank, allocs(lang),
          if (rank <= allocs(lang)) 1L else 0L)
      }
    }.toSet
    val got = StatsQueries.qHoldoutSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expect)
    assert(got.toSeq.map(_._5).sum === StatsQueries.HoldoutBudget,
      "selected holdout must sum exactly to the allocated budget")
    // every stratum holds out exactly its allocation
    for ((lang, rows) <- got.groupBy(_._2))
      assert(rows.count(_._5 == 1L).toLong === allocs(lang), lang)
  }

  // --------------------------------------------------------- n-gram novelty

  test("q_ngram_novelty: first-seen attribution exact; both keep classes") {
    val docGrams = docs.map { case (id, t, _) =>
      val ws = t.split(" ", -1)
      id -> (if (ws.length < 3) Set.empty[String]
        else ws.sliding(3).map(_.mkString(" ")).toSet)
    }
    val firstSeen = docGrams.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expect = docGrams.filter(_._2.nonEmpty).map { case (id, gs) =>
      val novel = gs.count(g => firstSeen(g) == id).toLong
      val n = gs.size.toLong
      val p = novel * 1000 / math.max(n, 1L)
      (id, n, novel, p,
        if (p >= StatsQueries.NoveltyMinPermille) 1L else 0L)
    }.toSet
    val got = StatsQueries.qNgramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expect)
    assert(got.exists(_._5 == 0L) && got.exists(_._5 == 1L),
      "novelty threshold inert")
    // doc 0 (nothing earlier) must be fully novel
    assert(got.find(_._1 == got.map(_._1).min).exists(_._4 == 1000L))
  }

  // ------------------------------------------------ robust length outliers

  test("q_length_mad: histogram medians exact; plants flagged, median unmoved") {
    val lens = docs.map { case (id, t, _) =>
      id -> t.length * (if (id % 97 == 13) 20L else 1L)
    }
    def lowerMedian(vs: Seq[Long]): Long = {
      val sorted = vs.sorted
      sorted(((vs.size + 1) / 2 - 1).toInt)
    }
    val med = lowerMedian(lens.map(_._2))
    val devs = lens.map { case (id, l) => (id, l, math.abs(l - med)) }
    val mad = lowerMedian(devs.map(_._3))
    val expect = devs.map { case (id, l, d) =>
      (id, l, med, d, mad,
        if (d > StatsQueries.MadK * math.max(mad, 1L)) 1L else 0L)
    }.toSet
    val got = StatsQueries.qLengthMad(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    // robustness is the claim: every planted runaway page is flagged AND
    // the median sits inside the un-multiplied length range (the 1% of
    // giants moved the cut not at all)
    val plants = got.filter(r => r._1 % 97 == 13)
    assert(plants.nonEmpty && plants.forall(_._6 == 1L),
      "planted runaway page escaped the MAD gate")
    val baseMax = docs.map(_._2.length.toLong).max
    assert(med <= baseMax, "median dragged by the planted giants")
    assert(got.count(_._6 == 1L) < got.size / 10,
      "outlier gate fires on >10% of pages — not an outlier gate")
  }
}
