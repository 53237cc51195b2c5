package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the corpus-analytics family
  * (Flesch–Kincaid readability, word-association lift, dedup
  * cluster-size audit, Cohen's kappa) — plain-Scala replicas over
  * sf0.001 compared row-for-row, plus the semantic guarantees the hash
  * oracle can't state (the FK bands partition the score line; lift is
  * symmetric in the pair and >1000 iff attraction; the cluster-size
  * histogram conserves total document mass; kappa lands strictly
  * between chance and perfection for correlated labelers) and the plan
  * contract that readability stays a pure scalar map.
  */
class AnalyticsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, Long)] =
    graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"n_chars")
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  // ----------------------------------------------------------- readability

  test("q_readability matches a driver FK recomputation; bands partition") {
    val expect = docs.map { case (id, t, _) =>
      val words = t.length - t.replace(" ", "").length + 1L
      val syll = "[aeiouyAEIOUY]+".r.findAllIn(t).size.toLong
      val sents = 1L + (words - 1) / AnalyticsQueries.SentenceW
      val fk = 390 * words / sents + 11800 * syll / words - 15590
      val band = if (fk < 8000) "easy" else if (fk < 12000) "standard" else "hard"
      (id, words, syll, sents, fk, band)
    }.toSet
    val got = AnalyticsQueries.qReadability(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    assert(got === expect)
    assert(got.map(_._6).size >= 2, "band thresholds inert on this corpus")
  }

  test("readability is a pure scalar map (sort exchanges only)") {
    val q = AnalyticsQueries.qReadability(spark, dir)
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"))
  }

  // ------------------------------------------------------------- word lift

  test("q_word_lift matches a driver replica; lift detects independence") {
    val vocab = AnalyticsQueries.LiftVocab
    val present = docs.map { case (id, t, _) =>
      id -> vocab.filter(w => s" $t ".contains(s" $w ")).toSet
    }
    val n = docs.size.toLong
    val nW = vocab.map(w => w -> present.count(_._2.contains(w)).toLong).toMap
    val expect = (for {
      a <- vocab; b <- vocab; if a < b
      nab = present.count(p => p._2.contains(a) && p._2.contains(b)).toLong
      if nab > 0
    } yield (a, b, nW(a), nW(b), nab, nab * n * 1000 / (nW(a) * nW(b)))).toSet
    val got = AnalyticsQueries.qWordLift(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    // frequent words in a fixed-vocabulary corpus co-occur near (or
    // above) independence: every lift in a broad band around 1000, with
    // genuine spread — a constant column would mean the statistic is inert
    assert(got.forall(r => r._6 > 500 && r._6 < 2000))
    assert(got.map(_._6).size >= 2, "lift constant across all pairs")
  }

  // ----------------------------------------------------- cluster-size audit

  test("q_dedup_cluster_sizes conserves document mass over the labels") {
    val labels = graft.queries.TextQueries.componentLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expect = labels.groupBy(_._2).values.map(_.size)
      .groupBy(identity).map { case (s, xs) =>
        (s.toLong, xs.size.toLong, s.toLong * xs.size)
      }.toSet
    val got = AnalyticsQueries.qDedupClusterSizes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
    assert(got.toSeq.map(_._3).sum == labels.length.toLong,
      "histogram mass != corpus size")
    assert(got.exists(_._1 == 1L), "no singletons — implausible labeling")
    assert(got.exists(_._1 > 1L), "no clusters — planted dups missing")
  }

  // --------------------------------------------------------- labeler kappa

  test("q_kappa_labelers: confusion table exact, kappa between chance and 1") {
    val rows = docs.map { case (_, t, nChars) =>
      val words = t.length - t.replace(" ", "").length + 1L
      val wc = t.replace(" ", "").length.toLong
      val mwl = wc * 100 / words
      val a = words >= 25 && mwl >= 200 && mwl <= 1200
      val b = (t.contains(" the ") || t.startsWith("the ")) && nChars >= 120
      (a, b)
    }
    val tp = rows.count(r => r._1 && r._2).toLong
    val fp = rows.count(r => r._1 && !r._2).toLong
    val fn = rows.count(r => !r._1 && r._2).toLong
    val tn = rows.count(r => !r._1 && !r._2).toLong
    val n = tp + fp + fn + tn
    val peNum = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    val expect = (tp, fp, fn, tn, (tp + tn) * 1000 / n,
      peNum * 1000 / (n * n),
      ((tp + tn) * n - peNum) * 1000 / (n * n - peNum))
    val r = AnalyticsQueries.qKappaLabelers(spark, dir).head()
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
    assert(got === expect)
    // both labelers favor long docs, so agreement beats chance — but they
    // disagree somewhere, so kappa stays below perfect
    assert(got._7 > 0 && got._7 < 1000, s"kappa ${got._7} out of open band")
    assert(got._5 > got._6, "observed agreement not above chance")
  }

  // ------------------------------------------------------------ corpus drift

  test("q_corpus_drift: cell counts exact, TV distance = half the L1 swing") {
    val cells = graft.queries.Tables.documents(spark, dir)
      .select($"lang", $"source", $"doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val grouped = cells.groupBy(c => (c._1, c._2)).map { case (k, xs) =>
      k -> ((xs.count(_._3 % 2 == 0).toLong, xs.count(_._3 % 2 == 1).toLong))
    }
    val (totA, totB) = (grouped.values.map(_._1).sum, grouped.values.map(_._2).sum)
    val withShares = grouped.map { case ((l, s), (na, nb)) =>
      val (sa, sb) = (na * 1000 / totA, nb * 1000 / totB)
      (l, s, na, nb, sa, sb, sa - sb)
    }
    val tv = withShares.map(r => math.abs(r._7)).sum / 2
    val expect = withShares.map { case (l, s, na, nb, sa, sb, d) =>
      (l, s, na, nb, sa, sb, d,
        if (math.abs(d) >= AnalyticsQueries.DriftFlagPermille) 1L else 0L, tv)
    }.toSet
    val got = AnalyticsQueries.qCorpusDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got.toSet === expect)
    // epoch split must be balanced enough that both denominators are live,
    // and the parity split of an i.i.d. corpus should sit near zero drift —
    // tv in a narrow band proves the statistic is wired to real data, not
    // inert (a constant-share corpus would read exactly 0 everywhere)
    assert(totA > 0 && totB > 0)
    assert(got.map(_._9).distinct.length == 1, "tv must be corpus-level")
  }

  // --------------------------------------------------- host-normalized keep

  test("q_host_quality_norm: within-host percentile exact; flips exist") {
    val rows = docs.map { case (id, t, _) =>
      val words = t.length - t.replace(" ", "").length + 1L
      val wc = t.replace(" ", "").length.toLong
      val score = math.max(0L, 1000L - math.abs(wc * 100 / words -
        graft.queries.HygieneQueries.IdealMwlX100))
      (id, s"h${id % AnalyticsQueries.NormHosts}", score)
    }
    val expect = rows.groupBy(_._2).flatMap { case (host, xs) =>
      val ranked = xs.sortBy(r => (r._3, r._1)).zipWithIndex
      val n = xs.size.toLong
      ranked.map { case ((id, _, score), i) =>
        val rank = i + 1L
        val pr = rank * 1000 / n
        val gk = if (score >= AnalyticsQueries.GlobalKeepPermille) 1L else 0L
        val nk = if (pr >= AnalyticsQueries.NormKeepPermille) 1L else 0L
        (id, host, score, rank, n, pr, gk, nk, if (gk != nk) 1L else 0L)
      }
    }.toSet
    val got = AnalyticsQueries.qHostQualityNorm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSet
    assert(got === expect)
    // normalization must actually flip decisions somewhere — that's the
    // operator's reason to exist; and both keep policies must be non-trivial
    assert(got.exists(_._9 == 1L), "normalization flipped nothing")
    assert(got.exists(_._7 == 1L) && got.exists(_._7 == 0L), "global keep inert")
    assert(got.exists(_._8 == 1L) && got.exists(_._8 == 0L), "norm keep inert")
  }

  // ------------------------------------------------- best-rep dedup election

  test("q_cluster_best_rep: argmax election exact; elections genuinely move") {
    def score(t: String): Long = {
      val nw = t.length - t.replace(" ", "").length + 1L
      val wc = t.replace(" ", "").length.toLong
      math.max(0L, 1000L - math.abs(wc * 100 / nw -
        graft.queries.HygieneQueries.IdealMwlX100))
    }
    // dedupCorpus replica: base docs + exact-dup plants + near-dup tails
    val corpus = docs.map { case (id, t, _) => (id, t) } ++
      docs.collect { case (id, t, _) if id % 10 == 0 => (id + 1000000L, t) } ++
      docs.collect { case (id, t, _) if id % 7 == 0 =>
        (id + 2000000L, t + " nearly duplicate tail") }
    val scores = corpus.map { case (id, t) => id -> score(t) }.toMap
    val labels = graft.queries.TextQueries.componentLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expect = labels.groupBy(_._2).map { case (comp, xs) =>
      val ids = xs.map(_._1)
      val best = ids.map(i => (scores(i), -i)).max
      (comp, ids.size.toLong, ids.min, -best._2, best._1,
        if (-best._2 != ids.min) 1L else 0L)
    }.toSet
    val got = AnalyticsQueries.qClusterBestRep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    // the quality election must differ from canonical-min somewhere (the
    // operator's reason to exist) but exact-dup clusters must tie back to
    // the canonical copy (identical text → identical score → min id wins)
    assert(got.exists(_._6 == 1L), "election never moved the survivor")
    val exactDupClusters = got.filter(c =>
      c._2 == 2 && labels.exists(l => l._2 == c._1 && l._1 >= 1000000L
        && l._1 < 2000000L))
    assert(exactDupClusters.forall(_._6 == 0L),
      "an exact-dup pair elected the copy over the canonical original")
  }

  // ----------------------------------------------------- rule ablation table

  test("q_rule_marginals: ablation table exact; every rule fires") {
    val bits = docs.map { case (_, t, nChars) =>
      val nw = t.length - t.replace(" ", "").length + 1L
      val wc = t.replace(" ", "").length.toLong
      val mwl = wc * 100 / nw
      (nw < 25,
        mwl < AnalyticsQueries.MarginalMwlLo ||
          mwl > AnalyticsQueries.MarginalMwlHi,
        !(t.contains(" the ") || t.startsWith("the ")), nChars < 120)
    }
    def nf(sel: ((Boolean, Boolean, Boolean, Boolean)) => Boolean) =
      bits.count(sel).toLong
    val expect = Set(
      ("min_words", nf(_._1), nf(b => b._1 && !b._2 && !b._3 && !b._4)),
      ("mwl_band", nf(_._2), nf(b => b._2 && !b._1 && !b._3 && !b._4)),
      ("stopword", nf(_._3), nf(b => b._3 && !b._1 && !b._2 && !b._4)),
      ("min_chars", nf(_._4), nf(b => b._4 && !b._1 && !b._2 && !b._3)))
    val keepNow = nf(b => !b._1 && !b._2 && !b._3 && !b._4)
    val got = AnalyticsQueries.qRuleMarginals(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(r => (r._1, r._2, r._3)).toSet === expect)
    assert(got.forall(r => r._4 == keepNow && r._5 == keepNow + r._3))
    // every rule must actually fail something on this corpus — an inert
    // rule makes the ablation table vacuous for that row
    assert(got.forall(_._2 > 0L), s"inert rule in $got")
  }

  // -------------------------------------------------------------- canaries

  test("q_canary_scan: hit accounting exact; clean canary reports zero") {
    val planted = docs.map { case (id, t, _) =>
      if (id % 53 == 5) (id, t + " " + AnalyticsQueries.Canaries(0)._2)
      else if (id % 101 == 17) (id, t + " " + AnalyticsQueries.Canaries(1)._2)
      else (id, t)
    }
    val expect = AnalyticsQueries.Canaries.map { case (cid, needle) =>
      val hits = planted.filter(_._2.contains(needle)).map(_._1)
      (cid, hits.size.toLong,
        if (hits.isEmpty) -1L else hits.min,
        if (hits.isEmpty) -1L else hits.max)
    }.toSet
    val got = AnalyticsQueries.qCanaryScan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expect)
    assert(got.exists(r => r._1 == "c_clean" && r._2 == 0L && r._3 == -1L),
      "clean canary must report an explicit zero row")
    assert(got.count(_._2 > 0L) == 2, "both planted canaries must hit")
  }
}
