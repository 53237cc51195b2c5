package graft

import graft.queries.{CorpusQueries, TextQueries}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Independent driver-side recomputation of the LM-estimation /
  * tokenizer-training / link-graph family (q_kn_model, q_bpe_pairs,
  * q_vocab_coverage, q_link_graph, q_pagerank_hosts): a second, plain-Scala
  * implementation of each statistic over the same sf0.001 corpus, compared
  * row-for-row against the distributed query. The DuckDB oracle already
  * checks Spark-vs-SQL; this suite checks both against straight-line code
  * with no query engine at all. */
class LmGraphSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** (doc_id, text) for every non-null-text doc, driver-side. */
  private lazy val docs: Seq[(Long, String)] =
    graft.queries.Tables.documents(spark, dir)
      .filter($"text".isNotNull).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  // split(" ", -1) matches Spark/DuckDB split semantics (keeps empties;
  // empties are then filtered exactly where the queries filter them)
  private def toks(text: String): Array[String] = text.split(" ", -1)

  test("q_kn_model matches a driver-side interpolated-KN recomputation") {
    val grams = mutable.Map.empty[(String, String), Long]
    for ((_, text) <- docs) {
      val ws = toks(text)
      for (i <- 1 until ws.length if ws(i - 1).nonEmpty && ws(i).nonEmpty)
        grams.updateWith((ws(i - 1), ws(i)))(c => Some(c.getOrElse(0L) + 1))
    }
    val c1     = grams.groupMapReduce(_._1._1)(_._2)(_ + _)
    val fanout = grams.groupMapReduce(_._1._1)(_ => 1L)(_ + _)
    val contL  = grams.groupMapReduce(_._1._2)(_ => 1L)(_ + _)
    val b = grams.size.toLong
    val expected = grams.toSeq
      .sortBy { case ((w1, w2), c12) => (-c12, w1, w2) }
      .take(TextQueries.KnModelTopK)
      .map { case ((w1, w2), c12) =>
        val num = (4 * c12 - 3) * b + 3 * fanout(w1) * contL(w2)
        val den = 4 * c1(w1) * b
        (w1, w2, c12, c1(w1), fanout(w1), contL(w2), num, den)
      }
    val got = TextQueries.qKnModel(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === expected)
    // every emitted probability is a genuine probability: 0 < p ≤ 1
    got.foreach { case (w1, w2, _, _, _, _, num, den) =>
      assert(num > 0 && num <= den, s"P($w2|$w1) = $num/$den out of range")
    }
  }

  test("q_bpe_pairs matches a driver-side pair count over the word-frequency table") {
    val wc = mutable.Map.empty[String, Long]
    for ((_, text) <- docs; w <- toks(text)
         if w.length >= 2 && w.forall(c => c >= 'a' && c <= 'z'))
      wc.updateWith(w)(c => Some(c.getOrElse(0L) + 1))
    val pairCount = mutable.Map.empty[String, Long]
    val pairTypes = mutable.Map.empty[String, mutable.Set[String]]
    for ((w, c) <- wc; i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      pairCount.updateWith(p)(x => Some(x.getOrElse(0L) + c))
      pairTypes.getOrElseUpdate(p, mutable.Set.empty) += w
    }
    val expected = pairCount.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(TextQueries.BpeTopK)
      .map { case (p, c) => (p, c, pairTypes(p).size.toLong) }
    val got = TextQueries.qBpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.forall { case (_, c, t) => c >= t && t >= 1 })
  }

  test("q_vocab_coverage matches a driver-side top-K vocab + OOV scoring") {
    val cnt = mutable.Map.empty[String, Long]
    for ((_, text) <- docs; t <- toks(text) if t.nonEmpty)
      cnt.updateWith(t)(c => Some(c.getOrElse(0L) + 1))
    val vocab = cnt.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(TextQueries.VocabK).map(_._1).toSet
    val expected = docs
      .map { case (id, text) =>
        val ts = toks(text).filter(_.nonEmpty)
        val oov = ts.count(t => !vocab.contains(t)).toLong
        (id, ts.length.toLong, oov, oov * 1000 / ts.length)
      }
      .filter(_._2 > 0).sortBy(_._1)
    val got = TextQueries.qVocabCoverage(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // the vocab is real: some docs fully covered, some genuinely OOV-heavy
    assert(got.exists(_._4 == 0) || got.exists(_._4 > 100),
      "OOV structure degenerate — VocabK mis-sized for the corpus")
  }

  /** Driver-side replica of the deterministic in-query link derivation. */
  private def driverEdges(): Map[(String, String), Long] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    val edges = mutable.Map.empty[(String, String), Long]
    for ((id, text) <- docs) {
      val hex = mdt.digest(text.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val src = s"h${id % 20}"
      def nib(pos: Int): Int = Character.digit(hex.charAt(pos - 1), 16)
      for (k <- 1 to 3) {
        val dst = s"h${(nib(2 * k - 1) * 16 + nib(2 * k)) % 20}"
        if (src != dst)
          edges.updateWith((src, dst))(c => Some(c.getOrElse(0L) + 1))
      }
    }
    edges.toMap
  }

  test("q_link_graph matches driver-side edge derivation and degree rollup") {
    val edges = driverEdges()
    val out = edges.groupMapReduce(_._1._1)(_._2)(_ + _)
    val in  = edges.groupMapReduce(_._1._2)(_._2)(_ + _)
    val expected = edges.toSeq.sortBy(_._1)
      .map { case ((s, d), c) => (s, d, c, out(s), in(d)) }
    val got = CorpusQueries.qLinkGraph(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    // the graph is dense enough to be a real test (20 hosts, 3 links/doc)
    assert(got.map(_._1).distinct.size === 20)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("q_sample_to_budget matches a driver-side greedy prefix cut per language") {
    val toksOf = docs.map { case (id, t) =>
      (id, t, t.count(_ == ' ').toLong + 1)
    }
    val byLangTokens = mutable.Map.empty[String, Long]
    val langOf = graft.queries.Tables.documents(spark, dir)
      .filter($"text".isNotNull).select($"doc_id", $"lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, _, n) <- toksOf) byLangTokens.updateWith(langOf(id))(c =>
      Some(c.getOrElse(0L) + n))
    val budget = byLangTokens.map { case (l, t) =>
      l -> t * TextQueries.BudgetPermille / 1000 }
    val expected = toksOf
      .map { case (id, t, n) => (langOf(id), md5hex(t), id, n) }
      .groupBy(_._1).flatMap { case (lang, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._2, r._3)).map { case (_, _, id, n) =>
          val before = cum; cum += n
          (id, lang, n, before, budget(lang),
            if (before < budget(lang)) 1 else 0)
        }
      }.toSeq.sortBy(_._1)
    val got = TextQueries.qSampleToBudget(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSeq
    assert(got === expected)
    // the cut is real: every language keeps SOME and drops SOME
    val byLang = got.groupBy(_._2)
    byLang.foreach { case (l, rows) =>
      assert(rows.exists(_._6 == 1) && rows.exists(_._6 == 0),
        s"lang $l: degenerate cut")
      // kept token mass overshoots the budget by less than one document
      val keptTokens = rows.filter(_._6 == 1).map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(keptTokens < budget(l) + maxDoc && keptTokens >= budget(l) - maxDoc)
    }
  }

  test("q_threshold_calibration hits the rank target and accounts tie spillover") {
    val rows = TextQueries.qThresholdCalibration(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // driver-side metric recompute per doc
    val langOf = graft.queries.Tables.documents(spark, dir)
      .filter($"text".isNotNull).select($"doc_id", $"lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val metric = docs.map { case (id, t) =>
      val words = t.count(_ == ' ').toLong + 1
      val chars = t.replace(" ", "").length.toLong
      (id, langOf(id), chars * 100 / words)
    }
    val byLang = metric.groupBy(_._2)
    for ((lang, n, k, thr, kept, permille) <- rows) {
      val ms = byLang(lang).sortBy(r => (r._3, r._1))
      assert(n === ms.size.toLong)
      assert(k === (n * TextQueries.KeepTargetPermille + 999) / 1000)
      assert(thr === ms((k - 1).toInt)._3, s"$lang threshold off")
      val keptExp = ms.count(_._3 <= thr).toLong
      assert(kept === keptExp && kept >= k, s"$lang value-based keep off")
      assert(permille === kept * 1000 / n)
    }
  }

  test("q_pagerank_hosts matches a driver-side exact-integer power iteration") {
    val edges = driverEdges()
    val out = edges.groupMapReduce(_._1._1)(_._2)(_ + _)
    val hosts = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSeq.distinct.sorted
    val n = hosts.size.toLong
    val s = CorpusQueries.PrScale
    val base = (15 * s / 100) / n
    def step(pr: Map[String, Long]): Map[String, Long] = {
      val contrib = mutable.Map.empty[String, Long]
      for (((u, v), w) <- edges)
        contrib.updateWith(v)(c => Some(c.getOrElse(0L) + pr(u) * w / out(u)))
      hosts.map(h => h -> (base + contrib.getOrElse(h, 0L) * 85 / 100)).toMap
    }
    val pr0 = hosts.map(h => h -> s / n).toMap
    val pr1 = step(pr0)
    val pr2 = step(pr1)
    val expected = hosts.map(h => (h, pr0(h), pr1(h), pr2(h)))
    val got = CorpusQueries.qPagerankHosts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // damped mass stays in (0.8·S, S]: flooring only ever loses mass
    val total2 = got.map(_._4).sum
    assert(total2 <= s && total2 > s * 8 / 10, s"pr2 mass $total2 vs scale $s")
    // the iteration moved something: scores differentiate by round 2
    assert(got.map(_._4).distinct.size > 1, "pr2 degenerate (all equal)")
  }

  test("q_graph_triangles matches a driver census; spam ring reads 1000‰") {
    val nib = "0123456789abcdef"
    val organic = docs.flatMap { case (id, t) =>
      val hh = md5hex(t)
      (1 to 3).map { k =>
        val d = (nib.indexOf(hh.charAt(2 * k - 2)) * 16 +
          nib.indexOf(hh.charAt(2 * k - 1))) % 64
        (s"h${id % 64}", s"h$d")
      }.filter(e => e._1 != e._2)
    }
    val ring = Seq(("s0", "s1"), ("s0", "s2"), ("s0", "s3"),
      ("s1", "s2"), ("s1", "s3"), ("s2", "s3"))
    val und = (organic ++ ring)
      .map(e => if (e._1 < e._2) e else (e._2, e._1)).distinct
    val nbrs = (und ++ und.map(_.swap)).groupMapReduce(_._1)(e => Set(e._2))(_ ++ _)
    val triAt = nbrs.map { case (h, ns) =>
      h -> ns.toSeq.combinations(2).count { case Seq(x, y) =>
        nbrs(x).contains(y)
      }.toLong
    }
    val expect = nbrs.map { case (h, ns) =>
      val deg = ns.size.toLong
      val cc = if (deg >= 2) triAt(h) * 2000 / (deg * (deg - 1)) else 0L
      (h, deg, triAt(h), cc)
    }.toSet
    val got = CorpusQueries.qGraphTriangles(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expect)
    // the census's reason to exist: the planted clique reads fully
    // clustered while organic hosts spread below it
    for (s <- Seq("s0", "s1", "s2", "s3"))
      assert(got.exists(r => r._1 == s && r._4 == 1000L), s"ring host $s")
    assert(got.exists(r => r._1.startsWith("h") && r._4 < 1000L),
      "no organic host below 1000‰ — graph still complete?")
  }
}
