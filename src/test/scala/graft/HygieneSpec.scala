package graft

import graft.queries.HygieneQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the corpus-hygiene family
  * (host-scoped boilerplate removal, link-reciprocity spam detection,
  * HTML metadata extraction, quality-gated epoch upsampling) — plain
  * Scala replicas over sf0.001 compared row-for-row, plus the semantic
  * guarantees the hash oracle can't state (the NAV plant is always
  * dropped and the 1/3-frequency PROMO plant always kept — the threshold
  * gates, not mere repetition; reciprocity is symmetric in the pair;
  * epoch counts respect both the Gopher floor and the cap) and the plan
  * contracts (metadata extraction is a pure scalar map; the boilerplate
  * stats shuffle never carries the text column).
  */
class HygieneSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String)] =
    graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang")
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def exchangeBlocks(df: DataFrame): Seq[String] =
    df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
      .split("\n\n")
      .filter(b => b.linesIterator.hasNext &&
        b.linesIterator.next().matches(""".*\)\s*(Exchange|BroadcastExchange).*"""))
      .toSeq

  // -------------------------------------------------- boilerplate removal

  /** Driver replica of the page/line derivation incl. plants. */
  private def replicaLines: Seq[(Long, Int, String)] = {
    val base = docs.map { case (id, t, _) => (id / 5, (id % 5).toInt, t) }
    val pages = base.map(_._1).distinct
    val nav = pages.map(p => (p, 5, s"NAV h${p % 10}"))
    val promo = pages.filter(_ % 3 == 0).map(p => (p, 6, s"PROMO h${p % 10}"))
    base ++ nav ++ promo
  }

  test("q_boilerplate_host drops host-frequent lines and only those") {
    val lines = replicaLines
    val hostOf = (p: Long) => s"h${p % 10}"
    val hostPages = lines.map(l => hostOf(l._1) -> l._1).distinct
      .groupBy(_._1).map { case (h, xs) => h -> xs.size }
    val lineHosts = lines.map(l => (hostOf(l._1), l._3, l._1)).distinct
      .groupBy(x => (x._1, x._2)).map { case (k, xs) => k -> xs.size }
    val boiler = lineHosts.filter { case ((h, _), n) =>
      n * 1000 > hostPages(h) * HygieneQueries.BoilerPermille
    }.keySet
    val expect = lines.groupBy(_._1).map { case (p, ls) =>
      val h = hostOf(p)
      val (kept, dropped) = ls.partition(l => !boiler.contains((h, l._3)))
      val text = if (kept.isEmpty) null
        else kept.sortBy(_._2).map(_._3).mkString("\n")
      p -> ((h, kept.size.toLong, dropped.size.toLong, text))
    }
    val got = HygieneQueries.qBoilerplateHost(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getString(4)))).toMap
    assert(got === expect)
    // the plant semantics: NAV (100% of host pages) always dropped, PROMO
    // (~1/3 of host pages) always kept — the THRESHOLD decides
    for ((p, (_, _, _, text)) <- got; if text != null) {
      assert(!text.contains("NAV h"), s"NAV survived on page $p")
      if (p % 3 == 0) assert(text.contains("PROMO h"),
        s"PROMO wrongly dropped on page $p")
    }
    assert(got.values.exists(_._3 > 0), "no boilerplate dropped anywhere")
  }

  test("boilerplate stats shuffle never carries the line text") {
    val q = HygieneQueries.qBoilerplateHost(spark, dir)
    // the page-reassembly groupBy legitimately shuffles text; the STATS
    // path (host,digest rollups) must not — so at most one Exchange block
    // may mention the line column
    val carrying = exchangeBlocks(q)
      .filter(_.matches("""(?s).*\bline#.*"""))
    assert(carrying.size <= 1,
      s"line text in ${carrying.size} exchanges:\n${carrying.mkString("\n")}")
  }

  // --------------------------------------------------- link reciprocity

  test("q_link_reciprocity matches a driver replica and is pair-symmetric") {
    // replicate docLinks: md5 nibbles 1..6 -> 3 dst hosts, src = doc_id%20
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val edges = docs.flatMap { case (id, t, _) =>
      val hh = md5hex(t)
      val src = s"h${id % 20}"
      (1 to 3).map { k =>
        val hi = "0123456789abcdef".indexOf(hh(2 * k - 2))
        val lo = "0123456789abcdef".indexOf(hh(2 * k - 1))
        (src, s"h${(hi * 16 + lo) % 20}")
      }.filter(e => e._1 != e._2)
    }.groupBy(identity).map { case (e, xs) => e -> xs.size.toLong }
    val pairs = edges.toSeq.map { case ((s, d), n) =>
      val (a, b) = if (s < d) (s, d) else (d, s)
      ((a, b), if (s < d) (n, 0L) else (0L, n))
    }.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.map(_._2._1).sum, xs.map(_._2._2).sum))
    }
    val expect = pairs.map { case ((a, b), (fwd, bwd)) =>
      val rec = math.min(fwd, bwd) * 1000 / math.max(fwd, bwd)
      val spam = if (rec >= HygieneQueries.SpamRecipPermille &&
        fwd + bwd >= HygieneQueries.SpamMinLinks) 1 else 0
      (a, b, fwd, bwd, rec, fwd + bwd, spam)
    }.toSet
    val got = HygieneQueries.qLinkReciprocity(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toSet
    assert(got === expect)
    // canonical orientation: a < b on every row, so each unordered pair
    // appears exactly once
    assert(got.forall(r => r._1 < r._2))
    assert(got.map(r => (r._1, r._2)).size == got.size)
    assert(got.exists(_._7 == 1), "no spam pair flagged at this scale")
    assert(got.exists(_._7 == 0), "every pair flagged — threshold inert")
  }

  // --------------------------------------------------- metadata extraction

  test("q_extract_meta recovers planted title/description/anchor census") {
    val got = HygieneQueries.qExtractMeta(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getInt(3)))).toMap
    for ((id, t, _) <- docs) {
      val (title, descr, n) = got(id)
      assert(title == s"Doc $id")
      assert(descr == t.take(32).replace("\"", ""))
      assert(n == (id % 4).toInt)
    }
    assert(got.size == docs.size)
  }

  test("metadata extraction is a pure scalar map (sort exchanges only)") {
    val q = HygieneQueries.qExtractMeta(spark, dir)
    val plan = q.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), "unexpected join in a scalar extract")
    assert(!plan.contains("HashAggregate"), "unexpected aggregate")
    // the only exchange allowed is the final orderBy's range partitioning
    val ex = exchangeBlocks(q).filterNot(_.contains("rangepartitioning"))
    assert(ex.isEmpty, s"non-sort exchange:\n${ex.mkString("\n")}")
  }

  // ----------------------------------------------------- epoch upsampling

  // ---------------------------------------------------------- mirror hosts

  test("q_mirror_hosts: full mirror flagged at 1000‰, quarter mirror under bar") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val hd = docs.flatMap { case (id, t, _) =>
      val h = md5hex(t)
      Seq((s"h${id % HygieneQueries.MirrorHosts}", h)) ++
        (if (id % HygieneQueries.MirrorHosts == 3) Seq(("m3", h)) else Nil) ++
        (if (id % (HygieneQueries.MirrorHosts * 4) == 7) Seq(("m7", h)) else Nil)
    }.distinct
    val ubiq = hd.groupBy(_._2).filter(_._2.size > HygieneQueries.MaxHostsPerDigest)
      .keySet
    val kept = hd.filterNot(p => ubiq(p._2))
    val sizes = kept.groupBy(_._1).map { case (h, xs) => h -> xs.size.toLong }
    val inter = kept.groupBy(_._2).values.flatMap { hosts =>
      for (a <- hosts; b <- hosts; if a._1 < b._1) yield (a._1, b._1)
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expect = inter.map { case ((a, b), i) =>
      val j = i * 1000 / (sizes(a) + sizes(b) - i)
      (a, b, sizes(a), sizes(b), i, j,
        if (j >= HygieneQueries.MirrorJaccardPermille) 1L else 0L,
        ubiq.size.toLong)
    }.toSet
    val got = HygieneQueries.qMirrorHosts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got === expect)
    val full = got.find(p => p._1 == "h3" && p._2 == "m3")
    assert(full.exists(p => p._6 == 1000L && p._7 == 1L),
      "planted full mirror not flagged at 1000‰")
    val quarter = got.find(p => p._1 == "h7" && p._2 == "m7")
    assert(quarter.exists(p => p._6 < HygieneQueries.MirrorJaccardPermille
      && p._7 == 0L), "quarter mirror should sit under the threshold")
  }

  // ----------------------------------------------------- host lang purity

  test("q_host_lang_purity: argmax exact; pure and mixed hosts both exist") {
    val hl = docs.map { case (id, _, lang) =>
      val host = if (id % 4 == 0) s"l-$lang"
        else s"h${id % HygieneQueries.MirrorHosts}"
      (host, lang)
    }
    val expect = hl.groupBy(_._1).map { case (host, xs) =>
      val byLang = xs.groupBy(_._2).map { case (l, ys) => l -> ys.size.toLong }
      val (majLang, majDocs) = byLang.toSeq.sortBy { case (l, c) => (-c, l) }.head
      val n = xs.size.toLong
      val share = majDocs * 1000 / n
      (host, n, byLang.size.toLong, majLang, majDocs, share,
        if (share < HygieneQueries.PurityMinPermille ||
          byLang.size > HygieneQueries.PurityMaxLangs) 1L else 0L)
    }.toSet
    val got = HygieneQueries.qHostLangPurity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === expect)
    // the flag must separate: the per-language hosts read pure (1000‰,
    // one lang), the generic hosts read mixed
    assert(got.filter(_._1.startsWith("l-")).forall(h =>
      h._7 == 0L && h._6 == 1000L && h._3 == 1L), "a planted pure host flagged")
    assert(got.exists(_._7 == 1L), "no mixed host flagged")
  }

  test("q_epoch_upsample matches a driver replica; floor and cap hold") {
    val perDoc = docs.map { case (id, t, lang) =>
      val tokens = t.length - t.replace(" ", "").length + 1L
      val wordChars = t.replace(" ", "").length.toLong
      val mwl = wordChars * 100 / tokens
      val q = math.max(0L, 1000L - math.abs(mwl - HygieneQueries.IdealMwlX100))
      val ep = if (tokens < 25) 0L
        else 1L + q * (HygieneQueries.MaxEpochs - 1) / 1000
      (id, lang, tokens, q, ep, tokens * ep)
    }
    val perLang = perDoc.groupBy(_._2).map { case (l, xs) => l -> xs.map(_._6).sum }
    val expect = perDoc.map { case (id, lang, tokens, q, ep, em) =>
      (id, lang, tokens, q, ep, em, perLang(lang))
    }.toSet
    val got = HygieneQueries.qEpochUpsample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === expect)
    // structural guarantees: cap respected, floor zeroes, survivors >= 1
    assert(got.forall(_._5 <= HygieneQueries.MaxEpochs))
    assert(got.forall(r => (r._3 < 25) == (r._5 == 0L)))
    assert(got.exists(_._5 > 1), "nothing upsampled — score range inert")
  }
}
