package graft

import graft.queries.CrawlQueries
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Independent driver-side recomputation of the crawl-side gating family
  * (q_crawl_frontier, q_url_blocklist, q_winnow, q_quality_classifier):
  * plain-Scala replicas of each derivation over the same sf0.001 corpus,
  * compared row-for-row against the distributed query — the same
  * second-implementation discipline as LmGraphSpec. The DuckDB oracle
  * checks Spark-vs-SQL; this checks both against no query engine at all. */
class CrawlSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String)] =
    graft.queries.Tables.documents(spark, dir)
      .filter($"text".isNotNull).select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  // ----------------------------------------------------------- frontier

  /** Driver replica of the 256-host weighted edge derivation. */
  private def frontierEdges(): Map[(String, String), Long] = {
    val edges = mutable.Map.empty[(String, String), Long]
    for ((id, text) <- docs) {
      val hex = md5hex(text)
      val src = s"h${id % CrawlQueries.FrontierHosts}"
      def nib(pos: Int): Int = Character.digit(hex.charAt(pos - 1), 16)
      for (k <- 1 to 3) {
        val dst = s"h${(nib(2 * k - 1) * 16 + nib(2 * k)) % CrawlQueries.FrontierHosts}"
        if (src != dst)
          edges.updateWith((src, dst))(c => Some(c.getOrElse(0L) + 1))
      }
    }
    edges.toMap
  }

  test("q_crawl_frontier matches a driver-side two-ring BFS") {
    val edges = frontierEdges()
    val seeds = CrawlQueries.FrontierSeeds.toSet
    def ring(frontier: Set[String], visited: Set[String]): Map[String, (Long, Long)] =
      edges.toSeq
        .collect { case ((s, d), n) if frontier(s) && !visited(d) => (d, n) }
        .groupMapReduce(_._1)(x => (1L, x._2)) { case ((p1, v1), (p2, v2)) =>
          (p1 + p2, v1 + v2)
        }
    val r1 = ring(seeds, seeds)
    val r2 = ring(r1.keySet, seeds ++ r1.keySet)
    val expected =
      (seeds.toSeq.sorted.map(h => (h, 0, 0L, 0L)) ++
        r1.toSeq.sortBy(_._1).map { case (h, (p, v)) => (h, 1, p, v) } ++
        r2.toSeq.sortBy(_._1).map { case (h, (p, v)) => (h, 2, p, v) })
    val got = CrawlQueries.qCrawlFrontier(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // the graph is sparse enough that BFS has real structure: both rings
    // non-empty and the frontier does NOT saturate the host space at depth 1
    assert(r1.nonEmpty && r2.nonEmpty, "degenerate BFS: an empty ring")
    assert(r1.size < CrawlQueries.FrontierHosts / 2,
      s"depth-1 ring saturated (${r1.size} hosts) — host space mis-sized")
    info(s"rings: ${r1.size} hosts at depth 1, ${r2.size} at depth 2, " +
      s"${edges.size} weighted edges")
  }

  // ---------------------------------------------------------- blocklist

  test("q_url_blocklist matches a driver-side first-match suffix gate") {
    val domains = Seq("example.com", "test.org", "sample.net", "tracker.xyz")
    val expected = docs.map(_._1).sorted.map { id =>
      val host = s"h${id % 20}.${domains((id % 4).toInt)}"
      val rule = CrawlQueries.BlockRules
        .find(r => host == r || host.endsWith("." + r)).getOrElse("")
      (id, host, if (rule.nonEmpty) 1 else 0, rule)
    }
    val got = CrawlQueries.qUrlBlocklist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSeq
    assert(got === expected)
    // the gate is non-degenerate and the shadowed rule is never reported:
    // h3.tracker.xyz hosts must match the earlier tracker.xyz suffix rule
    val blocked = got.filter(_._3 == 1)
    assert(blocked.nonEmpty && blocked.size < got.size)
    val h3 = got.filter(_._2 == "h3.tracker.xyz")
    assert(h3.nonEmpty && h3.forall(_._4 == "tracker.xyz"),
      "first-match order violated: shadowed exact rule reported")
    assert(blocked.exists(_._4 == "h5.test.org"), "exact-host rule never fired")
  }

  // ------------------------------------------------------------- winnow

  /** Driver replica of the winnowing sketch: k-gram md5s, w-window minima,
    * per-doc distinct. split(" ", -1) matches Spark/DuckDB split. */
  private def winnowFps(text: String): (Long, Set[String]) = {
    val (k, w) = (CrawlQueries.WinnowK, CrawlQueries.WinnowW)
    val ws = text.split(" ", -1)
    if (ws.length < k) return (0L, Set.empty)
    val grams = (0 to ws.length - k)
      .map(i => md5hex(ws.slice(i, i + k).mkString(" ")))
    val nWins = math.max(grams.length - w + 1, 1)
    val fps = (0 until nWins).map(j => grams.slice(j, j + w).min).toSet
    (grams.length.toLong, fps)
  }

  test("q_winnow matches a driver-side winnowing recomputation") {
    // driver replica of TextQueries.dedupCorpus (base + %10 exact copies
    // + %7 near-dup tails) — a third independent derivation; any drift
    // from the query's corpus fails the row compare below
    val dcorpus = docs ++
      docs.collect { case (id, t) if id % 10 == 0 => (id + 1000000, t) } ++
      docs.collect { case (id, t) if id % 7 == 0 =>
        (id + 2000000, t + " nearly duplicate tail")
      }
    val sketches = dcorpus.map { case (id, t) => (id, winnowFps(t)) }
      .filter(_._2._1 > 0)
    val fpDocs = mutable.Map.empty[String, Long]
    for ((_, (_, fps)) <- sketches; h <- fps)
      fpDocs.updateWith(h)(c => Some(c.getOrElse(0L) + 1))
    val expected = sketches.sortBy(_._1).map { case (id, (ng, fps)) =>
      val shared = fps.count(h => fpDocs(h) >= 2).toLong
      val permille = shared * 1000 / fps.size
      (id, ng, fps.size.toLong, shared, permille, if (permille >= 500) 1 else 0)
    }
    val got = CrawlQueries.qWinnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSeq
    assert(got === expected)
  }

  test("winnow sketch: planted copies flagged, sketch genuinely smaller") {
    val rows = CrawlQueries.qWinnow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getInt(5))).toSeq
    val byId = rows.map(r => r._1 -> r).toMap
    // exact planted copies (doc_id % 10 == 0 → +1000000) share EVERY
    // fingerprint with their original: 1000‰ flagged on both sides
    val planted = rows.filter(r => r._1 >= 1000000 && r._1 < 2000000)
    assert(planted.nonEmpty)
    planted.foreach { case (id, _, _, permille, flagged) =>
      assert(permille == 1000L && flagged == 1, s"copy $id not fully shared")
      val orig = byId(id - 1000000)
      assert(orig._4 == 1000L && orig._5 == 1, s"original ${id - 1000000} not flagged")
    }
    // the winnowing guarantee's payoff: the sketch is ~2/(W+1) of the
    // gram positions — assert a real reduction on every long-enough doc
    val long = rows.filter(_._2 >= 50)
    assert(long.nonEmpty)
    long.foreach { case (id, ng, nfps, _, _) =>
      assert(nfps * 2 <= ng, s"doc $id sketch $nfps not < half of $ng grams")
    }
    val ratio = long.map(r => r._3.toDouble / r._2).sum / long.size
    info(f"mean sketch/grams ratio over ${long.size} docs: $ratio%.3f " +
      f"(theory ~${2.0 / (CrawlQueries.WinnowW + 1)}%.3f)")
  }

  // --------------------------------------------------------- classifier

  test("q_quality_classifier matches a driver-side hashed-linear scorer") {
    val b = CrawlQueries.ClassifierBuckets
    val expected = docs.sortBy(_._1).map { case (id, text) =>
      val feats = text.toLowerCase.split(" ", -1).filter(_.nonEmpty).distinct
      val score = feats.map { f =>
        val hex = md5hex(f)
        val bucket = (Character.digit(hex.charAt(0), 16) * 16 +
          Character.digit(hex.charAt(1), 16)) % b
        (bucket.toLong * 2654435761L) % 201 - 100
      }.sum
      (id, feats.length, score, if (score >= 0) 1 else 0)
    }
    val got = CrawlQueries.qQualityClassifier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got === expected)
    // the closed-form weights split the corpus: both classes present
    assert(got.exists(_._4 == 1) && got.exists(_._4 == 0),
      "degenerate classifier: one-sided keep decisions")
  }

  // ---------------------------------------------------------- robots gate

  test("q_robots_gate matches a driver-side RFC 9309 longest-match replica") {
    // driver replica of the rule table and the longest-match/allow-ties rule
    def rules(h: Long): Seq[(String, String)] =
      if (h % 3 == 0) Seq(("disallow", "/page/1"), ("allow", "/page/12"),
        ("disallow", "/private/"))
      else if (h % 5 == 0) Seq(("disallow", "/private/"),
        ("disallow", "/page/3"), ("allow", "/page/3"))
      else Seq(("disallow", "/private/"))
    val expect = docs.map { case (id, _) =>
      val h = id % CrawlQueries.RobotsHosts
      val path = (if (id % 9 == 0) "/private" else "") + s"/page/${id % 100}"
      val ms = rules(h).filter { case (_, p) => path.startsWith(p) }
      val verdict =
        if (ms.isEmpty) "allow"
        else {
          // longest prefix wins; allow beats disallow at equal length
          val best = ms.maxBy { case (k, p) => (p.length, if (k == "allow") 1 else 0, p) }
          if (best._1 == "allow") "allow" else "disallow"
        }
      val matched = if (ms.isEmpty) "-"
        else ms.maxBy { case (k, p) => (p.length, if (k == "allow") 1 else 0, p) }._2
      (id, s"h$h", path, verdict, matched, ms.size.toLong)
    }.sortBy(_._1)
    val got = CrawlQueries.qRobotsGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5))).toSeq
    assert(got === expect)
    // the REP semantics are genuinely exercised: a /private path is
    // disallowed, the more specific /page/12 allow overrides /page/1,
    // and the equal-length allow/disallow tie resolves to allow
    assert(got.exists(r => r._4 == "disallow" && r._5 == "/private/"))
    assert(got.exists(r => r._4 == "allow" && r._5 == "/page/12"))
    assert(got.exists(r => r._4 == "allow" && r._5 == "/page/3"),
      "the allow-wins tie case never fired")
  }

  // ------------------------------------------------------ classifier sweep

  test("q_classifier_sweep matches a driver-side confusion-table replica " +
    "and keep-rate is monotone in the threshold") {
    // driver replica of the hashed-linear score + heuristic label
    def score(t: String): Long =
      t.toLowerCase.split(' ').filter(_.nonEmpty).distinct.map { w =>
        val hx = md5hex(w)
        val b = (Character.digit(hx.charAt(0), 16) * 16 +
          Character.digit(hx.charAt(1), 16)) % CrawlQueries.ClassifierBuckets
        (b.toLong * 2654435761L) % 201 - 100
      }.sum
    def label(t: String): Int = {
      val nw = t.split(' ').count(_.nonEmpty)
      if (nw >= 40 && t.length.toLong * 1000 / nw <= 5600) 1 else 0
    }
    val scored = docs.map { case (_, t) => (score(t), label(t)) }
    val expect = CrawlQueries.SweepThresholds.map { th =>
      val tp = scored.count { case (s, l) => s >= th && l == 1 }.toLong
      val fp = scored.count { case (s, l) => s >= th && l == 0 }.toLong
      val fn = scored.count { case (s, l) => s < th && l == 1 }.toLong
      val tn = scored.count { case (s, l) => s < th && l == 0 }.toLong
      val prec = if (tp + fp > 0) tp * 1000 / (tp + fp) else -1L
      val rec = if (tp + fn > 0) tp * 1000 / (tp + fn) else -1L
      (th, tp, fp, fn, tn, prec, rec, (tp + fp) * 1000 / (tp + fp + fn + tn))
    }
    val got = CrawlQueries.qClassifierSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === expect)
    // sweep sanity: keep-rate and recall are non-increasing in the
    // threshold, and both label classes exist
    assert(got.map(_._8) === got.map(_._8).sorted.reverse, "keep not monotone")
    assert(got.map(_._7) === got.map(_._7).sorted.reverse, "recall not monotone")
    assert(scored.exists(_._2 == 1) && scored.exists(_._2 == 0))
  }

  // ------------------------------------------------------- URL-shape gate

  test("q_url_shape matches a driver replica; all four reason classes fire") {
    val allIds = graft.queries.Tables.documents(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    val expect = allIds.map { id =>
      val depth = id % 7
      val segs = (1L to depth).map(i =>
        if (id % 13 == 0) s"p$id$i" else s"sec$i")
      val url = s"https://h${id % 20}.example.com/" + segs.mkString("/")
      val len = url.length.toLong
      val digits = url.count(_.isDigit).toLong
      val dpm = digits * 1000 / len
      val reason =
        if (depth > graft.queries.CrawlQueries.UrlMaxDepth) "depth"
        else if (len > graft.queries.CrawlQueries.UrlMaxLen) "length"
        else if (dpm > graft.queries.CrawlQueries.UrlMaxDigitPermille) "digits"
        else "pass"
      (id, url, depth, len, digits, dpm, reason,
        if (reason == "pass") 1L else 0L)
    }.toSet
    val got = graft.queries.CrawlQueries.qUrlShape(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7))).toSet
    assert(got === expect)
    // the first-failing order must be doing real work: every reason class
    // occurs, and depth-6 URLs (which also exceed the length bar)
    // attribute to 'depth', never 'length'
    for (rc <- Seq("pass", "depth", "length", "digits"))
      assert(got.exists(_._7 == rc), s"reason class $rc never fired")
    assert(got.filter(_._3 == 6L).forall(_._7 == "depth"),
      "depth-6 URL attributed past the first failing rule")
  }
}
