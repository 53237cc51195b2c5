package graft

import graft.functions.TextHash
import graft.queries.SearchQueries
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the retrieval & recrawl
  * family (q_simhash_near, q_tfidf_terms, q_bm25_search, q_recrawl_latest,
  * q_host_cap): plain-Scala replicas over the same sf0.001 corpus compared
  * row-for-row against the distributed queries. The DuckDB oracle checks
  * Spark-vs-SQL; this checks both against no query engine at all — and
  * pins the semantic guarantees (blocking completeness, cap exactness)
  * the hash compare alone can't state. */
class SearchSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String)] =
    graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Driver replica of TextQueries.dedupCorpus. */
  private lazy val corpus: Seq[(Long, String)] =
    docs ++
      docs.collect { case (id, t) if id % 10 == 0 => (id + 1000000L, t) } ++
      docs.collect { case (id, t) if id % 7 == 0 =>
        (id + 2000000L, t + " nearly duplicate tail") }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  // --------------------------------------------------------- simhash near

  test("q_simhash_near equals brute-force Hamming<=3 over all pairs " +
    "(Manku blocking is complete, not just a candidate heuristic)") {
    val fps = corpus.map { case (id, t) => (id, TextHash.simhash32(t)) }
    val brute = (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.size
      (ia, fa) = fps(i)
      (ib, fb) = fps(j)
      ham = java.lang.Long.bitCount(fa ^ fb)
      if ham <= SearchQueries.HamMax
    } yield {
      val (a, b) = if (ia < ib) (ia, ib) else (ib, ia)
      (a, b, ham.toLong)
    }).toSet
    val got = SearchQueries.qSimhashNear(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // planted exact duplicates verify at distance 0
    for ((id, _) <- docs if id % 10 == 0)
      assert(got.contains((id, id + 1000000L, 0L)),
        s"exact dup pair ($id, ${id + 1000000L}) missing at hamming 0")
  }

  test("simhash32 bit contract: block keys partition the fingerprint") {
    for ((_, t) <- docs.take(20)) {
      val fp = TextHash.simhash32(t)
      val reassembled = (0 until SearchQueries.Bands).map { b =>
        ((fp >> (SearchQueries.BandBits * b)) & 255L) << (SearchQueries.BandBits * b)
      }.reduce(_ | _)
      assert(reassembled === fp)
      assert((fp >>> 32) === 0L, "fingerprint must fit 32 bits")
    }
  }

  // -------------------------------------------------------------- tf-idf

  private def tokens(t: String): Seq[String] =
    t.split(' ').filter(_.nonEmpty).toSeq

  test("q_tfidf_terms matches a driver-side tf-idf argmax per doc") {
    val n = docs.size.toLong
    val tf = docs.flatMap { case (id, t) =>
      tokens(t).groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, g) => (w, g.size.toLong) }
    val expect = tf.groupBy(_._1).map { case (id, rows) =>
      val scored = rows.map { case (_, w, f) =>
        (w, f, df(w), f * ((n * SearchQueries.IdfScale) / df(w)))
      }
      // (score desc, term asc) — the pinned tie order
      val top = scored.minBy { case (w, _, _, s) => (-s, w) }
      id -> top
    }
    val got = SearchQueries.qTfidfTerms(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
  }

  // ---------------------------------------------------------------- bm25

  test("q_bm25_search matches a driver-side exact-integer BM25 top-20") {
    val n = docs.size.toLong
    val dls = docs.map { case (id, t) => id -> tokens(t).size.toLong }.toMap
    val tTok = dls.values.sum
    val tf = docs.flatMap { case (id, t) =>
      tokens(t).filter(SearchQueries.Bm25Terms.contains)
        .groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, g) => (w, g.size.toLong) }
    val scores = tf.groupBy(_._1).map { case (id, rows) =>
      val dl = dls(id)
      val s = rows.map { case (_, w, f) =>
        val idf = ((n - df(w)) * SearchQueries.Bm25IdfScale) / (df(w) + 1)
        val tfsat = (44 * f * tTok * SearchQueries.Bm25TfScale) /
          (20 * f * tTok + 6 * tTok + 18 * dl * n)
        idf * tfsat
      }.sum
      (id, dl, rows.size.toLong, s)
    }.toSeq
    val expect = scores.sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    val got = SearchQueries.qBm25Search(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    assert(got.size === 20)
    assert(got.forall(_._4 > 0L))
  }

  // ------------------------------------------------------------- recrawl

  test("q_recrawl_latest: churn accounting matches the planted snapshot plan") {
    val rows = SearchQueries.qRecrawlLatest(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getInt(5))))
      .toMap
    assert(rows.size === docs.size)
    for ((id, t) <- docs) {
      val (nSnaps, nVers, latestTs, latestDigest, changed) = rows(s"page$id")
      val expSnaps = 1L + (if (id % 2 == 0) 1L else 0L) +
        (if (id % 3 == 0) 1L else 0L) + (if (id % 5 == 0) 1L else 0L)
      assert(nSnaps === expSnaps, s"page$id snapshot count")
      if (id % 3 == 0) {
        // the %3 changed recrawl gives 2 distinct versions; the latest
        // snapshot is the %5 unchanged t3 when it exists, else the t2 v2
        assert(nVers === 2L && changed === 1)
        if (id % 5 == 0) {
          assert(latestTs === SearchQueries.RecrawlT0 + 259200L)
          assert(latestDigest === md5hex(t))
        } else {
          assert(latestTs === SearchQueries.RecrawlT0 + 172800L)
          assert(latestDigest === md5hex(t + " v2"))
        }
      } else {
        // only byte-identical recrawls (or a single crawl): unchanged
        assert(nVers === 1L && changed === 0, s"page$id should be unchanged")
        assert(latestDigest === md5hex(t))
      }
    }
  }

  // ------------------------------------------------------------- host cap

  test("q_host_cap keeps exactly min(K, host size) docs per host, best-first") {
    val got = SearchQueries.qHostCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    assert(got.length === docs.size)
    val byHost = got.groupBy(_._2)
    for ((host, rows) <- byHost) {
      val kept = rows.count(_._5 == 1)
      assert(kept === math.min(SearchQueries.HostCapK, rows.length),
        s"$host kept $kept of ${rows.length}")
      // rank order = (doc_len desc, doc_id asc), ranks 1..n, kept = rank<=K
      val sorted = rows.sortBy { case (id, _, len, _, _) => (-len, id) }
      for ((row, i) <- sorted.zipWithIndex) {
        assert(row._4 === i + 1L, s"$host rank of doc ${row._1}")
        assert((row._5 == 1) === (i + 1 <= SearchQueries.HostCapK))
      }
    }
    // the cap genuinely binds at this SF (500 docs / 20 hosts = 25 > K)
    assert(byHost.values.exists(_.length > SearchQueries.HostCapK))
  }
}
