package graft

import graft.queries.OpsQueries
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the pipeline-assembly family
  * (q_attribute_mixer, q_host_reputation, q_crawl_politeness,
  * q_topic_keywords): plain-Scala replicas of each derivation over the
  * same sf0.001 corpus, compared row-for-row against the distributed
  * query — the same second-implementation discipline as CrawlSpec. The
  * DuckDB oracle checks Spark-vs-SQL; this checks both against no query
  * engine at all. */
class OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String)] =
    graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Shared quality-rule replica: (n_words, word_chars, keep). */
  private def qualityKeep(text: String): Int = {
    val nWords = text.count(_ == ' ') + 1L
    val wordChars = (text.length - text.count(_ == ' ')).toLong
    val mwl = wordChars * 100 / nWords
    if (nWords >= 25 && mwl >= 200 && mwl <= 1200) 1 else 0
  }

  private val domains = Seq("example.com", "test.org", "sample.net", "tracker.xyz")
  private def hostOf(id: Long): String = s"h${id % 20}.${domains((id % 4).toInt)}"

  // ------------------------------------------------------ attribute mixer

  test("q_attribute_mixer matches a driver-side three-tagger mix") {
    val expected = docs.sortBy(_._1).map { case (id, text, lang) =>
      val langOk = if (lang == "en" || lang == "es") 1 else 0
      val qOk = qualityKeep(text)
      val toxHits = text.toLowerCase.split(" ", -1)
        .count(w => OpsQueries.ToxLexicon.contains(w)).toLong
      val toxOk = if (toxHits <= 2) 1 else 0
      val keep = if (langOk == 1 && qOk == 1 && toxOk == 1) 1 else 0
      val reason =
        if (langOk == 0) "language"
        else if (qOk == 0) "quality"
        else if (toxOk == 0) "toxicity"
        else "ok"
      (id, langOk, qOk, toxHits, toxOk, keep, reason)
    }
    val got = OpsQueries.qAttributeMixer(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getString(6))).toSeq
    assert(got === expected)
    // both verdict classes and the ordered attribution are exercised
    assert(got.exists(_._6 == 1) && got.exists(_._6 == 0))
    assert(got.exists(_._7 == "language") && got.exists(_._7 == "ok"),
      "mix rule degenerate: first or last attribution class missing")
    // first-failing order: a doc failing language NEVER reports a later tag
    got.filter(_._2 == 0).foreach { r =>
      assert(r._7 == "language", s"doc ${r._1} skipped the language tag")
    }
  }

  // ------------------------------------------------------ host reputation

  test("q_host_reputation matches a driver-side domain-level gate") {
    val perDoc = docs.map { case (id, text, _) => (id, hostOf(id), qualityKeep(text)) }
    val rep = perDoc.groupBy(_._2).map { case (h, rows) =>
      h -> rows.map(_._3.toLong).sum * 1000 / rows.size
    }
    val expected = perDoc.sortBy(_._1).map { case (id, h, dk) =>
      val kp = rep(h)
      val blocked = if (kp < OpsQueries.HostBlockPermille) 1 else 0
      (id, h, dk, kp, blocked, if (dk == 1 && blocked == 0) 1 else 0)
    }
    val got = OpsQueries.qHostReputation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(got === expected)
    // the cutoff genuinely splits the host space at this corpus
    assert(got.exists(_._5 == 1) && got.exists(_._5 == 0),
      "block cutoff degenerate: every host on one side")
    // the domain channel changes real decisions: some doc passes the
    // per-document rule yet drops because its host is blocked
    assert(got.exists(r => r._3 == 1 && r._6 == 0),
      "no document was gated by host reputation alone")
  }

  // ----------------------------------------------------- crawl politeness

  test("q_crawl_politeness matches a driver-side back-queue accounting") {
    val hosts = docs.groupBy(d => hostOf(d._1)).map { case (h, rows) =>
      val drain = rows.size.toLong * OpsQueries.PolitenessDelaySec
      val queue = Character.digit(md5hex(h).charAt(0), 16) % OpsQueries.PolitenessQueues
      (h, rows.size.toLong, drain, queue)
    }.toSeq
    val totalDrain = hosts.map(_._3).sum
    val expected = hosts.groupBy(_._4).toSeq.sortBy(_._1).map { case (q, hs) =>
      val qDrain = hs.map(_._3).sum
      val maxDrain = hs.map(_._3).max
      val bottleneck = hs.filter(_._3 == maxDrain).map(_._1).min
      val share = qDrain * 1000 / totalDrain
      (q, hs.size.toLong, hs.map(_._2).sum, qDrain, maxDrain, bottleneck,
        share, if (share >= 150) 1 else 0)
    }
    val got = OpsQueries.qCrawlPoliteness(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6), r.getInt(7))).toSeq
    assert(got === expected)
    // queue accounting is conservative: shares sum to ~1000 (one flooring
    // per queue), every page is drained exactly once
    assert(got.map(_._3).sum === docs.size.toLong)
    val shareSum = got.map(_._7).sum
    assert(shareSum > 1000 - got.size && shareSum <= 1000)
  }

  // ------------------------------------------------------- topic routing

  test("q_topic_keywords matches a driver-side lexicon argmax") {
    val lex = OpsQueries.TopicLexicons
    val expected = docs.sortBy(_._1).map { case (id, text, _) =>
      val ws = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
      val hs = lex.map { case (_, words) => ws.count(words.contains).toLong }
      val topic =
        if (hs.max == 0) "other"
        else if (hs(0) >= hs(1) && hs(0) >= hs(2)) lex(0)._1
        else if (hs(1) >= hs(2)) lex(1)._1
        else lex(2)._1
      (id, hs(0), hs(1), hs(2), topic)
    }
    val got = OpsQueries.qTopicKeywords(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got === expected)
    // routing is non-degenerate: at least two topics receive documents
    assert(got.map(_._5).distinct.size >= 2,
      "every document routed to one topic — lexicons mis-sized")
  }

  // ---------------------------------------------------------- CDC upsert

  test("q_cdc_upsert matches a driver-side MERGE replica; all ops fire") {
    val live = docs.filter(_._2 != null)
    val base = live.filter(_._1 < OpsQueries.CdcBaseMax)
      .map { case (id, t, _) => id -> ((md5hex(t), t.length.toLong)) }.toMap
    val delta = (live.filter(_._1 >= OpsQueries.CdcDeltaMin).map {
      case (id, t, _) =>
        (id - OpsQueries.CdcShift,
          (md5hex(t), t.length.toLong, if (id % 10 == 0) 1L else 0L))
    } ++ live.filter(_._1 >= OpsQueries.CdcInsertMin).map { case (id, t, _) =>
      (id, (md5hex(t), t.length.toLong, if (id % 10 == 5) 1L else 0L))
    }).toMap
    // n_chars in the table is the text length for these synthetic docs —
    // but the query reads the n_chars COLUMN; re-read it to stay honest
    val nChars = graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseN = base.map { case (k, (p, _)) => k -> ((p, nChars(k))) }
    val deltaN = delta.map { case (k, (p, _, tomb)) =>
      val srcId = if (delta.contains(k) && k < OpsQueries.CdcBaseMax + 100
        && k >= OpsQueries.CdcDeltaMin - OpsQueries.CdcShift
        && !(k >= OpsQueries.CdcInsertMin)) k + OpsQueries.CdcShift else k
      k -> ((p, nChars(srcId), tomb))
    }
    val keys = (baseN.keySet ++ deltaN.keySet).toSeq.sorted
    val expect = keys.map { k =>
      val b = baseN.get(k)
      val d = deltaN.get(k)
      val op = (b, d) match {
        case (_, None) => "carry"
        case (Some(_), Some((_, _, 1L))) => "delete"
        case (None, Some((_, _, 1L))) => "delete_miss"
        case (None, Some(_)) => "insert"
        case _ => "update"
      }
      val survives = if (Set("carry", "insert", "update")(op)) 1L else 0L
      val payload = if (survives == 1L)
        d.map(_._1).getOrElse(b.get._1) else ""
      val chars = if (survives == 1L)
        d.map(_._2).getOrElse(b.get._2) else -1L
      val changed = if (op == "update" && d.get._1 != b.get._1) 1L else 0L
      (k, op, survives, payload, chars, changed)
    }.toSet
    val got = OpsQueries.qCdcUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    // every MERGE op class must actually occur — including the
    // idempotent-replay delete_miss
    val ops = got.map(_._2)
    for (op <- Seq("carry", "update", "insert", "delete", "delete_miss"))
      assert(ops.contains(op), s"op class $op never fired")
    // deletes remove their keys' payloads; carries keep base payloads
    assert(got.filter(_._2 == "delete").forall(r => r._3 == 0L && r._4 == ""))
  }
}
