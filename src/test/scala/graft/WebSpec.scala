package graft

import graft.functions.TextHash
import graft.queries.WebQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the web-corpus round-3 family
  * (mojibake repair, anchor-text aggregation, LSH tuning sweep, Luhn card
  * scrub, shard assembly) — plain-Scala replicas over sf0.001 compared
  * row-for-row, plus the semantic guarantees the hash oracle can't state
  * (repair is a byte-exact inverse of the corruption; the Luhn gate both
  * fires and refuses; recall is pooled-complete at r=2) and the plan
  * contracts (scalar operators stay exchange-free bar their final sort;
  * the tuning sweep never ships text through an Exchange).
  */
class WebSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String, Long)] =
    graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  private def exchangeBlocks(df: DataFrame): Seq[String] =
    df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
      .split("\n\n")
      .filter(b => b.linesIterator.hasNext &&
        b.linesIterator.next().matches(""".*\)\s*(Exchange|BroadcastExchange).*"""))
      .toSeq

  // ------------------------------------------------------- mojibake repair

  test("q_fix_mojibake is the byte-exact inverse of the planted corruption") {
    val got = WebQueries.qFixMojibake(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // the repair table round-trips: moji(clean) repaired == clean
    for ((moji, clean) <- WebQueries.MojiPairs)
      assert(new String(clean.getBytes("UTF-8"), "windows-1252") == moji)
    val expect = docs.map { case (id, t, _, _) =>
      val raw = if (id % 3 == 0) t + WebQueries.MojiDirtySuffix else t
      val repaired = WebQueries.MojiPairs.foldLeft(raw) {
        case (acc, (moji, clean)) => acc.replace(moji, clean)
      }
      val nFixes = WebQueries.MojiPairs.map { case (moji, _) =>
        (raw.length - raw.replace(moji, "").length) / moji.length
      }.sum.toLong
      id -> ((repaired, nFixes))
    }.toMap
    assert(got === expect)
    // planted docs recover the CLEAN suffix exactly; unplanted are no-ops
    for ((id, t, _, _) <- docs) {
      if (id % 3 == 0) {
        assert(got(id)._1 == t + WebQueries.MojiCleanSuffix,
          s"doc $id did not repair to the clean suffix")
        assert(got(id)._2 > 0)
      } else {
        assert(got(id)._1 == t && got(id)._2 == 0L,
          s"doc $id changed without planted mojibake")
      }
    }
  }

  test("mojibake plan is a pure scalar map: no join/agg, only spread + sort") {
    val q = WebQueries.qFixMojibake(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "unexpected join in a scalar repair")
    assert(!plan.contains("HashAggregate"), "unexpected aggregate")
    // allowed exchanges: the conditional scan-spread (round-robin; absent
    // once the scan has real splits) and the final presentation sort —
    // never a hash-partitioned shuffle, never a second round-robin
    val blocks = exchangeBlocks(q)
    assert(blocks.count(_.contains("RoundRobinPartitioning")) <= 1,
      "only the one conditional scan-spread may be round-robin")
    assert(blocks.filterNot(_.contains("RoundRobinPartitioning")).size <= 1,
      "more than the final sort's exchange")
    assert(!plan.contains("hashpartitioning"), "unexpected hash shuffle")
  }

  // ---------------------------------------------------------- anchor text

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_anchor_text matches a driver-side link+anchor derivation") {
    val hex = "0123456789abcdef"
    val links = docs.filter(_._2 != null).flatMap { case (id, t, _, _) =>
      val hh = md5hex(t)
      val src = s"h${id % 20}"
      (1 to 3).flatMap { k =>
        val dst = s"h${((hex.indexOf(hh(2 * k - 2)) * 16 + hex.indexOf(hh(2 * k - 1))) % 20)}"
        val widx = (hex.indexOf(hh(6 + 2 * k - 2)) * 16 + hex.indexOf(hh(6 + 2 * k - 1))) %
          WebQueries.AnchorWords.size
        if (src != dst) Some((dst, WebQueries.AnchorWords(widx))) else None
      }
    }
    val rollup = links.groupBy(identity).map { case ((d, w), xs) => (d, w, xs.size.toLong) }
    val totals = rollup.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._3).sum }
    val expect = rollup.groupBy(_._1).flatMap { case (d, xs) =>
      xs.toSeq.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex.map {
        case ((_, w, c), i) => (d, i + 1, w, c, totals(d))
      }
    }.toSet
    val got = WebQueries.qAnchorText(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expect)
    // every dst has contiguous ranks starting at 1
    val byDst = got.groupBy(_._1)
    for ((d, rows) <- byDst)
      assert(rows.map(_._2).toSeq.sorted == (1 to rows.size).toSeq,
        s"ranks not contiguous for $d")
  }

  // ------------------------------------------------------ LSH tuning sweep

  test("q_lsh_tuning matches a driver-side sweep and r=2 pools all truth") {
    // replica corpus
    val base = docs.filter(_._1 % 5 == 0).map(d => (d._1, d._2))
    val corpus = base ++
      base.filter(_._1 % 10 == 0).map { case (id, t) => (id + 1000000L, t) } ++
      base.filter(_._1 % 15 == 0).map { case (id, t) =>
        (id + 2000000L, t + " nearly duplicate tail")
      }
    val sigs = corpus.map { case (id, t) => id -> TextHash.minhash(t) }.toMap
    val sets = corpus.map { case (id, t) => id -> TextHash.shingleSet(t) }.toMap
    def bands(sig: Array[Long], r: Int): Seq[Long] =
      (0 until sig.length / r).map { b =>
        (0 until r).foldLeft(0L)((k, j) => (k * 131L + sig(b * r + j)) % WebQueries.TuneM)
      }
    def candsOf(r: Int): Set[(Long, Long)] = {
      val byKey = corpus.flatMap { case (id, _) =>
        bands(sigs(id), r).zipWithIndex.map { case (k, b) => ((b, k), id) }
      }.groupBy(_._1)
      byKey.values.flatMap { xs =>
        val ids = xs.map(_._2).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
      }.toSet
    }
    def jac(a: Long, b: Long): Long = {
      val (sa, sb) = (sets(a), sets(b))
      val inter = TextHash.sortedIntersect(sa, sb)
      val union = sa.length.toLong + sb.length.toLong - inter
      if (union == 0) 0L else inter * 1000L / union
    }
    val perCfg = WebQueries.TuneConfigs.map(r => r -> candsOf(r)).toMap
    val pool = perCfg.values.reduce(_ union _)
    val trueSet = pool.filter { case (a, b) => jac(a, b) >= WebQueries.TuneJacMin }
    val expect = WebQueries.TuneConfigs.map { r =>
      val c = perCfg(r)
      val t = (c intersect trueSet).size.toLong
      (r, TextHash.MinHashK / r, c.size.toLong, t,
        if (c.nonEmpty) t * 1000 / c.size else 0L,
        if (trueSet.nonEmpty) t * 1000 / trueSet.size else 0L)
    }
    val got = WebQueries.qLshTuning(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
    // r=2 is the loosest swept config: an r=4/r=8 band match implies both
    // covered r=2 bands match, so r=2's candidates pool every candidate
    // -> pooled recall is total
    assert(got.head._1 == 2 && got.head._6 == 1000L,
      "r=2 must recall the full pooled truth")
    // candidate volume (and with it recall) only shrinks as bands widen
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, "candidates not monotone")
    assert(got.map(_._6) == got.map(_._6).sorted.reverse, "recall not monotone")
    assert(trueSet.nonEmpty, "no true near-dup pairs planted")
  }

  test("tuning sweep never ships document text through an Exchange") {
    val q = WebQueries.qLshTuning(spark, dir)
    val offending = exchangeBlocks(q).filter(_.matches("""(?s).*\btext#.*"""))
    assert(offending.isEmpty,
      s"text column in an Exchange:\n${offending.mkString("\n")}")
  }

  // ------------------------------------------------------- Luhn card scrub

  test("q_scrub_luhn redacts exactly the Luhn-valid planted numbers") {
    val got = WebQueries.qScrubLuhn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    val expect = docs.map { case (id, t, _, _) =>
      val ds = WebQueries.LuhnMult.zipWithIndex.map { case (m, i0) =>
        ((id * m + i0 + 1) % 10).toInt
      }
      val num = ds.mkString
      val sum = ds.zipWithIndex.map { case (d, i0) =>
        if ((i0 + 1) % 2 == 1) 2 * d - (if (d >= 5) 9 else 0) else d
      }.sum
      val valid = sum % 10 == 0
      val planted = s"$t pay $num now"
      id -> ((if (valid) 1 else 0,
        if (valid) planted.replace(num, "[CARD]") else planted))
    }.toMap
    assert(got === expect)
    // the gate must both fire and refuse somewhere
    assert(got.values.exists(_._1 == 1), "no Luhn-valid number planted")
    assert(got.values.exists(_._1 == 0), "no Luhn-invalid number planted")
    for ((id, (v, s)) <- got)
      assert((v == 1) == s.contains("[CARD]"), s"gate/redaction disagree on $id")
  }

  test("luhn plan is a pure scalar map: no join/agg, only the sort exchanges") {
    val q = WebQueries.qScrubLuhn(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "unexpected join in a scalar scrub")
    assert(!plan.contains("HashAggregate"), "unexpected aggregate")
    assert(exchangeBlocks(q).size <= 1, "more than the final sort's exchange")
  }

  // --------------------------------------------------- passage chunking

  test("q_chunk_passages: replica-exact digests and byte-exact reassembly") {
    val W = WebQueries.ChunkWinTok
    val S = WebQueries.ChunkStride
    val got = WebQueries.qChunkPassages(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val expect = docs.flatMap { case (id, t, _, _) =>
      val toks = t.split(" ", -1)
      val nChunks = (toks.length - 1) / S + 1
      (0 until nChunks).map { k =>
        val c = toks.slice(k * S, k * S + W)
        (id, k.toLong) -> (((k * S).toLong, c.length.toLong,
          md5hex(c.mkString(" "))))
      }
    }.toMap
    assert(got === expect)
    // overlap + reassembly: the stride-prefix of every chunk, concatenated
    // in order, reproduces the document tokens byte-exactly
    for ((id, t, _, _) <- docs) {
      val toks = t.split(" ", -1)
      val nChunks = (toks.length - 1) / S + 1
      val rebuilt = (0 until nChunks).flatMap { k =>
        val c = toks.slice(k * S, k * S + W)
        if (k == nChunks - 1) c else c.take(S)
      }
      assert(rebuilt.mkString(" ") == t, s"doc $id reassembly")
      // consecutive chunks overlap by W - S tokens (when both are full)
      for (k <- 0 until nChunks - 2) {
        val a = toks.slice(k * S, k * S + W)
        val b = toks.slice((k + 1) * S, (k + 1) * S + W)
        if (a.length == W) assert(a.drop(S).sameElements(b.take(W - S)))
      }
    }
  }

  // --------------------------------------------------- langid confusion

  test("q_langid_confusion matches a driver replica; mislabels land off-diagonal") {
    val langs = WebQueries.ConfLangs
    val cells = docs.map { case (id, _, lang, _) =>
      val markerLang =
        if (id % 9 == 0) langs((langs.indexOf(lang) + 1) % langs.size) else lang
      // the argmax guesser can only ever land on the planted marker here
      (lang, markerLang)
    }
    val expect = cells.groupBy(identity).map { case ((d, g), xs) =>
      (d, g, xs.size.toLong)
    }.toSet
    val got = WebQueries.qLangidConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expect)
    // diagonal dominates; the planted mislabel channel is visible
    val diag = got.filter(x => x._1 == x._2).map(_._3).sum
    val off = got.filter(x => x._1 != x._2).map(_._3).sum
    assert(off > 0, "no mislabeled docs planted")
    assert(diag > off * 4, s"diagonal $diag not dominant over $off")
  }

  // ------------------------------------------------- HLL register sketch

  test("q_hll_registers: merged == direct, replica-exact, estimate in bounds") {
    val rows = WebQueries.qHllRegisters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = rows.head._3
    assert(rows.forall(_._3 == exact))
    // driver replica: same md5-nibble hash, same register/rank split,
    // computed DIRECTLY (no per-source partials) — merge must not matter
    val hex = "0123456789abcdef"
    val direct = scala.collection.mutable.Map[Long, Long]()
    val ids = docs.map(_._1)
    for (id <- ids) {
      val hh = md5hex(id.toString.reverse.padTo(8, '0').reverse.mkString)
      val h = (1 to 8).map(j => hex.indexOf(hh(j - 1)).toLong << (4 * (8 - j))).sum
      val reg = h >> WebQueries.HllW
      val hp = h & ((1L << WebQueries.HllW) - 1)
      val rank =
        if (hp > 0) WebQueries.HllW - (63 - java.lang.Long.numberOfLeadingZeros(hp))
        else WebQueries.HllW + 1
      direct(reg) = math.max(direct.getOrElse(reg, 0L), rank)
    }
    assert(rows.map(r => (r._1, r._2)).toMap === direct.toMap)
    assert(exact == ids.distinct.size.toLong)
    // the float HLL estimate from these registers certifies sketch quality
    val m = WebQueries.HllM
    val z = rows.map(r => math.pow(2.0, -r._2.toDouble)).sum + (m - rows.length)
    var est = 0.709 * m * m / z
    val zeros = m - rows.length
    if (est <= 2.5 * m && zeros > 0) est = m * math.log(m.toDouble / zeros)
    assert(math.abs(est - exact) <= 0.30 * exact,
      s"HLL estimate $est more than 30% off exact $exact")
  }

  // ------------------------------------------------- recrawl scheduling

  test("q_recrawl_schedule tiers follow the change-ratio rule") {
    val got = graft.queries.SearchQueries.qRecrawlSchedule(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6)))
    assert(got.nonEmpty)
    val tiers = got.map(_._6).toSet
    assert(tiers == Set("hot", "warm", "cold", "unseen"),
      s"expected all four tiers to fire, got $tiers")
    for ((url, snaps, vers, latest, cp, tier, next) <- got) {
      val expCp = if (snaps > 1) (vers - 1) * 1000 / (snaps - 1) else 0L
      assert(cp == expCp, s"$url change_permille")
      val expTier =
        if (snaps == 1) "unseen"
        else if (cp >= 500) "hot"
        else if (vers > 1) "warm"
        else "cold"
      assert(tier == expTier, s"$url tier")
      val interval = tier match {
        case "hot" => graft.queries.SearchQueries.RecrawlHotS
        case "cold" => graft.queries.SearchQueries.RecrawlColdS
        case _ => graft.queries.SearchQueries.RecrawlWarmS
      }
      assert(next == latest + interval, s"$url next_fetch_ts")
    }
  }

  // ------------------------------------------------------- shard assembly

  test("q_shard_assembly matches a driver-side running-sum packer") {
    val kept = docs.filter(_._4 >= WebQueries.ShardMinChars)
      .map { case (id, t, lang, _) =>
        (lang, id, t.split(" ", -1).length.toLong)
      }
    val expect = kept.groupBy(_._1).flatMap { case (lang, xs) =>
      var before = 0L
      val assigned = xs.sortBy(_._2).map { case (_, id, toks) =>
        val shard = before / WebQueries.ShardBudget
        before += toks
        (shard, id, toks)
      }
      assigned.groupBy(_._1).map { case (shard, ys) =>
        (lang, shard, ys.size.toLong, ys.map(_._3).sum,
          ys.map(_._2).min, ys.map(_._2).max)
      }
    }.toSet
    val got = WebQueries.qShardAssembly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    // shards are contiguous from 0 within each language, and shard s opens
    // exactly when the running total lands in [s·B, (s+1)·B): the tokens
    // accumulated through shard s-1 must sit in that band for every s ≥ 1
    for ((lang, rows) <- got.groupBy(_._1)) {
      val byShard = rows.toSeq.sortBy(_._2)
      val shards = byShard.map(_._2)
      assert(shards == (0L until shards.size).toSeq, s"$lang shards not contiguous")
      val cum = byShard.map(_._4).scanLeft(0L)(_ + _)
      for (s <- 1 until byShard.size) {
        val b = WebQueries.ShardBudget
        assert(cum(s) >= s * b && cum(s) < (s + 1) * b,
          s"$lang shard $s opened at ${cum(s)}, outside [${s * b}, ${(s + 1) * b})")
      }
    }
  }
}
