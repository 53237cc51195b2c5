package graft

import graft.functions.TextHash
import graft.queries.CleanQueries
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the round-2 cleaning family
  * (q_c4_line_filter, q_dedup_incremental_fuzzy) — plain-Scala replicas
  * over sf0.001 compared row-for-row, plus the semantic guarantees the
  * hash oracle can't state (every planted class exercised; fuzzy verdicts
  * consistent with exact recomputed Jaccard). */
class CleanSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String)] =
    graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  // -------------------------------------------------------- C4 line filter

  test("q_c4_line_filter matches a driver-side line-policy replica") {
    val lines = docs.map { case (id, t) =>
      val base =
        if (id % 17 == 0) CleanQueries.C4PolicyPhrase
        else if (id % 11 == 0) t.split(' ').filter(_.nonEmpty).take(3).mkString(" ")
        else t
      val line = base + (if (id % 3 != 0 && id % 17 != 0) "." else "")
      val reason =
        if (line.contains("javascript")) Some("policy")
        else if (line.split(' ').length < CleanQueries.C4MinLineWords) Some("too_short")
        else if (!Seq(".", "!", "?", "\"").exists(line.endsWith)) Some("no_terminal_punct")
        else None
      (id / 5, (id % 5).toInt, line, reason)
    }
    val expect = lines.groupBy(_._1).map { case (page, ls) =>
      val kept = ls.filter(_._4.isEmpty).sortBy(_._2).map(_._3)
      page -> ((ls.size.toLong,
        kept.size.toLong,
        ls.count(_._4.contains("policy")).toLong,
        ls.count(_._4.contains("too_short")).toLong,
        ls.count(_._4.contains("no_terminal_punct")).toLong,
        kept.mkString("\n")))
    }
    val got = CleanQueries.qC4LineFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(got === expect)
    // every rule class fires somewhere, and clean pages survive
    assert(got.values.exists(_._3 > 0), "no policy lines fired")
    assert(got.values.exists(_._4 > 0), "no too_short lines fired")
    assert(got.values.exists(_._5 > 0), "no no_terminal_punct lines fired")
    assert(got.values.exists(v => v._2 > 0 && v._6.nonEmpty), "no page kept any line")
  }

  // ------------------------------------------------- temperature sampling

  test("q_mixture_temperature matches a driver-side CC-100 α=0.5 recipe " +
    "and flattens the language head") {
    val langDocs = graft.queries.Tables.documents(spark, dir)
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val expect = langDocs.groupBy(_._1).map { case (lang, g) =>
      val toks = g.map(_._2.split(' ').length.toLong).sum
      (lang, g.size.toLong, toks, math.sqrt(toks.toDouble).toLong)
    }.toSeq
    val tAll = expect.map(_._3).sum
    val wAll = expect.map(_._4).sum
    val rows = expect.sortBy(_._1).map { case (lang, n, toks, w) =>
      val alloc = CleanQueries.TempBudget * w / wAll
      (lang, n, toks, w, toks * 1000 / tAll, w * 1000 / wAll,
        alloc, alloc * 1000 / toks)
    }
    val got = CleanQueries.qMixtureTemperature(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === rows)
    // α=0.5 flattens: the largest language's temperature share is below
    // its natural share, the smallest language's is above
    val byNat = got.sortBy(_._5)
    assert(byNat.last._6 <= byNat.last._5, "head language must be downweighted")
    assert(byNat.head._6 >= byNat.head._5, "tail language must be upweighted")
  }

  // ------------------------------------------------- wordpiece fertility

  /** Driver replica of the greedy longest-match-first tokenizer. */
  private def wpCount(word: String): Long = {
    val byLen = CleanQueries.WpPieces.groupBy(_.length)
    var pos = 0
    var n = 0L
    while (pos < word.length) {
      val l = (5 to 2 by -1).find(l => pos + l <= word.length &&
        byLen.getOrElse(l, Nil).contains(word.substring(pos, pos + l)))
        .getOrElse(1)
      pos += l
      n += 1
    }
    n
  }

  test("q_wordpiece_fertility matches a driver-side greedy longest-match replica") {
    val expect = docs.map { case (id, t) =>
      val ws = t.split(' ').filter(_.nonEmpty)
      val nw = ws.length.toLong
      val np = ws.map(wpCount).sum
      (id, nw, np, np * 1000 / nw)
    }.sortBy(_._1)
    val got = CleanQueries.qWordpieceFertility(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    // the vocabulary genuinely compresses: multi-char pieces fire (some
    // word has fertility < word length) and no word explodes to letters
    // only everywhere
    val perWord = docs.flatMap(_._2.split(' ').filter(_.nonEmpty)).distinct
      .map(w => (w, wpCount(w)))
    assert(perWord.exists { case (w, n) => n < w.length },
      "multi-char pieces never fired")
    assert(perWord.forall { case (w, n) => n >= 1 && n <= w.length })
    // greedy is longest-match-FIRST: 'spark' must be 1 piece, not sp+ark
    assert(wpCount("spark") === 1L)
  }

  // ----------------------------------------------- incremental fuzzy dedup

  private def shingles(t: String): Set[Long] =
    (0 to t.length - TextHash.ShingleW).map(i => TextHash.shingleHash(t, i)).toSet

  private def jac(a: Set[Long], b: Set[Long]): Long = {
    val inter = (a & b).size.toLong
    val union = a.size.toLong + b.size.toLong - inter
    if (union == 0) 0L else inter * 1000L / union
  }

  test("q_dedup_incremental_fuzzy matches a driver-side two-stage replica") {
    // driver replica of the batch derivation
    val batch =
      docs.collect { case (id, t) if id % 10 == 0 => (id + 1000000L, t) } ++
        docs.collect { case (id, t)
          if id % 7 == 0 && t.length >= CleanQueries.FuzzyNearMinChars =>
            (id + 2000000L, t + " nearly duplicate tail") } ++
        docs.collect { case (id, t) if id % 13 == 0 => (id + 3000000L, t.toUpperCase) }
    val histByDigest = docs.groupBy { case (_, t) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }.map { case (d, g) => d -> g.map(_._1).min }
    val histSets = docs.map { case (id, t) => (id, shingles(t)) }
    def bandsOf(s: Set[Long]): Set[(Int, Long)] =
      TextHash.bandKeys(TextHash.minhashFromSet(s.toArray.sorted))
        .zipWithIndex.map { case (k, b) => (b, k) }.toSet
    val histBands = histSets.map { case (id, s) => (id, bandsOf(s)) }
    val expect = batch.map { case (bid, t) =>
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      histByDigest.get(dig) match {
        case Some(doc) => (bid, "dup_exact", doc, 1000L)
        case None =>
          val bset = shingles(t)
          val bb = bandsOf(bset)
          val verified = histBands
            .filter { case (_, hb) => (hb & bb).nonEmpty }
            .map { case (hid, _) => (hid, jac(bset, histSets.find(_._1 == hid).get._2)) }
            .filter(_._2 >= CleanQueries.FuzzyJacMin)
          if (verified.isEmpty) (bid, "new", -1L, 0L)
          else {
            val bestJac = verified.map(_._2).max
            val bestDoc = verified.filter(_._2 == bestJac).map(_._1).min
            (bid, "dup_near", bestDoc, bestJac)
          }
      }
    }.sortBy(_._1)
    val got = CleanQueries.qDedupIncrementalFuzzy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    // all three verdict classes genuinely occur
    val byVerdict = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byVerdict.getOrElse("dup_exact", 0) > 0)
    assert(byVerdict.getOrElse("dup_near", 0) > 0)
    assert(byVerdict.getOrElse("new", 0) > 0)
    // every exact recrawl resolves to its source doc (or an earlier
    // byte-identical one) and every near-dup match clears the gate
    for ((bid, v, doc, j) <- got) {
      if (v == "dup_exact") { assert(doc <= bid - 1000000L); assert(j === 1000L) }
      if (v == "dup_near") assert(j >= CleanQueries.FuzzyJacMin && j < 1000L)
      if (v == "new") assert(doc === -1L && j === 0L)
    }
  }

  // ------------------------------------------------ duplicate n-gram chars

  test("q_dup_ngrams matches a driver-side Gopher dup-ngram-char replica") {
    val expect = docs.filter(d => d._2 != null && d._2.nonEmpty)
      .map { case (id, t) =>
        val ws = t.split(" ", -1) // Spark split keeps empty tokens
        val tot = t.replace(" ", "").length.toLong
        def dup(n: Int): Long =
          if (ws.length < n) 0L
          else ws.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).collect { case (g, occ) if occ.size > 1 =>
              (occ.size - 1).toLong * g.replace(" ", "").length
            }.sum
        val (d2, d3, d4) = (dup(2), dup(3), dup(4))
        def frac(d: Long) = d * 1000 / math.max(tot, 1L)
        val keep = if (frac(d2) <= CleanQueries.Dup2Permille &&
          frac(d3) <= CleanQueries.Dup3Permille &&
          frac(d4) <= CleanQueries.Dup4Permille) 1L else 0L
        (id, tot, d2, d3, d4, frac(d2), frac(d3), frac(d4), keep)
      }.toSet
    val got = CleanQueries.qDupNgrams(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSet
    assert(got === expect)
    // the rule must separate: repetitive docs dropped, clean docs kept,
    // and the 2-gram channel must detect duplication somewhere (a corpus
    // where frac2 is identically zero would mean the gram expansion is
    // broken, not that the corpus is clean)
    assert(got.exists(_._9 == 0L), "no doc dropped — thresholds inert")
    assert(got.count(_._9 == 1L) > got.size / 2, "most docs should survive")
    assert(got.exists(_._6 > 0L), "2-gram duplication never detected")
  }
}
