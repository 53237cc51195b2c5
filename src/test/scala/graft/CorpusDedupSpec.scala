package graft

import graft.queries.CorpusQueries
import org.scalatest.funsuite.AnyFunSuite

/** Semantic quality of the corpus-hygiene operators (beyond oracle
  * equality): line dedup must actually strip the planted boilerplate and
  * cross-page duplicate while keeping canonical originals; normalized
  * dedup must pair the case/punctuation variants plain md5 misses; the
  * incremental path's Bloom must PRUNE (not just pass everything to the
  * exact join) while the verified output stays exact. */
class CorpusDedupSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("line dedup: boilerplate survives only on its canonical first page") {
    val rows = CorpusQueries.qDedupLines(spark, dir).collect()
    val withBoiler = rows.filter(r => Option(r.getAs[String]("text"))
      .exists(_.contains("subscribe to our newsletter")))
    assert(withBoiler.map(_.getLong(0)).toSeq === Seq(0L),
      "boilerplate line must be kept exactly once, on the minimum page")
    // every base page had the footer appended, so all but page 0 dropped ≥1
    val basePages = rows.filter(_.getLong(0) < 100)
    assert(basePages.count(_.getAs[Long]("n_dropped") >= 1) >= basePages.length - 1)
  }

  test("line dedup: cross-page duplicated paragraph keeps the original only") {
    val rows = CorpusQueries.qDedupLines(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 10's text lives at page 2 idx 0 (original) and was injected at
    // page 3 idx 6 (copy) — pos(2,0)=32 < pos(3,6)=54, original wins
    val docText = queries.Tables.documents(spark, dir)
      .filter($"doc_id" === 10).select($"text").head().getString(0)
    assert(Option(rows(2L).getAs[String]("text")).exists(_.contains(docText)))
    assert(!Option(rows(3L).getAs[String]("text")).exists(_.contains(docText)))
  }

  test("line dedup: kept + dropped per page equals its line count") {
    val rows = CorpusQueries.qDedupLines(spark, dir).collect()
    // base pages: 5 doc lines + 1 boilerplate; injected-only pages exist too
    rows.filter(_.getLong(0) < 100).foreach { r =>
      val total = r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped")
      assert(total >= 6 && total <= 7, s"page ${r.getLong(0)} lines=$total")
    }
  }

  test("normalized dedup pairs the planted case and punctuation variants") {
    val groups = CorpusQueries.qDedupNormalized(spark, dir).collect()
    val members = groups.map(r =>
      r.getAs[Long]("keep_doc") -> r.getAs[String]("doc_ids").split(",").map(_.toLong).toSet)
      .toMap
    for (i <- 0L until 500L by 9L)
      assert(members.get(i).exists(_.contains(i + 3000000)),
        s"uppercased copy of doc $i not grouped")
    for (i <- 0L until 500L by 11L)
      assert(members.get(i).exists(_.contains(i + 4000000)),
        s"punct variant of doc $i not grouped")
    // the kept doc is the minimum member and is listed first
    groups.foreach { r =>
      val ids = r.getAs[String]("doc_ids").split(",").map(_.toLong)
      assert(ids.min === r.getAs[Long]("keep_doc"))
      assert(ids.sorted.sameElements(ids), "doc_ids evidence must be sorted")
    }
  }

  test("split leakage: near-dups cross content-keyed splits; repair closes it") {
    // content-keyed splits pin exact duplicates to one split, but a
    // tail-appended near-dup hashes differently — the planted corpus must
    // surface at least one component spanning splits
    val leaky = CorpusQueries.qSplitLeakage(spark, dir).collect()
    assert(leaky.nonEmpty, "planted near-dups must produce split leakage")
    leaky.foreach { r =>
      assert(r.getAs[Int]("n_splits") >= 2)
      assert(r.getAs[String]("splits").split(",").length === r.getAs[Int]("n_splits"))
    }
    // component-keyed repair: every component lands wholly in one split
    val repaired = CorpusQueries.qSplitRepair(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byComp = repaired.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size)
    assert(byComp.values.forall(_ == 1), "a repaired component spans two splits")
    // and the assignment is still a split: all three classes, train-heavy
    val frac = repaired.count(_._3 == "train").toDouble / repaired.length
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    assert(repaired.map(_._3).distinct.sorted.sameElements(Array("test", "train", "val")))
  }

  test("incremental dedup: exact verdicts, and the Bloom really prunes") {
    val out = CorpusQueries.qDedupIncremental(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("dup_of_history")).toMap
    // planted: docs with doc_id % 6 == 0 re-enter as doc_id + 5000000 and
    // (being even) their text IS in history → dup; odd batch docs are not
    for (i <- 0L until 500L by 6L)
      assert(out(i + 5000000) === 1, s"re-crawled doc $i not flagged")
    assert(out.count { case (id, d) => id < 1000000 && d == 1 } === 0,
      "no odd (new-only) doc may be flagged as duplicate")
    val (candidates, batchSize) = CorpusQueries.incrementalPruning(spark, dir)
    assert(candidates < batchSize / 2,
      s"Bloom pruned nothing: $candidates of $batchSize reached the exact join")
  }

  test("sharded incremental dedup is bit-identical to the flat query; filters are per-shard sized") {
    val flat = CorpusQueries.qDedupIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("dup_of_history")))
    val sharded = CorpusQueries.qDedupIncrementalSharded(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("dup_of_history")))
    // the whole contract: ANY shard count / fpp must reproduce the flat
    // output row for row (the exact verify join guarantees it)
    assert(sharded.toSeq === flat.toSeq,
      "sharded output diverged from the flat incremental dedup")
    val stats = CorpusQueries.incrementalShardStats(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(stats.map(_._1).toSeq === (0 until CorpusQueries.NumShards),
      "every shard must build exactly one filter")
    // hash sharding splits history roughly evenly; each filter is sized
    // from its shard's expected share, so per-task filter memory shrinks
    // with the shard count instead of tracking total history
    val totalKeys = stats.map(_._3).sum
    stats.foreach { case (s, bytes, keys) =>
      assert(keys > 0, s"shard $s got no history keys")
      assert(bytes > 0, s"shard $s filter empty")
      assert(keys < totalKeys / 2, s"shard $s holds most of history — sharding broken")
    }
    info(s"per-shard filters: " + stats.map { case (s, b, k) =>
      s"shard$s=${b}B/${k}keys" }.mkString(", "))
  }

  test("cross-source matrix matches a driver replica; shares are directional") {
    val docs = graft.queries.Tables.documents(spark, dir)
      .filter($"text".isNotNull).select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val feed = docs.map { case (_, s, t) => (s, md5hex(t)) } ++
      docs.collect { case (id, _, t) if id % 9 == 2 => ("syndicated", md5hex(t)) } ++
      docs.collect { case (id, _, t) if id % 15 == 4 => ("mirror_feed", md5hex(t)) }
    val sd = feed.distinct
    val fan = sd.groupBy(_._2).map { case (h, xs) => h -> xs.size }
    val droppedSet = fan.filter(_._2 > CorpusQueries.CrossSourceMaxFanout).keySet
    val copies = feed.groupBy(identity).map { case ((s, h), xs) => (s, h) -> xs.size.toLong }
    val kept = sd.filter(p => fan(p._2) > 1 && !droppedSet(p._2))
    val totals = sd.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val expect = kept.groupBy(_._2).values.flatMap { hosts =>
      for (a <- hosts; b <- hosts; if a._1 < b._1)
        yield ((a._1, b._1), (1L, copies(a) + copies(b)))
    }.groupBy(_._1).map { case ((sa, sb), xs) =>
      val shared = xs.map(_._2._1).sum
      (sa, sb, shared, xs.map(_._2._2).sum, totals(sa), totals(sb),
        shared * 1000 / totals(sa), shared * 1000 / totals(sb),
        droppedSet.size.toLong)
    }.toSet
    val got = CorpusQueries.qDedupCrossSource(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSet
    assert(got === expect)
    // both planted feeds must surface, and the directional shares must
    // actually differ somewhere (that asymmetry is the matrix's point)
    assert(got.exists(r => r._1 == "syndicated" || r._2 == "syndicated"))
    assert(got.exists(r => r._1 == "mirror_feed" || r._2 == "mirror_feed"))
    assert(got.exists(r => r._7 != r._8), "shares never directional")
  }

  test("NFC dedup: byte-distinct composed/decomposed plants unify only under NFC") {
    val rows = CorpusQueries.qDedupNfc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val pre = rows.filter(r => r._1 >= 3000000L && r._1 < 4000000L)
    val dec = rows.filter(_._1 >= 4000000L)
    assert(pre.nonEmpty && pre.size === dec.size)
    // decomposed copies change under NFC; precomposed don't
    assert(dec.forall(_._2 == 1L), "decomposed plant not changed by NFC")
    assert(pre.forall(_._2 == 0L), "precomposed plant should already be NFC")
    // each planted pair is a 2-copy NFC group unified ONLY by NFC, and
    // the canonical-min keep elects the precomposed (lower id) copy
    assert((pre ++ dec).forall(r => r._3 == 2L && r._5 == 1L))
    assert(pre.forall(_._4 == 1L) && dec.forall(_._4 == 0L))
    // base docs are untouched by NFC (ASCII corpus)
    assert(rows.filter(_._1 < 3000000L).forall(_._2 == 0L))
  }

  test("url canonicalization strips every variant axis and merges across them") {
    val rows = CorpusQueries.qUrlCanonical(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3), r.getInt(4))))
      .toMap
    // no canonical url retains a scheme, fragment, tracking param, www
    // prefix, trailing slash, or uppercase byte
    for ((id, (host, canon, _, _)) <- rows) {
      assert(!canon.contains("://") && !canon.contains("#") &&
        !canon.contains("utm_") && !canon.endsWith("/") &&
        canon == canon.toLowerCase(java.util.Locale.ROOT), s"doc $id: $canon")
      assert(!host.startsWith("www.") && host.endsWith(".example.com"), s"doc $id: $host")
    }
    // the utm-strip MERGE: doc 140 carries '?id=40', doc 240 carries
    // '?utm_source=...&utm_campaign=x&id=40' — canonically identical
    assert(rows(140L)._2 === rows(240L)._2, "utm variants did not merge")
    assert(rows(140L)._4 === 1 && rows(240L)._4 === 0, "min-doc representative off")
    // exactly one kept representative per duplicate group
    for ((canon, members) <- rows.values.groupBy(_._2)) {
      assert(members.count(_._4 == 1) === 1, s"group $canon kept != 1")
      assert(members.forall(_._3 == members.size.toLong), s"group $canon n_dups off")
    }
  }
}
