package graft

import graft.queries.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** Semantic quality of the near-dup pipeline (beyond oracle equality):
  * the banded LSH candidates must actually FIND the planted duplicates,
  * and exact Jaccard must separate exact/near/unrelated pairs. */
class DedupQualitySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("LSH candidates recover every planted exact duplicate") {
    val pairs = TextQueries.qLshPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups were planted as doc_id + 1000000 for doc_id % 10 == 0
    val planted = (0L until 500L).filter(_ % 10 == 0).map(i => (i, i + 1000000))
    val found = planted.count(pairs.contains)
    assert(found === planted.size, s"missed ${planted.size - found} exact-dup pairs")
  }

  test("LSH candidates recover most planted near-duplicates (tail-appended)") {
    val pairs = TextQueries.qLshPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 500L).filter(_ % 7 == 0).map(i => (i, i + 2000000))
    val found = planted.count(pairs.contains)
    // a short appended tail shifts few shingles: any-band collision should
    // recover the large majority
    assert(found >= planted.size * 8 / 10, s"found only $found/${planted.size}")
  }

  test("connected components: planted dups share a cluster, one kept each") {
    val rows = TextQueries.qDedupComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // every planted exact duplicate lands in its source's component
    for (i <- 0L until 500L by 10L)
      assert(rows(i + 1000000)._1 === rows(i)._1, s"doc $i and its copy split")
    // component label is the member minimum, and exactly that member is kept
    val byComp = rows.groupBy(_._2._1)
    byComp.foreach { case (comp, members) =>
      assert(members.keys.min === comp)
      assert(members.count(_._2._2 == 1) === 1, s"component $comp kept != 1")
      assert(members(comp)._2 === 1)
    }
    // dedup actually deduplicates: fewer kept docs than corpus rows
    val kept = rows.count(_._2._2 == 1)
    assert(kept < rows.size && kept >= 400, s"kept=$kept of ${rows.size}")
  }

  test("connected components: empty node set yields empty labels, no crash") {
    // sum over zero rows is SQL NULL — must converge to empty, not NPE
    val nodes = Seq.empty[Long].toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.queries.ConnectedComponents.labels(nodes, edges).count() === 0)
  }

  test("connected components: a 12-node chain converges through plan truncation") {
    // hash-min moves labels one hop per round, so a path graph of length
    // 12 needs ~11 rounds — exercising the every-5th-round RDD-boundary
    // plan truncation (twice) that short clique-like corpora never reach
    val n = 12L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = graft.queries.ConnectedComponents.labels(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === n)
    assert(labels.forall(_._2 == 0L), s"chain did not fully converge: ${labels.mkString(",")}")
  }

  test("large-star/small-star CC matches hash-min labels on varied graphs") {
    val rnd = new scala.util.Random(7)
    def check(n: Long, edges: Seq[(Long, Long)]): Unit = {
      val nodesDf = (0L until n).toDF("id")
      val edgesDf = edges.toDF("src", "dst")
      val a = graft.queries.ConnectedComponents
        .labels(nodesDf, edgesDf, maxRounds = 200)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val b = graft.queries.ConnectedComponents
        .labelsAlternating(nodesDf, edgesDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(a === b, s"engines disagree on n=$n edges=$edges")
    }
    check(0, Seq.empty)
    check(6, Seq.empty) // all isolated
    check(10, (0L until 9L).map(i => (i, i + 1))) // chain
    check(8, Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L))) // comps + cycle
    for (_ <- 1 to 2) {
      val n = 30L
      val es = Seq.fill(25)((rnd.between(0L, n), rnd.between(0L, n)))
        .filter(e => e._1 != e._2)
      check(n, es)
    }
  }

  test("large-star/small-star converges where hash-min's round budget refuses") {
    // a 40-node path has diameter 39: hash-min needs ~39 rounds (refuses
    // at 20), the star algorithm contracts it in O(log^2 n) alternations
    val n = 40L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      graft.queries.ConnectedComponents.labels(nodes, edges, maxRounds = 20).collect()
    }
    val alt = graft.queries.ConnectedComponents.labelsAlternating(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(alt.length === n)
    assert(alt.forall(_._2 == 0L), "chain must collapse to component 0")
  }

  test("hash-min local-finish opt-in is label-identical to the distributed loop") {
    val n = 30L
    val nodes = (0L until n).toDF("id")
    val edges = (Seq((0L, 1L), (1L, 2L), (2L, 0L), (5L, 6L)) ++      // cliquelet + pair
      (10L until 14L).map(i => (i, i + 1)))                          // short chain
      .toDF("src", "dst")
    def run(lf: Long) = graft.queries.ConnectedComponents
      .labels(nodes, edges, localFinish = lf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(run(0L).sameElements(run(graft.queries.ConnectedComponents.DefaultLocalFinish)))
  }

  test("local-finish stage is label-identical to the pure distributed fixpoint") {
    // localFinish = 0 forces the alternation all the way to the edge
    // fixpoint; the default bound short-circuits after ≥2 distributed
    // rounds with a count-guarded union-find. Both must emit the same
    // labels on a graph mixing chains, a cycle, and isolated nodes.
    val n = 60L
    val nodes = (0L until n).toDF("id")
    val edges = ((0L until 39L).map(i => (i, i + 1)) ++ // 40-chain
      Seq((45L, 46L), (46L, 47L), (47L, 45L)))          // cycle; 48+ isolated
      .toDF("src", "dst")
    def run(lf: Long) = graft.queries.ConnectedComponents
      .labelsAlternating(nodes, edges, localFinish = lf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(run(0L).sameElements(run(graft.queries.ConnectedComponents.DefaultLocalFinish)))
  }

  test("q_dedup_components_chain exercises the alternating engine where hash-min refuses") {
    // the oracle query's graph: blocks of 100 chained doc_ids (diameter
    // 99). The alternating engine must label every doc with its block
    // minimum; the SAME graph under hash-min's default 20-round budget
    // must refuse — proving the query genuinely needs labelsAlternating
    val labels = TextQueries.qDedupComponentsChain(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(labels.nonEmpty)
    assert(labels.forall { case (id, comp, kept) =>
      comp == (id / 100) * 100 && kept == (if (id == comp) 1 else 0)
    }, "chain labels must be the block-of-100 minimum")
    import org.apache.spark.sql.functions.{col => c}
    val docs = graft.queries.Tables.documents(spark, dir).select(c("doc_id"))
    val nodes = docs.select(c("doc_id").as("id"))
    val edges = docs.filter(c("doc_id") % 100 =!= 99)
      .select(c("doc_id").as("src"), (c("doc_id") + 1).as("dst"))
    intercept[IllegalStateException] {
      graft.queries.ConnectedComponents
        .labels(nodes, edges, maxRounds = TextQueries.CcMaxRounds).collect()
    }
  }

  test("connected components: unconverged propagation refuses, never emits") {
    // a zero-round budget cannot converge on a graph with any edge — the
    // DISTRIBUTED loop must throw (refuse-over-guess), not return identity
    // labels (localFinish = 0 pins the distributed path; with the default
    // bound the local union-find legitimately answers without any rounds,
    // which the next test locks)
    val e = intercept[IllegalStateException] {
      TextQueries.dedupComponentsImpl(spark, dir, maxRounds = 0, localFinish = 0L)
        .collect()
    }
    assert(e.getMessage.contains("E_CC_UNCONVERGED"))
  }

  test("local finish answers exactly even at zero round budget") {
    // the never-wrong-labels contract, from the other side: when the edge
    // set fits the bound, the local union-find produces the same labels a
    // full distributed run would — no budget involved, nothing to refuse
    val local = TextQueries.dedupComponentsImpl(spark, dir, maxRounds = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val dist = TextQueries.dedupComponentsImpl(spark, dir,
        maxRounds = TextQueries.CcMaxRounds, localFinish = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(local.sameElements(dist))
  }

  test("exact Jaccard separates exact (1000), near (>600), unrelated pairs") {
    val j = TextQueries.qJaccardPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // planted pairs: base doc vs its exact copy / its tail-appended copy
    // (copy-vs-copy pairs like (1000000+x, 2000000+x) are near, not exact)
    val exact = j.collect { case ((a, b), v) if a < 1000000 && b == a + 1000000 => v }
    assert(exact.nonEmpty && exact.forall(_ == 1000L))
    val near = j.collect { case ((a, b), v) if a < 1000000 && b == a + 2000000 => v }
    // the fixed tail is a larger share of short docs -> lower floor
    assert(near.nonEmpty && near.forall(v => v > 600L && v < 1000L))
    // the driver-generated documents table itself contains genuine
    // near-duplicates (verified out-of-band: e.g. doc 0 vs doc 50 share a
    // long prefix, Jaccard 973 permille) — the detector surfacing them in
    // the base corpus is correct behavior, so assert it DOES find them
    val cross = j.collect { case ((a, b), v) if b < 1000000 && a < 1000000 => v }
    assert(cross.exists(_ >= 900L),
      "expected the detector to surface the base corpus's own near-dups")
  }

  test("decontamination flags eval-overlapping docs and leaves the clean majority alone") {
    val rows = TextQueries.qDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // eval = doc_id % 41 == 0 over the dedup corpus. 410 is an eval base
    // doc whose exact copy 1000410 landed in TRAIN (1000000 % 41 = 10) —
    // the canonical leak the operator exists to catch
    assert(rows(1000410L)._2 === 1, "exact copy of an eval doc must be flagged")
    assert(rows(1000410L)._1 > 0)
    // 1000400 is an EVAL doc (1000400 % 41 == 0) copied from base 400 —
    // the leak in the other direction: the train-side SOURCE is flagged
    assert(rows(400L)._2 === 1, "train source of an eval copy must be flagged")
    // the flag must discriminate: a small contaminated set, not the whole
    // corpus (char-shingle overlap flags everything — the 5-word n-gram is
    // what makes the rule meaningful; measured 12/606 at sf0.001)
    val frac = rows.valuesIterator.count(_._2 == 1).toDouble / rows.size
    assert(frac > 0.0 && frac < 0.2, s"contamination fraction $frac out of band")
    // clean docs report zero shared n-grams, flagged docs a positive count
    assert(rows.valuesIterator.forall { case (n, f) => (f == 1) == (n > 0) })
  }

  test("importance weights rank target-vocabulary docs above the corpus median") {
    val rows = TextQueries.qImportanceWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> score_per_word
    val sorted = rows.values.toSeq.sorted
    val median = sorted(sorted.size / 2)
    // docs sharing an eval doc's text verbatim must look more target-like
    // than the median train doc: 1000410 is the exact copy of eval doc
    // 410; 400 is the source of eval copy 1000400 (measured 26333 and
    // 28495 vs median 25948 — the synthetic corpus's shared vocabulary
    // keeps the spread modest, same honesty note as uniform-IVF recall)
    assert(rows(1000410L) > median,
      s"eval-copy score ${rows(1000410L)} not above median $median")
    assert(rows(400L) > median,
      s"eval-source score ${rows(400L)} not above median $median")
    // scores are exact integers: a rerun is bit-identical
    val again = TextQueries.qImportanceWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows === again)
  }

  test("duplicated-passage detection flags planted copies and spares unique docs") {
    val rows = graft.queries.CorpusQueries.qDedupSubstrings(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    // an exact copy duplicates EVERY window of its source: both sides 1000‰
    for (i <- 0L until 500L by 10L; id <- Seq(i, i + 1000000)) {
      val (_, _, pm, fl) = rows(id)
      assert(pm === 1000L && fl === 1, s"doc $id expected fully duplicated, got $pm")
    }
    // a tail-appended near-dup shares every window inside the original
    // span: (n-7) of its (n-4) windows for an n-word source -> always
    // flagged at the 500-permille threshold for the corpus's doc lengths
    for (i <- 0L until 500L by 7L) {
      val (_, _, pm, fl) = rows(i + 2000000)
      assert(fl === 1 && pm >= 500L, s"near-dup ${i + 2000000} permille $pm")
    }
    // the flag must discriminate: the corpus's unique docs report ZERO
    // duplicated windows (an 8-word verbatim run is a copied passage, not
    // chance — the base corpus's genuine near-dups DO flag, correctly)
    val clean = rows.count { case (_, (_, nd, _, _)) => nd == 0L }
    assert(clean > rows.size / 4, s"only $clean/${rows.size} docs fully unique")
  }

  test("duplicated spans cover exact copies fully and merge into one island") {
    val rows = graft.queries.CorpusQueries.qDedupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // an exact copy's every window is duplicated: the island rule must
    // merge them into ONE span covering the entire doc
    for (i <- 0L until 500L by 10L; id <- Seq(i, i + 1000000)) {
      val (n, spans, dw, longest, pm) = rows(id)
      assert(spans === 1L && dw === n && longest === n && pm === 1000L,
        s"doc $id expected one full-doc span, got spans=$spans dw=$dw/$n")
    }
    // a tail-appended near-dup's original prefix is one span: covered
    // permille n/(n+3) stays high, and the span union never double-counts
    for (i <- 0L until 500L by 7L) {
      val (n, spans, dw, _, pm) = rows(i + 2000000)
      assert(spans >= 1L && pm >= 700L, s"near-dup ${i + 2000000} permille $pm")
      assert(dw <= n, s"span union exceeds doc length: $dw > $n")
    }
    // unique docs report zero spans
    assert(rows.valuesIterator.exists(_._2 == 0L), "no fully unique doc found")
  }

  test("importance resampling keeps docs with probability spw/max and is exact") {
    val rows = TextQueries.qImportanceSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val maxSpw = rows.map(_._2).max
    // the keep rule is the pure-integer threshold, recomputable from the row
    for ((id, spw, u, keep) <- rows)
      assert((keep == 1) === (u * maxSpw < spw * 1048576L), s"doc $id rule break")
    // the best-scoring doc is always kept (u < 2^20 makes the test strict)
    assert(rows.filter(_._2 == maxSpw).forall(_._4 == 1))
    // the sample is a genuine subset, neither empty nor everything
    val kept = rows.count(_._4 == 1)
    assert(kept > 0 && kept < rows.size, s"kept $kept of ${rows.size}")
    // draws are content-keyed md5 nibbles: bit-identical on a rerun
    val again = TextQueries.qImportanceSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("sequence packing is gapless per shard and marks boundary-spanning docs") {
    val rows = TextQueries.qPackSequences(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(rows.nonEmpty)
    val L = TextQueries.PackLen
    for ((shard, docs) <- rows.groupBy(_._2)) {
      // the shard's concatenation has no gaps and no overlaps: sorting by
      // offset, each doc starts exactly where the previous one ended
      val sorted = docs.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"shard $shard does not start at offset 0")
      for (pair <- sorted.sliding(2) if pair.length == 2) {
        val (a, b) = (pair(0), pair(1))
        assert(b._4 === a._4 + a._3, s"shard $shard gap between ${a._1} and ${b._1}")
      }
    }
    // pack arithmetic and the boundary flag are recomputable from the row
    for ((id, _, n, off, sp, ep, flag) <- rows) {
      assert(sp === off / L && ep === (off + n - 1) / L, s"doc $id pack ids off")
      assert((flag == 1) === (sp != ep), s"doc $id boundary flag off")
    }
    // a 512-token pack over ~80-word docs must produce genuine stradders
    assert(rows.exists(_._7 == 1) && rows.exists(_._7 == 0))
  }

  test("mixture table partitions the corpus and accounts the token budget exactly") {
    val rows = TextQueries.qMixtureTable(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.nonEmpty)
    // cells are unique (lang, split, tier) — a partition, not overlaps
    assert(rows.map(_._1).distinct.length === rows.length)
    // doc accounting matches the tercile query's population exactly
    val buckets = TextQueries.qQualityBuckets(spark, dir).collect()
    assert(rows.map(_._2._1).sum === buckets.length.toLong)
    val perLang = rows.groupBy(_._1._1).view.mapValues(_.map(_._2._1).sum).toMap
    for ((lang, n) <- buckets.groupBy(_.getString(1)).view.mapValues(_.size))
      assert(perLang(lang) === n.toLong, s"$lang doc count drift")
    // floor-permille shares: sum ≤ 1000, within one flooring per cell
    val pm = rows.map(_._2._3).sum
    assert(pm <= 1000L && pm > 1000L - rows.length, s"permille sum $pm")
  }

  test("quality buckets split every language into even, metric-ordered terciles") {
    val rows = TextQueries.qQualityBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3), r.getString(4)))
    assert(rows.nonEmpty)
    for ((lang, docs) <- rows.groupBy(_._2)) {
      // tercile sizes differ by at most one doc
      val sizes = docs.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(0, 1, 2)))
      if (docs.size >= 3) {
        assert(sizes.size === 3, s"$lang missing a tercile: $sizes")
        assert(sizes.values.max - sizes.values.min <= 1, s"$lang uneven: $sizes")
      }
      // bucket assignment follows the (metric, doc_id) total order exactly
      val sorted = docs.sortBy(d => (d._3, d._1))
      for (((d, rank)) <- sorted.zipWithIndex)
        assert(d._4 === rank * 3 / docs.size, s"$lang doc ${d._1} bucket off")
    }
    // tier names map 0/1/2 -> head/middle/tail
    assert(rows.forall(d => d._5 === Seq("head", "middle", "tail")(d._4)))
  }

  test("q_dedup_spans_cut matches a driver-side canonical-cut replica and keeps one copy") {
    val W = graft.queries.CorpusQueries.SubstrW
    val docs = graft.queries.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val corpus = (docs ++
      docs.collect { case (id, t) if id % 10 == 0 => (id + 1000000L, t) } ++
      docs.collect { case (id, t) if id % 7 == 0 =>
        (id + 2000000L, t + " nearly duplicate tail") }).sortBy(_._1)
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val winRows = corpus.flatMap { case (id, t) =>
      val ws = t.split(' ')
      if (ws.length < W) Nil
      else (1 to ws.length - W + 1).map { i =>
        (id, i, id * 1048576L + i, md5hex(ws.slice(i - 1, i - 1 + W).mkString(" ")))
      }
    }
    val canon = winRows.groupBy(_._4).collect {
      case (h, g) if g.size >= 2 => h -> g.map(_._3).min
    }
    val expect = corpus.map { case (id, t) =>
      val ws = t.split(' ')
      val cutIdx = winRows.filter(r => r._1 == id &&
          canon.get(r._4).exists(_ != r._3))
        .flatMap(r => r._2 until r._2 + W).toSet
      // merged-span count = islands of consecutive covered indices
      val sortedCut = cutIdx.toSeq.sorted
      val nSpans = sortedCut.foldLeft((0L, -10)) { case ((n, prev), i) =>
        (if (i == prev + 1) n else n + 1, i)
      }._1
      val keptWords = ws.zipWithIndex.collect {
        case (w, i0) if !cutIdx(i0 + 1) => w }
      (id, ws.length.toLong, keptWords.length.toLong,
        ws.length.toLong - keptWords.length, nSpans, keptWords.mkString(" "))
    }
    val got = graft.queries.CorpusQueries.qDedupSpansCut(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    assert(got === expect)
    // one-copy semantics: planted exact copies lose (almost) their whole
    // body — the canonical occurrence lives in the lower-id original,
    // which keeps it
    val byId = got.map(r => r._1 -> r).toMap
    for ((id, t) <- docs if id % 10 == 0 && t.split(' ').length >= W) {
      assert(byId(id + 1000000L)._3 < W.toLong,
        s"copy of $id kept ${byId(id + 1000000L)._3} words — not cut")
    }
    // and cutting genuinely happened somewhere while most originals survive
    assert(got.count(_._4 > 0) > 0)
    assert(docs.count { case (id, _) => byId(id)._4 == 0 } > docs.size / 2,
      "more than half the originals lost words — canonical rule broken")
  }
}
