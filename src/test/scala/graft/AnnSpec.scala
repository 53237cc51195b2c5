package graft

import graft.queries.{TextQueries, VectorQueries, VerifierQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape contracts for the similarity/diff queries:
  *
  *  - the banded ANN candidate set must recall the planted near-duplicate
  *    vectors (the ground truth of embedding near-dup detection) — and we
  *    document that ~60°-apart "nearest" neighbors of the uniform base
  *    corpus are NOT sign-LSH-recallable at any useful bucket space;
  *  - the Jaccard plan must never put document text into an Exchange;
  *  - the coverage query must not contain a WindowExec (the old global
  *    no-partition window serialized all changed cells through one task).
  */
class AnnSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  /** Exchange operator blocks from `explain("formatted")` — the physical
    * plan AFTER exchange insertion, each block listing its Input columns. */
  private def exchangeBlocks(df: DataFrame): Seq[String] =
    df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
      .split("\n\n")
      .filter(b => b.linesIterator.hasNext &&
        b.linesIterator.next().matches(""".*\)\s*(Exchange|BroadcastExchange).*"""))
      .toSeq

  test("banded LSH recalls planted near-duplicate vectors") {
    val corpus = VectorQueries.annCorpus(spark, dir)
    val cands = VectorQueries.annCandidatePairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 500L by 5L).map(i => (i, i + 1000000L))
    val hit = planted.count(cands.contains)
    val recall = hit.toDouble / planted.size
    info(f"planted near-dup recall: $recall%.3f ($hit/${planted.size}, ${cands.size} candidates)")
    // cosine≈0.99 pairs should collide in ≥1 of 8 bands w.p. ~0.99
    assert(recall >= 0.9, f"recall $recall%.3f below floor")
    // and the exact-dot ranking should surface planted pairs at the top
    val top = VectorQueries.qAnnTopPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.count(p => planted.contains(p)) >= top.length / 2,
      "top pairs not dominated by the planted near-dups")
  }

  test("ANN bucket stats: every band reports, caps account for drops") {
    val stats = VectorQueries.qAnnBucketStats(spark, dir).collect()
    assert(stats.length === VectorQueries.Bands)
    stats.foreach { r =>
      val (nBuckets, maxOcc, nDropped) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nBuckets > 0 && maxOcc > 0)
      if (maxOcc <= VectorQueries.MaxBucketOcc) assert(nDropped === 0L)
    }
  }

  test("jaccard plan carries no document text through any Exchange") {
    // the conditional scan-spread (Tables.spread, round-robin) is exempt:
    // it exists only when the local single-row-group parquet arrives
    // under-split and is a plan-level no-op at production scale — the
    // contract is about the hash-partitioned dedup shuffles
    val all = exchangeBlocks(TextQueries.qJaccardPairs(spark, dir))
    assert(all.count(_.contains("RoundRobinPartitioning")) <= 2,
      "only the conditional scan-spread and the verify-spread repartition " +
        "may be round-robin")
    val blocks = all.filterNot(_.contains("RoundRobinPartitioning"))
    assert(blocks.nonEmpty, "expected at least one Exchange in the plan")
    val offending = blocks.filter(_.matches("""(?s).*\btext#.*"""))
    assert(offending.isEmpty, s"text column in an Exchange:\n${offending.mkString("\n")}")
  }

  test("ann plan carries no vector through the band-join Exchanges") {
    val corpus = VectorQueries.annCorpus(spark, dir)
    val blocks = exchangeBlocks(VectorQueries.annCandidatePairs(corpus))
    assert(blocks.nonEmpty)
    assert(!blocks.exists(_.contains("qvec#")),
      "qvec rides the candidate-generation shuffle")
  }

  test("IVF nprobe=1: every neighbor comes from the query's cell; recall documented") {
    val ivf = VectorQueries.qAnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.nonEmpty)
    val brute = VectorQueries.qKnnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = ivf.count(brute.contains)
    val recall = hit.toDouble / brute.size
    info(f"IVF nprobe=1 recall vs brute top-${VectorQueries.TopK}: " +
      f"$recall%.3f ($hit/${brute.size}) over ${VectorQueries.NumCells} cells")
    // nprobe=1 over 16 cells scans ~1/16 of the data; on uniform vectors
    // the true neighbors spread across cells, so recall is bounded by the
    // cell hit rate — assert it beats the random-scan floor (1/16)
    assert(recall > 1.0 / VectorQueries.NumCells)
  }

  test("two-level IVF: hierarchical assignment is sane; recall documented") {
    val two = VectorQueries.qAnnIvf2Level(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(two.nonEmpty)
    val brute = VectorQueries.qKnnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = two.count(brute.contains)
    val recall = hit.toDouble / brute.size
    info(f"two-level IVF recall vs brute top-${VectorQueries.TopK}: " +
      f"$recall%.3f ($hit/${brute.size}) over ${VectorQueries.NumSupers}×" +
      f"${VectorQueries.NumCells} hierarchy")
    // the hierarchy restricts each vector's candidate centroids to one
    // super-cell's children, so recall can trail flat nprobe=1 — but the
    // assignment must still beat a random 1/numCells scan
    assert(recall > 1.0 / VectorQueries.NumCells)
    // structural guarantee: a query's neighbors all share the query's cell
    // (nprobe=1 read path) — verified by the oracle equality too, but
    // cheap to assert directly on the hierarchy path
    val nidSets = two.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(nidSets.forall { case (qid, nids) => !nids.contains(qid) })
  }

  test("trained IVF: Lloyd refinement is deterministic and recall is documented vs seeding") {
    val brute = VectorQueries.qKnnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Array[(Long, Long)]): Double =
      rows.count(brute.contains).toDouble / brute.size
    val trained = VectorQueries.qAnnIvfTrained(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val seeded = VectorQueries.qAnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (rT, rS) = (recallOf(trained), recallOf(seeded))
    info(f"IVF nprobe=1 recall vs brute top-${VectorQueries.TopK}: " +
      f"trained(Lloyd x${VectorQueries.LloydIters})=$rT%.3f vs first-N seeding=$rS%.3f " +
      f"over ${VectorQueries.NumCells} cells")
    // the OTHER half of the training claim: Lloyd balances the inverted
    // lists. nprobe=1 scans the query's own cell, so the expected scan
    // fraction is sum(cell²)/n² — skewed seeding scans more data for the
    // same recall. Report both engines' balance.
    def scanFrac(sizes: Seq[Long], n: Long): Double =
      sizes.map(s => s.toDouble * s).sum / (n.toDouble * n)
    val (szT, szS) = (VectorQueries.cellSizes(spark, dir, trainedQ = true),
      VectorQueries.cellSizes(spark, dir, trainedQ = false))
    val n = szT.sum
    info(f"cell balance over ${VectorQueries.NumCells} cells: trained max=${szT.max} " +
      f"scan-frac=${scanFrac(szT, n)}%.3f vs seeded max=${szS.max} " +
      f"scan-frac=${scanFrac(szS, n)}%.3f (uniform ideal=${1.0 / VectorQueries.NumCells}%.3f)")
    // determinism: the full trajectory is integer-exact, so two runs are
    // bit-identical (the oracle asserts the same cross-engine)
    val again = VectorQueries.qAnnIvfTrained(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(trained.toSeq === again.toSeq, "trained IVF must be run-to-run deterministic")
    // the nprobe=1 structural floor: beats a random 1/numCells scan
    assert(rT > 1.0 / VectorQueries.NumCells)
    assert(trained.length === VectorQueries.NumQueries * VectorQueries.TopK)
    // Lloyd's provable property: quantization cost is non-increasing in
    // iterations — the training demonstrably optimizes its objective even
    // on uniform data where recall has no room to move
    val costs = (0 to VectorQueries.LloydIters)
      .map(t => t -> VectorQueries.quantizationCost(spark, dir, t))
    info("Lloyd quantization cost by iteration: " +
      costs.map { case (t, c) => s"iter$t=$c" }.mkString(", "))
    costs.sliding(2).foreach { case Seq((tA, a), (tB, b)) =>
      assert(b <= a, s"Lloyd cost increased $a -> $b from iter $tA to $tB")
    }
    assert(costs.last._2 < costs.head._2,
      "training must strictly reduce quantization cost on this corpus")
  }

  test("trained IVF on a clustered corpus: Lloyd converts cost decrease into recall lift") {
    // The uniform embeddings table gives k-means nothing to find (BENCH.md
    // documents trained≈seeded recall parity there). This corpus has real
    // cluster structure with hash-random arrival order, so the first-N
    // seeds cover only a coupon-collector subset of the clusters — the
    // realistic failure mode training exists to fix. Deterministic, so the
    // measured numbers are exact and assertable, not flaky.
    val corpus = VectorQueries.clusteredCorpus(spark, 2000, VectorQueries.NumCells)
      .cache()
    corpus.count()
    try {
      val brute = VectorQueries.qKnnBruteOf(spark, corpus).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(df: DataFrame): Double = {
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        rows.count(brute.contains).toDouble / brute.size
      }
      val rS = recallOf(VectorQueries.qAnnIvfOf(
        spark, corpus, VectorQueries.NumCells, 1))
      val rT = recallOf(VectorQueries.qAnnIvfTrainedOf(
        spark, corpus, VectorQueries.NumCells, VectorQueries.LloydIters))
      val costs = (0 to VectorQueries.LloydIters)
        .map(t => t -> VectorQueries.quantizationCostOf(spark, corpus, t))
      info(f"clustered corpus (n=2000, ${VectorQueries.NumCells} clusters, " +
        f"${VectorQueries.NumCells} cells) recall@${VectorQueries.TopK} nprobe=1: " +
        f"trained(Lloyd x${VectorQueries.LloydIters})=$rT%.3f vs first-N seeding=$rS%.3f")
      info("Lloyd quantization cost by iteration: " +
        costs.map { case (t, c) => s"iter$t=$c" }.mkString(", "))
      costs.sliding(2).foreach { case Seq((tA, a), (tB, b)) =>
        assert(b <= a, s"Lloyd cost increased $a -> $b from iter $tA to $tB")
      }
      assert(costs.last._2 < costs.head._2,
        "training must strictly reduce quantization cost on clustered data")
      // the headline: on data with structure, training LIFTS recall over
      // first-N seeding at equal nprobe — deterministic, so an exact bound
      // measured 0.920 vs 0.788 — assert a solid margin, not a hair's width
      assert(rT >= rS + 0.10,
        f"trained recall $rT%.3f must beat seeded $rS%.3f by >=0.10 on clustered data")
      // the 2-level hierarchy, seeded vs trained at equal read cost: the
      // seeded hierarchy inherits first-N's cluster blindness AND restricts
      // each vector to one super's children; training both levels (children
      // on the corpus, supers on the children — the IMI recipe) must close
      // most of the gap to the trained flat quantizer
      val r2S = recallOf(VectorQueries.qAnnIvf2LevelOf(spark, corpus))
      val r2T = recallOf(VectorQueries.qAnnIvf2LevelTrainedOf(spark, corpus,
        VectorQueries.NumSupers, VectorQueries.NumCells, VectorQueries.LloydIters))
      info(f"two-level (${VectorQueries.NumSupers}x${VectorQueries.NumCells}) " +
        f"recall@${VectorQueries.TopK}: trained=$r2T%.3f vs seeded=$r2S%.3f " +
        f"(trained flat=$rT%.3f)")
      assert(r2T >= r2S + 0.10,
        f"trained 2-level recall $r2T%.3f must beat seeded $r2S%.3f by >=0.10")
    } finally corpus.unpersist()
  }

  test("IVF recall/nprobe curve: monotone in nprobe, exact at full probe") {
    val brute = VectorQueries.qKnnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(numCells: Int, nprobe: Int): Double = {
      val ivf = VectorQueries.qAnnIvfWith(spark, dir, numCells, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.intersect(brute).size.toDouble / brute.size
    }
    val curve = Seq(1, 2, 4, 8).map(np => np -> recall(VectorQueries.NumCells, np))
    info(s"IVF recall@${VectorQueries.TopK} by nprobe over " +
      s"${VectorQueries.NumCells} cells: " +
      curve.map { case (np, r) => f"nprobe=$np:$r%.3f" }.mkString(", "))
    // probing more cells can only add candidates → recall never decreases
    curve.sliding(2).foreach { case Seq((npA, a), (npB, b)) =>
      assert(b >= a, f"recall fell $a%.3f -> $b%.3f from nprobe=$npA to $npB")
    }
    assert(curve.last._2 > curve.head._2,
      "widening the probe should recover some cross-cell neighbors")
    // probing EVERY cell is exhaustive search — must equal brute force
    assert(recall(VectorQueries.NumCells, VectorQueries.NumCells) === 1.0)
    // cell count is a parameter: sqrt(n)-ish sizing still returns full
    // result sets (recall drops as cells shrink — that's the tradeoff)
    val n = graft.queries.Tables.embeddings(spark, dir).count()
    val cells = VectorQueries.suggestedCells(n)
    val wide = VectorQueries.qAnnIvfWith(spark, dir, cells, 2).collect()
    assert(wide.length === VectorQueries.NumQueries * VectorQueries.TopK)
    info(s"suggestedCells($n) = $cells")
  }

  test("embedding dedup: planted near-dups share a component, one kept each") {
    val rows = VectorQueries.qDedupEmbedding(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(rows.size === 600) // 500 base + 100 planted near-dups
    // planted pairs (cosine ≈ 0.987) must pass the 0.97 gate when the
    // banded LSH surfaces them (recall ~0.98)
    val planted = (0L until 500L by 5L).map(i => (i, i + 1000000))
    val joined = planted.count { case (a, b) => rows(b)._1 == rows(a)._1 }
    assert(joined >= planted.size * 9 / 10, s"only $joined/${planted.size} pairs joined")
    // labels are component minima; exactly the minimum member is kept
    rows.groupBy(_._2._1).foreach { case (comp, members) =>
      assert(members.keys.min === comp)
      assert(members.count(_._2._2 == 1) === 1, s"component $comp kept != 1")
    }
    // uniform base vectors (~60° apart) must NOT merge: components stay tiny
    val kept = rows.count(_._2._2 == 1)
    assert(kept >= 500, s"over-merging: only $kept kept of ${rows.size}")
  }

  test("knn brute plan: partial top-k aggregate, no per-query window sort") {
    val df = VectorQueries.qKnnBrute(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"WindowExec present:\n$plan")
    // partial (map-side) aggregation must appear before the exchange
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based top-k:\n$plan")
    assert(df.collect().length === VectorQueries.NumQueries * VectorQueries.TopK)
  }

  test("coverage query plan has no WindowExec") {
    val df = VerifierQueries.qDiffCoverage(spark, dir)
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("Window"), s"WindowExec present:\n$planStr")
    assert(df.collect().length <= 25)
  }
}
