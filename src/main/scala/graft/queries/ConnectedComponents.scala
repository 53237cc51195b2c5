package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic hash-min connected-components labeling over a node/edge pair —
  * the dedup-decision engine shared by the text (n-gram Jaccard) and
  * embedding (ANN cosine) near-dup paths.
  *
  * Scale shape: label propagation to fixpoint, ONE key-partitioned join
  * per round; convergence is a `changed` flag aggregated over the
  * already-cached round result (never a second join), lineage truncated
  * with a localCheckpoint every 5 rounds, no collect of the label table.
  * Near-dup components are clique-like (diameter ≤ ~3) so a 20-round
  * budget is ~6× headroom; exceeding it REFUSES rather than emitting
  * wrong labels (large-star/small-star is the successor algorithm if
  * components ever grow beyond clique-like diameters — Kiveris et al.,
  * "Connected Components in MapReduce and Beyond").
  */
object ConnectedComponents {

  val DefaultMaxRounds = 20

  /** Self-describing engine-path record of the most recent labels /
    * labelsAlternating run on this JVM: which path actually executed
    * (local-finish vs distributed) plus the edge/round counts — bench
    * artifacts embed this so cross-round timing comparisons can't
    * silently mix engine paths (round-4 ADVICE). Read-and-clear by the
    * harness via `getAndSet(null)`; write-only here. */
  val lastRunInfo = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Label every node with its component's minimum id.
    *
    * @param nodes single column `id` (distinct node ids)
    * @param edges columns `src`, `dst` (undirected; either orientation)
    * @param localFinish opt-in two-phase bound (0 = pure distributed,
    *   preserving the refuse-past-budget contract exactly): when > 0 and
    *   the edge set fits, ONE count-guarded collect + min-label union-find
    *   replaces the whole propagation loop — the right call for the
    *   clique-like VERIFIED near-dup graphs the dedup queries feed in,
    *   whose edge count is orders of magnitude below the corpus size. The
    *   count rides on the `sym` cache materialization round 1 needs
    *   anyway, so the distributed path pays one extra cache read, not an
    *   extra pass over the scoring pipeline.
    * @return columns `id`, `comp` — sorted by nothing (caller orders)
    */
  def labels(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = DefaultMaxRounds, localFinish: Long = 0L): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // cache the DIRECTED edge set before symmetrizing: the union's two
    // branches otherwise evaluate the caller's edge subtree twice — for
    // the dedup queries that subtree is the whole LSH+verify scoring
    // pipeline, the single most expensive stage in the battery
    val directed = edges.select($"src", $"dst").cache()
    val sym = directed
      .unionAll(directed.select($"dst".as("src"), $"src".as("dst")))
      .cache()
    if (localFinish > 0 && sym.count() <= 2 * localFinish) {
      val symRows = sym.collect()
      lastRunInfo.set(s"hash-min:local-finish:sym_edges=${symRows.length}")
      val comp = localUnionFind(
        symRows.map(r => (r.getLong(0), r.getLong(1))))
      sym.unpersist(false)
      directed.unpersist(false)
      val compDf = comp.toSeq.toDF("id", "center")
      return nodes.join(broadcast(compDf), Seq("id"), "left")
        .select($"id", coalesce($"center", $"id").as("comp"))
    }
    var labels = nodes.select($"id", $"id".as("comp")).cache()
    // unpersist needs the EXACT cached plan (a projection of it is a
    // no-op), so keep the cached handle separately from the projected view
    var cached = labels
    var converged = false
    var iter = 0
    while (!converged && iter < maxRounds) {
      val fromNbrs = sym.join(labels, $"src" === $"id")
        .groupBy($"dst".as("id")).agg(min($"comp").as("nbr_min"))
      val stepped = labels
        .join(fromNbrs, Seq("id"), "left")
        .select($"id",
          least($"comp", coalesce($"nbr_min", $"comp")).as("comp"),
          ($"comp" > coalesce($"nbr_min", $"comp")).cast("long").as("changed"))
      // every 5th round, truncate the logical plan at an RDD boundary so
      // the per-round plan tree stays bounded; unlike localCheckpoint the
      // result stays CacheManager-managed, so the unpersist below actually
      // frees it (a localCheckpoint'd Dataset has no cache entry and its
      // blocks would linger until GC)
      val truncated =
        if (iter % 5 == 4)
          spark.createDataFrame(stepped.rdd, stepped.schema)
        else stepped
      val next = truncated.cache()
      // sum over ZERO rows is SQL NULL — an empty node set converges
      // immediately with empty labels instead of an NPE
      val row = next.agg(sum($"changed")).head()
      val changed = if (row.isNullAt(0)) 0L else row.getLong(0)
      cached.unpersist(false)
      cached = next
      labels = next.select($"id", $"comp")
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(false)
    directed.unpersist(false)
    if (!converged) {
      cached.unpersist(false)
      throw new IllegalStateException(
        s"E_CC_UNCONVERGED: hash-min label propagation did not converge within " +
          s"$maxRounds rounds (component diameter exceeds the budget); refusing " +
          "to emit possibly-wrong component labels. Next: raise the round budget " +
          "or use ConnectedComponents.labelsAlternating (large-star/small-star) " +
          "for high-diameter graphs.")
    }
    lastRunInfo.set(s"hash-min:distributed:rounds=$iter")
    labels
  }

  /** Alternating large-star/small-star CC (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — the successor to hash-min for
    * HIGH-DIAMETER graphs: converges in O(log² n) alternations instead of
    * O(diameter) rounds, with every step a groupBy(min)+join (no
    * adjacency lists collected, hub-safe). Same output contract as
    * [[labels]]: every node labeled with its component's minimum id.
    *
    *  - large-star(u): connect every STRICTLY LARGER neighbor of u to
    *    m(u) = min(N(u) ∪ {u})
    *  - small-star(u): connect every neighbor ≤ u, and u itself, to m(u)
    *
    * Two-phase: distributed alternations do the contraction; once the
    * residual edge set fits `localFinish` (and ≥2 distributed rounds have
    * run), a count-guarded collect + min-label union-find replaces the
    * long convergence tail — Kiveris et al. §6's own finish-in-memory
    * step. At 10^12 edges the first alternations shrink the graph by
    * orders of magnitude, so the tail-round saving is where the wall-clock
    * lives; the bound (200k edges ≈ 3 MB) keeps the driver safe.
    *
    * At the fixpoint the edge set is a union of stars centered at
    * component minima; labels read off in one pass. Convergence compares
    * (count, xor-fold, independent xor-fold) signatures of the edge sets
    * — one aggregate job instead of an except() anti-join; two
    * independent 64-bit checksums over equal-size sets make a false match
    * astronomically unlikely, and the terminal star shape is what the
    * label read-off consumes. */
  /** Default residual-edge bound for [[labelsAlternating]]'s local-finish
    * stage: 200k edges ≈ 3 MB on the driver — far below any sane driver
    * heap, far above the point where another multi-shuffle alternation
    * round beats a single collect. */
  val DefaultLocalFinish = 200000L

  def labelsAlternating(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 30, localFinish: Long = DefaultLocalFinish): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    def normalized(df: DataFrame) = df
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").distinct()
    // m(u) over the symmetric adjacency, computed by aggregation only
    def withMin(nbrs: DataFrame) = nbrs
      .join(nbrs.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m")), "u")
    // (count, xor-fold, independent xor-fold) signature of an edge set —
    // xor folds, never sum: ANSI mode makes sum(hash) overflow throw
    def signature(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64($"a", $"b")),
        bit_xor(xxhash64($"b", $"a", $"a"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var cur = normalized(
      edges.select($"src".as("a"), $"dst".as("b"))).cache()
    var curSig = signature(cur)
    var converged = curSig._1 == 0
    var iter = 0
    while (!converged && iter < maxRounds) {
      // Two-phase CC (Kiveris et al. §6 run their alternation until the
      // graph "fits in memory on a single machine" and finish there): once
      // the residual edge set is within the bound, ONE count-guarded
      // collect + union-find replaces the remaining O(log² n) multi-
      // shuffle alternations. Guarded to iter ≥ 2 so the distributed
      // alternation path is always the one that did the contraction work
      // (and stays exercised by every caller — the bound only short-
      // circuits the long convergence tail, it never replaces the engine).
      if (iter >= 2 && curSig._1 <= localFinish) {
        lastRunInfo.set(
          s"alternating:local-finish:rounds=$iter:residual_edges=${curSig._1}")
        val comp = localUnionFind(cur.collect().map(r => (r.getLong(0), r.getLong(1))))
        cur.unpersist(false)
        val compDf = comp.toSeq.toDF("id", "center")
        return nodes.join(broadcast(compDf), Seq("id"), "left")
          .select($"id", coalesce($"center", $"id").as("comp"))
      }
      val nbrs = cur.select($"a".as("u"), $"b".as("v"))
        .unionAll(cur.select($"b".as("u"), $"a".as("v")))
      // cache each star's output: the next step reads it from two plan
      // branches (and the convergence check a third time).
      // large-star is NOT distinct'd: a duplicate (v, m) arises only via
      // different smaller neighbors u of v, so the row count stays ≤ the
      // DIRECTED edge count (one output per (u,v) with v>u — O(E), hub-
      // safe); small-star's terminal distinct cleans them, and skipping
      // the dedup saves a full shuffle per alternation. The dedup only
      // pays for itself on clique-like graphs — hash-min's territory.
      // Orientation: m = min(N(u) ∪ {u}) ≤ u < v, so a > b always holds
      // and lsNbrs symmetrizes anyway — no least/greatest needed.
      val large = withMin(nbrs)
        .filter($"v" > $"u")
        .select($"v".as("a"), $"m".as("b"))
        .filter($"a" =!= $"b")
        .cache()
      val lsNbrs = large.select($"a".as("u"), $"b".as("v"))
        .unionAll(large.select($"b".as("u"), $"a".as("v")))
      val lsm = withMin(lsNbrs)
      val small = normalized(
        lsm.filter($"v" <= $"u").select($"v".as("a"), $"m".as("b"))
          .unionAll(lsm.select($"u".as("a"), $"m".as("b"))))
      // truncate the logical plan at an RDD boundary EVERY iteration:
      // each step references `cur` ~32 times (unions + self-joins), so
      // without truncation the plan tree grows exponentially and AQE's
      // plan stringification alone OOMs the driver within ~5 iterations
      val next = spark.createDataFrame(small.rdd, small.schema).cache()
      val nextSig = signature(next)
      converged = nextSig == curSig
      large.unpersist(false)
      cur.unpersist(false)
      cur = next
      curSig = nextSig
      iter += 1
    }
    if (!converged) {
      cur.unpersist(false)
      throw new IllegalStateException(
        s"E_CC_UNCONVERGED: large-star/small-star did not reach an edge " +
          s"fixpoint within $maxRounds alternations; refusing to emit " +
          "possibly-wrong component labels. Next: raise the round budget.")
    }
    lastRunInfo.set(s"alternating:distributed:rounds=$iter:star_edges=${curSig._1}")
    // star fixpoint: every leaf has exactly one edge to its center (min);
    // isolated nodes label themselves
    val centers = cur.groupBy($"b".as("id")).agg(min($"a").as("center"))
    nodes.join(centers, Seq("id"), "left")
      .select($"id", coalesce($"center", $"id").as("comp"))
  }

  /** Path-compressed union-find with min-label roots over a bounded edge
    * array — the local-finish stage of [[labelsAlternating]]. Returns
    * every node appearing in an edge mapped to its component minimum;
    * nodes absent from the map are isolated (label themselves). */
  private[queries] def localUnionFind(edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // min-label union: the smaller root stays root, so the final root of
      // every tree IS the component minimum — same contract as the stars
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.map(k => k -> find(k)).toMap
  }
}
