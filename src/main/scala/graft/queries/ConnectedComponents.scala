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

  /** Label every node with its component's minimum id.
    *
    * @param nodes single column `id` (distinct node ids)
    * @param edges columns `src`, `dst` (undirected; either orientation)
    * @return columns `id`, `comp` — sorted by nothing (caller orders)
    */
  def labels(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = DefaultMaxRounds): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .unionAll(edges.select($"dst".as("src"), $"src".as("dst")))
      .cache()
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
    if (!converged) {
      cached.unpersist(false)
      throw new IllegalStateException(
        s"E_CC_UNCONVERGED: hash-min label propagation did not converge within " +
          s"$maxRounds rounds (component diameter exceeds the budget); refusing " +
          "to emit possibly-wrong component labels. Next: raise the round budget " +
          "or use ConnectedComponents.labelsAlternating (large-star/small-star) " +
          "for high-diameter graphs.")
    }
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
    * At the fixpoint the edge set is a union of stars centered at
    * component minima; labels read off in one pass. Convergence compares
    * (count, xor-fold, independent xor-fold) signatures of the edge sets
    * — one aggregate job instead of an except() anti-join; two
    * independent 64-bit checksums over equal-size sets make a false match
    * astronomically unlikely, and the terminal star shape is what the
    * label read-off consumes. */
  def labelsAlternating(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 30): DataFrame = {
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
    // star fixpoint: every leaf has exactly one edge to its center (min);
    // isolated nodes label themselves
    val centers = cur.groupBy($"b".as("id")).agg(min($"a").as("center"))
    nodes.join(centers, Seq("id"), "left")
      .select($"id", coalesce($"center", $"id").as("comp"))
  }
}
