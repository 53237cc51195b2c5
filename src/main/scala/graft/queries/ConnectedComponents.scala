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
          "or switch to large-star/small-star for high-diameter graphs.")
    }
    labels
  }
}
