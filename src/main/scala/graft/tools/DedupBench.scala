package graft.tools

import org.apache.spark.sql.SparkSession

/** Dedup-family scale-curve harness (BENCH.md): times ONLY the dedup /
  * near-dup queries — the battery's super-linear candidates — over a
  * documents/embeddings directory, so the same family can be measured at
  * two generator scales (graft.tools.SfGen) and the per-query ratio
  * committed as evidence. Same discipline as graft.Bench: warmed session,
  * every column materialized through the noop sink, clearCache between
  * queries.
  *
  * Usage: runMain graft.tools.DedupBench <dir>
  */
object DedupBench {

  val family: Seq[String] = Seq(
    "q_dedup_exact", "q_minhash_sig", "q_lsh_pairs", "q_simhash",
    "q_fingerprint", "q_jaccard_pairs", "q_dedup_components",
    "q_dedup_components_chain", "q_dedup_embedding",
    "q_dedup_lines", "q_dedup_normalized", "q_dedup_incremental",
    "q_split_leakage", "q_split_repair", "q_decontaminate",
    "q_dedup_substrings", "q_dedup_spans", "q_importance_sample",
    "q_url_canonical", "q_winnow",
    // round-5 extension session: Hamming-neighbor join, incremental
    // fuzzy (two LSH sides), recrawl collapse, line-policy cleaning
    "q_simhash_near", "q_dedup_incremental_fuzzy", "q_recrawl_latest",
    "q_c4_line_filter",
    // second continuation: span cut, sharded Blooms, Gopher dup-ngram
    // chars, mirror hosts, cross-source matrix
    "q_dedup_spans_cut", "q_dedup_incremental_sharded", "q_dup_ngrams",
    "q_mirror_hosts", "q_dedup_cross_source", "q_dedup_nfc",
    "q_ngram_novelty")

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DedupBench <dir>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedupbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm: footers, codegen, noop sink, one shuffle (graft.Bench's rule —
    // first-query init must not be charged to whichever query runs first)
    locally {
      import org.apache.spark.sql.functions._
      import scala.util.control.NonFatal
      for ((_, tbl) <- graft.queries.Tables.all
           .filter(t => t._1 == "documents" || t._1 == "embeddings"))
        try tbl(spark, dir)
          .write.format("noop").mode("overwrite").save()
        catch { case NonFatal(_) => () }
      try graft.queries.Tables.documents(spark, dir)
        .select(md5(col("text"))).groupBy(col("md5(text)")).count()
        .write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () }
    }
    val preBurn1 = graft.bench.ScalingBench.burnRate(1)
    val preBurnN = graft.bench.ScalingBench.burnRate(cpus.toInt)
    // storm-proof reps, same policy as graft.Bench: best-of-2 with a
    // third rep on >3× disagreement — today's committed 5k/50k pair
    // showed single-shot per-query numbers inflated enough to read
    // FASTER at 10× rows (r5_dedup_gen_* run1 artifacts)
    def rep(name: String): (Double, Option[String]) = {
      val fn = graft.SparkEntry.queries(name)
      // scale-curve semantics: each family query is timed STANDALONE (the
      // r4 curve's baseline) — clear the shared CC-labels memo so
      // q_dedup_components / q_split_leakage / q_split_repair each pay
      // the full scoring pipeline here, unlike the battery, which
      // accounts it once as stage_cc_labels
      graft.queries.TextQueries.clearComponentMemo()
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); None }
        catch { case scala.util.control.NonFatal(e) => Some(e.getClass.getSimpleName) }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, err)
    }
    // per-query CC engine path (local-finish vs distributed + edge count),
    // so cross-scale curve comparisons can't silently mix engine paths
    // (round-4 ADVICE — the 5k and 50k points must be path-comparable)
    val ccPaths = scala.collection.mutable.LinkedHashMap.empty[String, String]
    graft.queries.ConnectedComponents.lastRunInfo.set(null)
    val results = family.map { name =>
      val r1 = rep(name)
      val r2 = rep(name)
      val disagree = math.max(r1._1, r2._1) > 3.0 * math.min(r1._1, r2._1) &&
        math.max(r1._1, r2._1) > 1.0
      val reps = if (disagree) Seq(r1, r2, rep(name)) else Seq(r1, r2)
      Option(graft.queries.ConnectedComponents.lastRunInfo.getAndSet(null))
        .foreach(ccPaths(name) = _)
      (name, reps.map(_._1).min, reps.map(_._2).collectFirst { case Some(e) => e })
    }
    val ccJson = ccPaths.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, v, _) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // weather brackets, same rationale as graft.Bench: a per-query storm
    // flare inside the family is visible only if the artifact carries the
    // machine's granted capacity on both sides of the run
    val postBurn1 = graft.bench.ScalingBench.burnRate(1)
    val postBurnN = graft.bench.ScalingBench.burnRate(cpus.toInt)
    // guarded ratios: a starved burn (0 iterations) emits -1, never
    // NaN/Infinity — the artifact must stay valid JSON (round-4 ADVICE)
    def ratio(hi: Double, lo: Double): String =
      if (lo > 0) f"${hi / lo}%.2f" else "-1"
    println(
      f"""{"metric":"dedup_family","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"dir":"$dir","cc_paths":$ccJson,"machine_parallel_ratio_pre":${ratio(preBurnN, preBurn1)},"machine_parallel_ratio":${ratio(postBurnN, postBurn1)}}""")
    spark.stop()
  }
}
