package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerate PLANS.md: formatted physical plans for the headline queries,
  * so a reviewer can audit pushdown/pruning/exchange shapes without
  * running anything. Usage: runMain graft.tools.PlansDump [sfDir] */
object PlansDump {
  val Headline = Seq(
    "q1_agg", "q3_top_orders", "q_window_top_orders",
    "q_dedup_exact", "q_lsh_pairs", "q_jaccard_pairs", "q_dedup_components",
    "q_knn_brute", "q_ann_top_pairs", "q_ann_ivf", "q_ann_ivf_probe2",
    "q_dedup_embedding", "q_dedup_components_chain", "q_split_assign",
    "q_repetition", "q_dedup_lines", "q_dedup_normalized", "q_dedup_incremental",
    "q_dedup_incremental_sharded", "q_ann_ivf_trained",
    "q_ann_ivf_2level_trained", "q_decontaminate", "q_importance_weights",
    "q_importance_sample", "q_quality_buckets", "q_dedup_substrings",
    "q_dedup_spans", "q_dedup_spans_cut", "q_pack_sequences", "q_mixture_table", "q_url_canonical",
    "q_ngram_counts", "q_kn_model", "q_bpe_pairs", "q_vocab_coverage",
    "q_link_graph", "q_pagerank_hosts",
    "q_sample_to_budget", "q_threshold_calibration",
    "q_crawl_frontier", "q_url_blocklist", "q_winnow", "q_quality_classifier",
    "q_robots_gate", "q_classifier_sweep",
    "q_attribute_mixer", "q_host_reputation", "q_crawl_politeness",
    "q_topic_keywords",
    "q_split_leakage", "q_split_repair",
    "q_simhash_near", "q_tfidf_terms", "q_bm25_search", "q_recrawl_latest",
    "q_host_cap", "q_c4_line_filter", "q_dedup_incremental_fuzzy",
    "q_mixture_temperature", "q_wordpiece_fertility",
    "q_fix_mojibake", "q_anchor_text", "q_lsh_tuning", "q_scrub_luhn",
    "q_shard_assembly", "q_recrawl_schedule", "q_langid_confusion",
    "q_hll_registers", "q_chunk_passages",
    "q_diff_topk", "q_diff_coverage", "q_source_counts_salted",
    "q_pipeline_verdicts",
    "q_boilerplate_host", "q_link_reciprocity", "q_extract_meta",
    "q_epoch_upsample", "q_readability", "q_word_lift",
    "q_dedup_cluster_sizes", "q_kappa_labelers",
    "q_corpus_drift", "q_host_quality_norm",
    "q_dup_ngrams", "q_mirror_hosts", "q_cdc_upsert",
    "q_cluster_best_rep", "q_rule_marginals", "q_canary_scan",
    "q_holdout_alloc", "q_heaps_curve", "q_export_manifest",
    "q_url_shape", "q_host_lang_purity", "q_length_mad",
    "q_dedup_cross_source",
    "q_funnel", "q_json_props", "q_retention_cohorts",
    "q_dedup_nfc", "q_graph_triangles", "q_event_transitions",
    "q_event_anomaly", "q_ngram_novelty", "q_holdout_select")

  /** Per-query caveats that survive regeneration — rendered above the
    * plan so a reviewer reading only PLANS.md isn't misled. */
  val Notes: Map[String, String] = Map(
    "q_dedup_components" -> ("NOTE: this static plan shows only the label " +
      "READ-OFF (id-only scans + broadcast of the locally-computed labels). " +
      "The LSH+Jaccard scoring pipeline and the count-guarded two-phase CC " +
      "(ConnectedComponents.labels) execute EAGERLY during query " +
      "construction; their per-stage shapes are the q_jaccard_pairs plan " +
      "plus either one collect (edge set within the 200k local-finish " +
      "bound) or the one-join-per-round distributed loop."),
    "q_dedup_embedding" -> ("NOTE: as with q_dedup_components, the " +
      "sign-LSH candidate generation, exact integer-cosine gate and CC run " +
      "eagerly inside the query function; this plan shows the final " +
      "read-off join."),
    "q_dedup_components_chain" -> ("NOTE: the alternating large-star/" +
      "small-star rounds (≥2, then bounded local finish) run eagerly " +
      "during construction; this plan shows the label read-off."),
    "q_split_leakage" -> ("NOTE: consumes the MATERIALIZED shared labels " +
      "intermediate (TextQueries.componentLabels — LSH+Jaccard+CC computed " +
      "once per run, checkpointed ids-only); the plan below is the " +
      "component×split rollup over that RDD scan."),
    "q_split_repair" -> ("NOTE: consumes the same materialized labels " +
      "intermediate as q_split_leakage; the plan below is the " +
      "per-component split map."),
    "q_dedup_incremental_sharded" -> ("NOTE: per-shard Bloom build " +
      "(grouped BloomFilter aggregation) and the cogroup application " +
      "appear as the two-sided CoGroup below; the exact LEFT SEMI verify " +
      "keeps the output fpp-independent."),
    "q_ann_ivf_trained" -> ("NOTE: the Lloyd iterations (broadcast " +
      "centroids → assignment map → vector-sum aggregation, one bounded " +
      "collect per iteration) run eagerly during construction; this plan " +
      "shows the final cell-join search."),
    "q_ann_ivf_2level_trained" -> ("NOTE: the child Lloyd chain runs " +
      "eagerly like q_ann_ivf_trained; the super-level Lloyd runs " +
      "driver-local over the ≤numCells child centroids. This plan shows " +
      "the hierarchy-assigned cell-join search."),
    "q_decontaminate" -> ("NOTE: the contract is the broadcast — the " +
      "eval n-gram set is the only thing that shuffles gram hashes; the " +
      "train side dedups grams per doc in the projection " +
      "(array_distinct) and probes the BroadcastExchange, so no text or " +
      "train n-gram ever enters a shuffle (PlanShapeSpec-locked)."))

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans of the headline queries\n\n"
    sb ++= s"Generated by `graft.tools.PlansDump` over `$dir` at 8 shuffle\n"
    sb ++= "partitions. Things to check: `PushedFilters` and `ReadSchema` on\n"
    sb ++= "every scan, `Exchange` inputs (no text/vector payloads in the\n"
    sb ++= "dedup/ANN shuffles), partial aggregates before exchanges, and\n"
    sb ++= "`TakeOrderedAndProject` wherever a bounded top-K is claimed.\n"
    for (n <- Headline; fn <- qs.get(n)) {
      sb ++= s"\n## $n\n\n"
      Notes.get(n).foreach(note => sb ++= s"$note\n\n")
      sb ++= "```\n"
      val plan = fn(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // iterative queries (CC) accrete huge cached lineages — cap each
      sb ++= (if (plan.length <= 12000)
        plan else plan.take(12000) + s"\n… [truncated ${plan.length - 12000} chars]\n")
      sb ++= "```\n"
      // isolate per-query plans from earlier queries' cache registrations
      spark.catalog.clearCache()
      graft.queries.TextQueries.clearComponentMemo()
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.result())
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
