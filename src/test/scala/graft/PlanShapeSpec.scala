package graft

import graft.queries.{Relational, TextQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts the 100-TB posture depends on: filters reach
  * the parquet scan, projections prune the read schema, and the byte-level
  * shingle kernel is bit-identical to the String path on arbitrary input. */
class PlanShapeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Shuffle-exchange plan blocks EXCLUDING the conditional scan-spread
    * (Tables.spread): that round-robin exchange exists only when the local
    * single-row-group parquet arrives under-split (it is a plan-level
    * no-op once a scan has >= machine-parallelism splits, i.e. always at
    * production scale), and it carries each scanned row exactly once —
    * the same bytes the scan itself read. The no-text/no-payload
    * contracts below are about the DEDUP shuffles: every hash-partitioned
    * exchange must still carry only ids/digests/keys. */
  private def hashShuffleBlocks(plan: String): Array[String] =
    plan.split("\n\n").filter(b =>
      b.linesIterator.hasNext &&
        b.linesIterator.next().matches(""".*\)\s*Exchange.*""") &&
        // NOTE: the textual check cannot count spread instances — the one
        // conditional spread subtree prints once per plan branch that
        // reads the corpus (decontaminate's eval+train sides show it 3×).
        // The guarded property stays: hash-partitioned exchanges carry
        // only ids/digests/keys.
        !b.contains("RoundRobinPartitioning"))

  test("q3_top_orders pushes its filters into the parquet scans") {
    val plan = formatted(Relational.q3TopOrders(spark, dir))
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
    // at least one scan carries a real pushed predicate, not just []
    assert("""PushedFilters: \[[^\]]+\]""".r.findFirstIn(plan).isDefined,
      s"every PushedFilters list is empty:\n$plan")
  }

  test("q_doc_tokens reads only the columns it projects") {
    val plan = formatted(TextQueries.qDocTokens(spark, dir))
    val readSchemas = """ReadSchema: struct<([^>]*)>""".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { s =>
      assert(!s.contains("text:") || s.split(",").length <= 3,
        s"scan reads more than it needs: $s")
      assert(!s.contains("source"), s"unused column read: $s")
    }
  }

  test("pipeline scan never reads warc_ts/lang (projection pruning)") {
    val df = graft.pipeline.QualityPipeline
      .runDf(spark, spark.read.parquet(s"$dir/documents.parquet")
        .selectExpr("concat('u', doc_id) AS url", "CAST(NULL AS BINARY) AS html",
          "text", "doc_id AS warc_ts_stand_in"))
      .toDF()
    // the InternalRow path prunes to (url, html, text) before toRdd
    assert(df.columns.toSeq.take(3) === Seq("url", "keep", "reason"))
  }

  test("q_repetition is a pure per-row map: spread + the presentation sort") {
    // the repetition rule needs no cross-row state — the plan must be
    // scan → projects, with the only exchanges being the conditional
    // scan-spread (round-robin; absent once the scan has real splits)
    // and the final orderBy. No hash-partitioned exchange: the per-row
    // map never groups or joins.
    val plan = formatted(TextQueries.qRepetition(spark, dir))
    assert(!plan.contains("hashpartitioning"),
      s"per-row map must not hash-shuffle:\n$plan")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most spread + presentation sort:\n$plan")
    assert("""ReadSchema: struct<doc_id:bigint,text:string>""".r.findFirstIn(plan).isDefined,
      s"scan must read only (doc_id, text):\n$plan")
  }

  test("q_decontaminate probes a BROADCAST eval set and ships no text or n-grams") {
    // the scale contract: the tiny eval side broadcasts, the 10^12-row
    // train side never shuffles its text or its exploded n-grams — only
    // ids and counts enter shuffle exchanges
    val plan = formatted(TextQueries.qDecontaminate(spark, dir))
    assert(plan.contains("BroadcastExchange"),
      s"eval n-gram set must broadcast:\n$plan")
    val shuffleBlocks = hashShuffleBlocks(plan)
    shuffleBlocks.foreach { b =>
      assert(!b.contains("text#"), s"text in a shuffle exchange:\n$b")
      assert(!b.contains("g#"), s"train n-grams in a shuffle exchange:\n$b")
      // only the tiny EVAL side may shuffle gram hashes (its distinct());
      // a shuffle carrying (doc_id, h) pairs would be the full train
      // corpus's n-grams — the plan this operator exists to avoid
      assert(!(b.contains("h#") && b.contains("doc_id#")),
        s"train (doc_id, n-gram-hash) pairs in a shuffle exchange:\n$b")
    }
  }

  test("q_dedup_substrings broadcasts the duplicated-digest set and ships no text") {
    // same discipline as q_decontaminate: per-doc window distinct happens
    // inside the projection, digests aggregate with map-side partials (the
    // shuffles carry (h, count) or (doc_id, count) — never raw windows or
    // text), and the duplicated-digest set (the small side at corpus
    // scale: most windows are unique) broadcasts for the join-back
    val plan = formatted(graft.queries.CorpusQueries.qDedupSubstrings(spark, dir))
    assert(plan.contains("BroadcastExchange"),
      s"duplicated-digest set must broadcast:\n$plan")
    val shuffleBlocks = hashShuffleBlocks(plan)
    shuffleBlocks.foreach { b =>
      assert(!b.contains("text#"), s"text in a shuffle exchange:\n$b")
      assert(!b.contains("g#"), s"raw window strings in a shuffle exchange:\n$b")
    }
  }

  test("q_simhash_near shuffles only (band, key, id, fp) — never text") {
    // the Manku blocking contract: text collapses to a 32-bit fingerprint
    // in the scan projection; the self-join exchanges carry ids + Longs
    val plan = formatted(graft.queries.SearchQueries.qSimhashNear(spark, dir))
    val shuffleBlocks = hashShuffleBlocks(plan)
    assert(shuffleBlocks.nonEmpty)
    shuffleBlocks.foreach { b =>
      assert(!b.contains("text#"), s"text in a shuffle exchange:\n$b")
    }
  }

  test("q_dedup_incremental_fuzzy ships digests, band keys and shingle sets — never text") {
    val plan = formatted(
      graft.queries.CleanQueries.qDedupIncrementalFuzzy(spark, dir))
    val shuffleBlocks = plan.split("\n\n").filter(b =>
      b.linesIterator.hasNext &&
        b.linesIterator.next().matches(""".*\)\s*Exchange.*"""))
    assert(shuffleBlocks.nonEmpty)
    shuffleBlocks.foreach { b =>
      assert(!b.contains("text#"), s"text in a shuffle exchange:\n$b")
    }
  }

  test("mirror-hosts / cross-source / NFC dedup exchanges carry digests, never text") {
    for (q <- Seq(
        graft.queries.HygieneQueries.qMirrorHosts(spark, dir),
        graft.queries.CorpusQueries.qDedupCrossSource(spark, dir),
        graft.queries.CorpusQueries.qDedupNfc(spark, dir))) {
      val plan = formatted(q)
      val shuffleBlocks = plan.split("\n\n").filter(b =>
        b.linesIterator.hasNext &&
          b.linesIterator.next().matches(""".*\)\s*Exchange.*"""))
      assert(shuffleBlocks.nonEmpty)
      shuffleBlocks.foreach { b =>
        assert(!b.contains("text#"), s"text in a shuffle exchange:\n$b")
      }
    }
  }

  test("argmax aggregates plan WITHOUT WindowExec (best-rep, lang purity)") {
    // the max/min(struct) election claim: a commutative aggregate, not a
    // per-group sort — no Window operator may appear anywhere
    for (q <- Seq(
        graft.queries.AnalyticsQueries.qClusterBestRep(spark, dir),
        graft.queries.HygieneQueries.qHostLangPurity(spark, dir))) {
      val plan = formatted(q)
      assert(!plan.contains("Window"), s"WindowExec in an argmax-agg plan:\n$plan")
    }
  }

  test("q_funnel plans as aggregates + joins: no Window, no per-user sort") {
    val plan = formatted(graft.queries.EventsQueries.qFunnel(spark, dir))
    assert(!plan.contains("Window"), plan)
    // the only Sort is the presentation orderBy on user_id
    val sorts = """\(\d+\) Sort""".r.findAllIn(plan).size
    assert(sorts <= 2, s"unexpected sorts (joins should be hash, not merge):\n$plan")
  }

  test("AQE skew-join triggers on a synthesized hot-host join (skew=true in plan)") {
    // CI-locks the salting + AQE skew claim like the other plan contracts:
    // not "the config is set" but "the runtime actually marked and split
    // the skewed partition". One host carries ~95% of the fact rows; with
    // broadcast disabled the join is sort-merge, and AQE must rewrite it
    // as SortMergeJoin(skew=true). Thresholds are lowered to make the
    // 4-partition local shuffle legible to the detector; the PRODUCTION
    // defaults (256 MB, factor 5) are the right scale-out values — this
    // test proves the mechanism fires, not the thresholds.
    import org.apache.spark.sql.functions.{length, sum}
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // thresholds sized for COMPRESSED map-output bytes: the hot
      // partition is ~2 MB raw but one repeated string, so lz4 crushes it
      // to tens of KB — the detector sees post-compression sizes
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      val fact = spark.range(200000).selectExpr(
        "CASE WHEN id < 190000 THEN 'hot.example' ELSE concat('cold-', id % 37) END AS host",
        "repeat('x', 64) AS payload")
      val dim = spark.range(38).selectExpr(
        "CASE WHEN id = 37 THEN 'hot.example' ELSE concat('cold-', id) END AS host",
        "id AS w")
      // global partial agg after the join: no required distribution on
      // host downstream, so OptimizeSkewedJoin is free to split
      val agg = fact.join(dim, Seq("host")).select(sum(length(org.apache.spark.sql.functions.col("payload"))))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-host join as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("split-integrity queries consume the materialized labels (no scoring re-pass in the plan)") {
    // the round-5 reuse win, CI-locked: q_split_leakage/q_split_repair must
    // read the checkpointed labels RDD, never re-derive components — their
    // plans contain an ExistingRDD scan and NO shingle/minhash UDF stages
    // (the scoring pipeline's signature operators)
    for (q <- Seq(
        graft.queries.CorpusQueries.qSplitLeakage(spark, dir),
        graft.queries.CorpusQueries.qSplitRepair(spark, dir))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
        s"expected the materialized labels RDD in the plan:\n${plan.take(2000)}")
      assert(!plan.contains("shingle") && !plan.contains("minhash"),
        s"split-integrity plan re-runs the scoring pipeline:\n${plan.take(2000)}")
    }
    graft.queries.TextQueries.clearComponentMemo()
  }

  test("sharded incremental dedup: cogroup application, no filter broadcast") {
    // the sharded path's whole point is that NO Bloom filter is broadcast:
    // filters flow through the shard-keyed cogroup to the task that owns
    // the shard. The plan must contain a CoGroup and the only
    // BroadcastExchanges allowed are the tiny id-join sides AQE picks —
    // never a binary filter column.
    val plan = graft.queries.CorpusQueries
      .qDedupIncrementalSharded(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("CoGroup"), s"expected cogroup application:\n${plan.take(2000)}")
    val bcastWithFilter = plan.linesIterator
      .filter(_.contains("BroadcastExchange")).exists(_.contains("filter"))
    assert(!bcastWithFilter, s"a Bloom filter column is broadcast:\n${plan.take(2000)}")
  }

  test("shingle byte kernel == String kernel on arbitrary strings (seeded sweep)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(0xC0FFEE)
    val extras = "éü中∂ "
    for (trial <- 0 until 1000) {
      val len = rnd.nextInt(40)
      val mixed = trial % 2 == 1
      val s = (0 until len).map { _ =>
        if (mixed && rnd.nextInt(5) == 0) extras(rnd.nextInt(extras.length))
        else (32 + rnd.nextInt(95)).toChar
      }.mkString
      assert(graft.functions.TextHash.shingleSetUtf8(UTF8String.fromString(s)).toSeq ===
        graft.functions.TextHash.shingleSet(s).toSeq, s"mismatch on: '$s'")
    }
  }
}
