package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing anything: parquet footers, codegen,
    // the noop sink, and the shuffle machinery otherwise all land on
    // whichever query happens to run first (q_jaccard_pairs was carrying
    // ~3s of session init in earlier rounds' numbers). The warm set is the
    // FULL table registry, not a hand-kept list — a query over a new table
    // cannot silently re-introduce first-query init bias.
    // weather bracket, leading edge (see the trailing-edge burns below):
    // a battery can take 10+ minutes and this VM's granted capacity swings
    // on a minutes scale, so one post-run calibration can read calm after
    // a stormy battery. Two brackets make that visible in the artifact.
    val preBurn1 = graft.bench.ScalingBench.burnRate(1)
    val preBurnN = graft.bench.ScalingBench.burnRate(cpus.toInt)
    locally {
      import org.apache.spark.sql.functions._
      // warmup failures must not abort the battery: a missing table only
      // un-warms the queries that read it (which then fail in their own
      // try/catch below with a per-query error entry)
      import scala.util.control.NonFatal
      // FULL-table warmup (not limit(1000)): on this VM cold virtio reads
      // run at ~30 MB/s, so a partial warmup leaves the first full scan of
      // each table paying seconds of cold I/O inside some query's timed
      // window. One full pass pulls every table into the OS page cache —
      // the steady state a long-running cluster's working set lives in.
      for ((_, tbl) <- graft.queries.Tables.all)
        try tbl(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case NonFatal(_) => () } // never swallow OOM/interrupt
      // one shuffle through the docs table to warm the exchange machinery
      try graft.queries.Tables.documents(spark, sfDir)
        .select(md5(col("text"))).groupBy(col("md5(text)")).count()
        .write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () }
    }
    // Timing materializes EVERY column through the noop sink: count() lets
    // Catalyst prune unreferenced projections, under-timing UDF-heavy
    // queries (q_scrub_pii read as 0.2s because the scrub never ran).
    // clearCache() between queries keeps each measurement independent and
    // stops intra-query cache()s (jaccard docSets, ann corpus) accumulating
    // across the battery (round-2 ADVICE; also kills the re-cache warning
    // spam in the bench tail).
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case scala.util.control.NonFatal(e) => Some(e.getClass.getSimpleName) }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> ((dt, err))
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, Some(e))) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    // headline throughput: the full quality pipeline over synthesized pages
    val pipeN = 200000L
    val t0 = System.nanoTime()
    graft.pipeline.QualityPipeline
      .run(spark, graft.synth.SynthSpark.pages(spark, pipeN, cpus.toInt * 4))
      .toDF().selectExpr("sum(keep)").collect()
    val docsPerSec = pipeN / ((System.nanoTime() - t0) / 1e9)
    // keep/drop F1 MEASURED from the pipeline-vs-independent-oracle
    // agreement query (tp/fp/fn), not asserted
    val f1 = try {
      val r = graft.queries.PipelineQueries.qPipelineAgreement(spark, sfDir).head()
      val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (2 * tp + fp + fn == 0) 0.0 else 2.0 * tp / (2 * tp + fp + fn)
    } catch { case scala.util.control.NonFatal(_) => -1.0 }
    // In-band weather: raw integer-burn rates at 1 thread and at the
    // battery's thread count, measured AFTER the battery on the same JVM.
    // machine_parallel_ratio far below the thread count means the
    // hypervisor granted a fraction of the advertised cores during this
    // window — the documented confound that makes two batteries at the
    // same HEAD differ by 3×+. Recorded so every committed artifact
    // carries the weather that produced it.
    val burn1 = graft.bench.ScalingBench.burnRate(1)
    val burnN = graft.bench.ScalingBench.burnRate(cpus.toInt)
    println(
      f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","pipeline_docs_per_sec":$docsPerSec%.1f,"keep_drop_f1_vs_oracle":$f1%.6f,"machine_burn_1t":$burn1%.0f,"machine_burn_nt":$burnN%.0f,"machine_parallel_ratio":${burnN / burn1}%.2f,"machine_burn_1t_pre":$preBurn1%.0f,"machine_burn_nt_pre":$preBurnN%.0f,"machine_parallel_ratio_pre":${preBurnN / preBurn1}%.2f}""")
    spark.stop()
  }
}
