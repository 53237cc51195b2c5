package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading helpers for the driver-generated parquet test data
  * (/root/repo/TESTDATA.md). Every query receives `(spark, sfDir)` and loads
  * only what it needs — Catalyst prunes columns/predicates into the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Spread a narrow scan across the machine before per-row-heavy work.
    * The local test parquets are single-row-group files, so every scan
    * (and every union of scans) arrives as 1-3 partitions and a heavy
    * projection serializes on 1-3 of the machine's cores (measured: the
    * ExactSubstr window-digest chain ran 3 tasks × ~3.3 s at sf0.1).
    * CONDITIONAL on the scan actually being under-split, so at production
    * scale — where the scan arrives in thousands of splits — this is a
    * plan-level no-op and no text ever rides the extra exchange; locally
    * it carries each row exactly once, the same bytes the scan itself
    * read. User-specified repartition is exempt from AQE coalescing.
    *
    * ONLY pass scan-level frames (scans, unions/projections of scans):
    * the partition-count probe goes through `df.rdd`, and under AQE
    * that materializes every upstream query stage — on a frame with an
    * exchange below it, the probe would silently RUN the upstream
    * pipeline at DataFrame-construction time. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Every table accessor, by name — harness warmups iterate THIS registry
    * so a query over a newly-added table can never re-introduce the
    * charged-to-first-query init bias (round-2 verdict, "what's wrong" #3). */
  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "lineitem" -> lineitem _,
    "orders" -> orders _,
    "customer" -> customer _,
    "supplier" -> supplier _,
    "part" -> part _,
    "nation" -> nation _,
    "region" -> region _,
    "events" -> events _,
    "documents" -> documents _,
    "embeddings" -> embeddings _)
}
