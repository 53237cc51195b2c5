package graft.tools

import graft.functions.TextHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cardinalities + phase timings of the near-dup scoring
  * pipeline (docSets → banded → candidate pairs → verify) at a given SF —
  * the numbers that decide where the optimization leverage is. */
object ProbeCand {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val bandsFromSetUdf =
      udf((hs: Array[Long]) => TextHash.bandKeys(TextHash.minhashFromSet(hs)))
    val d = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
    val corpus = d.unionAll(
        d.filter($"doc_id" % 10 === 0).select(($"doc_id" + 1000000).as("doc_id"), $"text"))
      .unionAll(d.filter($"doc_id" % 7 === 0).select(($"doc_id" + 2000000).as("doc_id"),
        concat($"text", lit(" nearly duplicate tail")).as("text")))
    val docSets = corpus
      .select($"doc_id", graft.functions.GraftFunctions.shingleSet(spark, $"text").as("hset"))
      .cache()
    t("docSets materialize") { docSets.count() }
    println(s"[probe] corpus docs = ${docSets.count()}")
    val banded = docSets
      .select($"doc_id", posexplode(bandsFromSetUdf($"hset")).as(Seq("band", "bkey")))
    val bandStats = t("band bucket stats") {
      banded.groupBy($"band", $"bkey").count()
        .agg(count(lit(1)), sum($"count" * ($"count" - 1) / 2), max($"count")).head()
    }
    println(s"[probe] buckets=${bandStats.getLong(0)} rawPairsUpper=${bandStats.get(1)} maxBucket=${bandStats.getLong(2)}")
    val pairs = banded.select($"band", $"bkey", $"doc_id".as("doc_a"))
      .join(banded.select($"band", $"bkey", $"doc_id".as("doc_b")), Seq("band", "bkey"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
      .cache()
    val nPairs = t("distinct candidate pairs") { pairs.count() }
    println(s"[probe] candidate pairs = $nPairs")
    val setSize = docSets.select(avg(size($"hset")), max(size($"hset"))).head()
    println(s"[probe] avg |hset| = ${setSize.get(0)}, max = ${setSize.get(1)}")
    val jaccardFromSetsUdf = udf((sa: Array[Long], sb: Array[Long]) => {
      val inter = TextHash.sortedIntersect(sa, sb)
      val union = sa.length.toLong + sb.length.toLong - inter
      if (union == 0) 0L else inter * 1000L / union
    })
    val scored = pairs
      .repartition(spark.sparkContext.defaultParallelism)
      .join(docSets.select($"doc_id".as("doc_a"), $"hset".as("hset_a")), "doc_a")
      .join(docSets.select($"doc_id".as("doc_b"), $"hset".as("hset_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        jaccardFromSetsUdf($"hset_a", $"hset_b").as("jaccard_permille"))
    t("verify (noop)") { scored.write.format("noop").mode("overwrite").save() }
    t("verify again (noop)") { scored.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
