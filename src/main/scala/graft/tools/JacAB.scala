package graft.tools
import graft.functions.TextHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: the round-1 q_jaccard_pairs plan (text through the band join,
  * distinct on text pairs, per-pair re-shingling) vs the round-2 plan,
  * both under warmed noop-sink timing. */
object JacAB {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    spark.read.parquet(s"$dir/documents.parquet")
      .select(md5($"text")).groupBy($"`md5(text)`").count()
      .write.format("noop").mode("overwrite").save()

    def oldPlan(): org.apache.spark.sql.DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
      val corpus = d.unionAll(d.filter($"doc_id" % 10 === 0).select(($"doc_id" + 1000000).as("doc_id"), $"text"))
        .unionAll(d.filter($"doc_id" % 7 === 0).select(($"doc_id" + 2000000).as("doc_id"),
          concat($"text", lit(" nearly duplicate tail")).as("text")))
      val bandUdf = udf((t: String) => TextHash.bandKeys(TextHash.minhash(t)))
      val banded = corpus.select($"doc_id", $"text", posexplode(bandUdf($"text")).as(Seq("band", "bkey")))
      val a = banded.select($"band", $"bkey", $"doc_id".as("doc_a"), $"text".as("text_a"))
      val b = banded.select($"band", $"bkey", $"doc_id".as("doc_b"), $"text".as("text_b"))
      val jaccardUdf = udf((ta: String, tb: String) => {
        def shingles(t: String): java.util.HashSet[java.lang.Long] = {
          val s = new java.util.HashSet[java.lang.Long]()
          var i = 0
          while (i <= t.length - TextHash.ShingleW) { s.add(TextHash.shingleHash(t, i)); i += 1 }
          s
        }
        val sa = shingles(ta); val sb = shingles(tb)
        var inter = 0L
        val it = sa.iterator()
        while (it.hasNext) if (sb.contains(it.next())) inter += 1
        val union = sa.size.toLong + sb.size.toLong - inter
        if (union == 0) 0L else inter * 1000L / union
      })
      a.join(b, Seq("band", "bkey"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"text_a", $"text_b").distinct()
        .select($"doc_a", $"doc_b", jaccardUdf($"text_a", $"text_b").as("jaccard_permille"))
        .orderBy($"doc_a", $"doc_b")
    }
    for (r <- 1 to 2) {
      t(s"r$r OLD text-through-shuffle")(oldPlan().write.format("noop").mode("overwrite").save())
      t(s"r$r NEW set-based")(graft.queries.TextQueries.qJaccardPairs(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
