package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Exactness discipline: dot products run on 1e4-quantized integer
  * components (`round(x*10000) :: long`), so Spark and DuckDB produce the
  * same BIGINT and ranking ties can't flip on float summation order. The
  * brute-force top-k is the correctness baseline; the sign-LSH bucketing is
  * the scale path (bucket join instead of all-pairs).
  */
object VectorQueries {

  val Dim = 64
  val NumQueries = 50
  val TopK = 5
  val NumPlanes = 8

  @inline private def quant(x: Float): Long = math.floor(x.toDouble * 10000.0 + 0.5).toLong

  // Array[Float] signature: Spark hands the UDF primitive float arrays
  // (a Seq signature would box every element on access)
  private val dotUdf = udf((a: Array[Float], b: Array[Float]) => {
    var s = 0L
    var i = 0
    while (i < a.length) { s += quant(a(i)) * quant(b(i)); i += 1 }
    s
  })

  /** Deterministic pseudo-random hyperplane sign: +1 when (i·31+j·17) mod 7
    * < 3 (i = 1-based dimension, j = 0-based plane). */
  @inline private def planeSign(i: Int, j: Int): Long =
    if ((i * 31 + j * 17) % 7 < 3) 1L else -1L

  private val bucketUdf = udf((e: Array[Float]) => {
    var bucket = 0L
    var j = 0
    while (j < NumPlanes) {
      var p = 0L
      var i = 0
      while (i < e.length) { p += planeSign(i + 1, j) * quant(e(i)); i += 1 }
      if (p > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  })

  /** Brute-force exact top-k by integer dot product for the first 50 query
    * vectors. The query side is tiny → Spark broadcasts it; at 10^12 rows
    * the scan side streams once with no shuffle before the per-query top-k. */
  def qKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val joined = emb.join(broadcast(queries), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"), dotUdf($"qe", $"embedding").as("dot"))
    val w = Window.partitionBy($"qid").orderBy($"dot".desc, $"nid")
    joined.withColumn("rn", row_number().over(w))
      .filter($"rn" <= TopK)
      .orderBy($"qid", $"rn")
  }

  val qKnnBruteSql: String = {
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NumQueries),
       |pairs AS (
       |  SELECT q.qid, e.vec_id AS nid,
       |    (SELECT CAST(sum(
       |        CAST(floor(CAST(list_extract(q.qe, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |      * CAST(floor(CAST(list_extract(e.embedding, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT))
       |      AS BIGINT)
       |     FROM range(1, ${Dim + 1}) t(i)) AS dot
       |  FROM q, embeddings e WHERE e.vec_id != q.qid)
       |SELECT qid, nid, dot, rn FROM (
       |  SELECT qid, nid, dot,
       |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rn
       |  FROM pairs) r
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin
  }

  /** Sign-LSH bucket id per vector (8 deterministic hyperplanes). */
  def qAnnBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", bucketUdf($"embedding").as("bucket"))
      .orderBy($"vec_id")
  }

  val qAnnBucketsSql: String = {
    val projs = (0 until NumPlanes).map { j =>
      s"""sum(CASE WHEN (i * 31 + $j * 17) % 7 < 3 THEN qv ELSE -qv END) AS p$j"""
    }.mkString(",\n  ")
    val assemble = (0 until NumPlanes)
      .map(j => s"(CASE WHEN p$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT vec_id, i,
       |    CAST(floor(CAST(list_extract(embedding, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS qv
       |  FROM (SELECT vec_id, embedding, unnest(range(1, ${Dim + 1})) AS i FROM embeddings)),
       |p AS (SELECT vec_id,
       |  $projs
       |FROM c GROUP BY vec_id)
       |SELECT vec_id, CAST($assemble AS BIGINT) AS bucket FROM p ORDER BY vec_id""".stripMargin
  }

  /** ANN via bucket join: same-bucket candidate pairs ranked by exact dot —
    * the banded/bucketed shape that avoids the O(n²) cross join at scale. */
  def qAnnTopPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withBucket = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding", bucketUdf($"embedding").as("bucket"))
    val a = withBucket.select($"bucket", $"vec_id".as("id_a"), $"embedding".as("emb_a"))
    val b = withBucket.select($"bucket", $"vec_id".as("id_b"), $"embedding".as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter($"id_a" < $"id_b")
      .select($"bucket", $"id_a", $"id_b", dotUdf($"emb_a", $"emb_b").as("dot"))
      .withColumn("rn", row_number().over(Window.partitionBy($"bucket").orderBy($"dot".desc, $"id_a", $"id_b")))
      .filter($"rn" <= 3)
      .select($"bucket", $"rn", $"id_a", $"id_b", $"dot")
      .orderBy($"bucket", $"rn")
  }

  val qAnnTopPairsSql: String = {
    val projs = (0 until NumPlanes).map { j =>
      s"""sum(CASE WHEN (i * 31 + $j * 17) % 7 < 3 THEN qv ELSE -qv END) AS p$j"""
    }.mkString(", ")
    val assemble = (0 until NumPlanes)
      .map(j => s"(CASE WHEN p$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT vec_id, i,
       |    CAST(floor(CAST(list_extract(embedding, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS qv
       |  FROM (SELECT vec_id, embedding, unnest(range(1, ${Dim + 1})) AS i FROM embeddings)),
       |p AS (SELECT vec_id, $projs FROM c GROUP BY vec_id),
       |bk AS (SELECT vec_id, CAST($assemble AS BIGINT) AS bucket FROM p),
       |pairs AS (
       |  SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
       |    (SELECT CAST(sum(
       |        CAST(floor(CAST(list_extract(ea.embedding, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |      * CAST(floor(CAST(list_extract(eb.embedding, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT))
       |      AS BIGINT)
       |     FROM range(1, ${Dim + 1}) t(i)) AS dot
       |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id)
       |SELECT bucket, rn, id_a, id_b, dot FROM (
       |  SELECT bucket, id_a, id_b, dot,
       |    row_number() OVER (PARTITION BY bucket ORDER BY dot DESC, id_a, id_b) AS rn
       |  FROM pairs) r
       |WHERE rn <= 3 ORDER BY bucket, rn""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> qKnnBrute,
    "q_ann_buckets" -> qAnnBuckets,
    "q_ann_top_pairs" -> qAnnTopPairs)

  val oracleSql: Map[String, String] = Map(
    "q_knn_brute" -> qKnnBruteSql,
    "q_ann_buckets" -> qAnnBucketsSql,
    "q_ann_top_pairs" -> qAnnTopPairsSql)
}
