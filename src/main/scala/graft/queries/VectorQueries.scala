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
  // multi-band sign-LSH (q_ann_top_pairs): per-band bucket space 2^16
  val Bands = 8
  val PlanesPerBand = 16
  val MaxBucketOcc = 64
  val TopPairs = 100

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

  /** Bounded top-k aggregator: keeps at most K (dot desc, nid asc) pairs.
    * groupBy + udaf gives map-side PARTIAL aggregation — each partition
    * reduces to ≤K candidates per query before the shuffle, so the
    * exchange carries O(queries × K) rows instead of every scored pair,
    * and no WindowExec ever sorts a full per-query partition. */
  private class TopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private val ord: Ordering[(Long, Long)] =
      Ordering.by[(Long, Long), (Long, Long)] { case (dot, nid) => (-dot, nid) }
    override def zero: Seq[(Long, Long)] = Seq.empty
    override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      ((a +: b).sorted(ord)).take(k)
    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r.sorted(ord)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      bufferEncoder
  }

  /** Brute-force exact top-k by integer dot product for the first 50 query
    * vectors. The query side is tiny → Spark broadcasts it; at 10^12 rows
    * the scan side streams once with no shuffle, partial per-partition
    * top-k heaps combine map-side, and only queries×K survivors shuffle. */
  def qKnnBrute(spark: SparkSession, dir: String): DataFrame =
    qKnnBruteOf(spark, Tables.embeddings(spark, dir))

  def qKnnBruteOf(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val scored = emb.join(broadcast(queries), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"), dotUdf($"qe", $"embedding").as("dot"))
    val topk = udaf(new TopKAgg(TopK))
    scored.groupBy($"qid")
      .agg(topk($"dot", $"nid").as("top"))
      .select($"qid", posexplode($"top").as(Seq("pos", "dn")))
      .select($"qid", $"dn._2".as("nid"), $"dn._1".as("dot"),
        ($"pos" + 1).cast("int").as("rn"))
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

  /** Sign for band-plane `j` (0..Bands·PlanesPerBand-1), dimension `i`
    * (1-based): quadratic mix `(x²·48271) mod P`, x = i·31 + j·131. A
    * LINEAR mix would make planes with equal (j mod small-period)
    * identical; the square breaks that. Max intermediate ≈ 1.7e13 — exact
    * in Long and in DuckDB BIGINT. */
  @inline private def bandPlaneSign(i: Int, j: Int): Long = {
    val x = (i * 31 + j * 131).toLong
    if ((x * x * 48271L) % 1000000007L * 2 < 1000000007L) 1L else -1L
  }

  private def bandPlaneSignSql(iCol: String, jExpr: String): String =
    s"(CASE WHEN (($iCol*31 + ($jExpr)*131)*($iCol*31 + ($jExpr)*131)*48271) % 1000000007 * 2 < 1000000007 THEN 1 ELSE -1 END)"

  /** Per-band 16-bit sign-LSH buckets over a QUANTIZED vector: Bands
    * hashes of PlanesPerBand hyperplanes each (AND within a band, OR
    * across bands). */
  private val bandBucketsUdf = udf((q: Array[Long]) => {
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var bucket = 0L
      var p = 0
      while (p < PlanesPerBand) {
        val j = b * PlanesPerBand + p
        var pr = 0L
        var i = 0
        while (i < q.length) { pr += bandPlaneSign(i + 1, j) * q(i); i += 1 }
        if (pr > 0) bucket |= 1L << p
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    out
  })

  private val quantVecUdf = udf((e: Array[Float]) => e.map(quant))

  private val dotQUdf = udf((a: Array[Long], b: Array[Long]) => {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  })

  /** The ANN-dedup corpus: base embeddings (1e4-quantized Long components)
    * plus a planted near-duplicate for every 5th vector — component-wise
    * deterministic noise `(((vec_id + i·31) mod 7) − 3)·100` (i 1-based),
    * ≈ cosine 0.987 to its source. This is the embedding analogue of
    * TextQueries.dedupCorpus: the planted pairs are the ground truth the
    * banded LSH must recall (AnnSpec). Quantized space keeps every dot
    * and every hyperplane sign exactly replicable in DuckDB SQL. */
  def annCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perturbUdf = udf((id: Long, q: Array[Long]) => {
      val out = new Array[Long](q.length)
      var i = 0
      while (i < q.length) {
        out(i) = q(i) + (((id + (i + 1) * 31) % 7) - 3) * 100
        i += 1
      }
      out
    })
    val base = Tables.embeddings(spark, dir)
      .select($"vec_id", quantVecUdf($"embedding").as("qvec"))
    base.unionAll(
      base.filter($"vec_id" % 5 === 0)
        .select(($"vec_id" + 1000000).as("vec_id"),
          perturbUdf($"vec_id", $"qvec").as("qvec")))
  }

  /** Unnested (vec_id, i, qv) corpus in SQL — mirrors annCorpus exactly. */
  private val annCorpusSql: String =
    s"""base AS (
       |  SELECT vec_id, i,
       |    CAST(floor(CAST(list_extract(embedding, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS qv
       |  FROM (SELECT vec_id, embedding, unnest(range(1, ${Dim + 1})) AS i FROM embeddings)),
       |corpus AS (
       |  SELECT vec_id, i, qv FROM base
       |  UNION ALL
       |  SELECT vec_id + 1000000, i, qv + (((vec_id + i * 31) % 7) - 3) * 100
       |  FROM base WHERE vec_id % 5 = 0)""".stripMargin

  /** ANN near-dup top pairs via multi-band sign-LSH over annCorpus (the
    * 10^12-vector shape):
    *
    *  - Bands=8 independent 16-plane hashes → 2^16 buckets PER BAND
    *    (2^19 (band,bucket) keys total), so bucket count scales far
    *    beyond the executor count and the within-bucket self-join is
    *    O(Σ occ²) over near-empty buckets;
    *  - OR-amplification across bands: a cosine≈0.99 near-dup agrees with
    *    its source on a 16-plane band w.p. ≈0.95^16≈0.48, so ≥1-of-8
    *    bands collide w.p. ≈0.995 (AnnSpec measures it on the planted
    *    pairs — and documents that ~60°-apart "nearest" neighbors of the
    *    uniform base corpus are NOT recallable by any sign-LSH with a
    *    non-trivial bucket space; that regime belongs to q_knn_brute);
    *  - hot buckets are CAPPED at MaxBucketOcc vectors (deterministic
    *    lowest-vec_id truncation; q_ann_bucket_stats accounts for drops)
    *    so one degenerate bucket can never produce an O(n²) task;
    *  - candidates dedup on ids only, vectors join back by id — no
    *    vector rides the band-join shuffle;
    *  - final ranking is TakeOrderedAndProject (bounded), not a window.
    */
  def qAnnTopPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = annCorpus(spark, dir).cache()
    annCandidatePairs(corpus)
      .join(corpus.select($"vec_id".as("id_a"), $"qvec".as("q_a")), "id_a")
      .join(corpus.select($"vec_id".as("id_b"), $"qvec".as("q_b")), "id_b")
      .select($"id_a", $"id_b", dotQUdf($"q_a", $"q_b").as("dot"))
      .orderBy($"dot".desc, $"id_a", $"id_b")
      .limit(TopPairs)
  }

  /** The deduped (id_a < id_b) candidate set of the banded LSH — exposed
    * so AnnSpec can measure planted-pair recall pre-cap/pre-rank. */
  def annCandidatePairs(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val banded = corpus
      .select($"vec_id", posexplode(bandBucketsUdf($"qvec")).as(Seq("band", "bucket")))
    val capped = banded
      .withColumn("rn", row_number().over(
        Window.partitionBy($"band", $"bucket").orderBy($"vec_id")))
      .filter($"rn" <= MaxBucketOcc)
      .select($"band", $"bucket", $"vec_id")
    capped.select($"band", $"bucket", $"vec_id".as("id_a"))
      .join(capped.select($"band", $"bucket", $"vec_id".as("id_b")), Seq("band", "bucket"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct()
  }

  private val bandedBucketsSql: String =
    s"""$annCorpusSql,
       |pl AS (
       |  SELECT CAST(b.band AS BIGINT) AS band, CAST(p.p AS BIGINT) AS p,
       |         CAST(b.band * $PlanesPerBand + p.p AS BIGINT) AS j
       |  FROM (SELECT unnest(range(0, $Bands)) AS band) b
       |  CROSS JOIN (SELECT unnest(range(0, $PlanesPerBand)) AS p) p),
       |proj AS (
       |  SELECT c.vec_id, pl.band, pl.p,
       |    sum(${bandPlaneSignSql("c.i", "pl.j")} * c.qv) AS pr
       |  FROM corpus c CROSS JOIN pl GROUP BY c.vec_id, pl.band, pl.p),
       |bk AS (
       |  SELECT vec_id, band,
       |    CAST(sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id, band)""".stripMargin

  val qAnnTopPairsSql: String =
    s"""WITH $bandedBucketsSql,
       |capped AS (
       |  SELECT band, bucket, vec_id FROM (
       |    SELECT band, bucket, vec_id,
       |      row_number() OVER (PARTITION BY band, bucket ORDER BY vec_id) AS rn
       |    FROM bk) t WHERE rn <= $MaxBucketOcc),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT p.id_a, p.id_b, CAST(sum(ca.qv * cb.qv) AS BIGINT) AS dot
       |  FROM pairs p
       |  JOIN corpus ca ON ca.vec_id = p.id_a
       |  JOIN corpus cb ON cb.vec_id = p.id_b AND cb.i = ca.i
       |  GROUP BY p.id_a, p.id_b)
       |SELECT id_a, id_b, dot FROM scored
       |ORDER BY dot DESC, id_a, id_b LIMIT $TopPairs""".stripMargin

  /** Bucket-occupancy accounting for the banded LSH: per band, how many
    * buckets are in use, the hottest occupancy, and how many vectors the
    * MaxBucketOcc cap would drop — the `log`-style visibility that keeps
    * the truncation honest at scale. */
  def qAnnBucketStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    annCorpus(spark, dir)
      .select($"vec_id", posexplode(bandBucketsUdf($"qvec")).as(Seq("band", "bucket")))
      .groupBy($"band", $"bucket").agg(count(lit(1)).as("occ"))
      .groupBy($"band").agg(
        count(lit(1)).as("n_buckets"),
        max($"occ").as("max_occ"),
        sum(greatest($"occ" - MaxBucketOcc, lit(0L))).as("n_dropped"))
      .orderBy($"band")
  }

  val qAnnBucketStatsSql: String =
    s"""WITH $bandedBucketsSql,
       |occ AS (SELECT band, bucket, count(*) AS occ FROM bk GROUP BY band, bucket)
       |SELECT band, count(*) AS n_buckets,
       |  CAST(max(occ) AS BIGINT) AS max_occ,
       |  CAST(sum(greatest(occ - $MaxBucketOcc, 0)) AS BIGINT) AS n_dropped
       |FROM occ GROUP BY band ORDER BY band""".stripMargin

  /** Integer cosine-threshold test at 1e2 scale: true iff
    * cos(a,b) ≥ 0.97 with every intermediate exact in a 64-bit Long (the
    * 1e4-quantized components are floor-divided to 1e2 so dot² × 10⁴ and
    * 9409·‖a‖²·‖b‖² both stay ≤ ~4e15). floorDiv matches SQL
    * floor(x/100.0) on negatives. */
  private val cos97Udf = udf((a: Array[Long], b: Array[Long]) => {
    var d = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = Math.floorDiv(a(i), 100L)
      val y = Math.floorDiv(b(i), 100L)
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    d > 0 && d * d * 10000L >= 9409L * na * nb
  })

  /** SEMANTIC dedup decision (SemDeDup-shape): connected components over
    * the ANN near-dup graph — banded sign-LSH candidates, exact integer
    * cosine ≥ 0.97 verification, hash-min labels, keep-one-per-cluster.
    * The embedding analogue of q_dedup_components: candidates come from
    * the capped bucket join (never all-pairs), edges carry ids only, and
    * the CC loop is the shared ConnectedComponents engine (one join per
    * round, refuses if unconverged). */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = annCorpus(spark, dir).cache()
    val edges = annCandidatePairs(corpus)
      .join(corpus.select($"vec_id".as("id_a"), $"qvec".as("q_a")), "id_a")
      .join(corpus.select($"vec_id".as("id_b"), $"qvec".as("q_b")), "id_b")
      .filter(cos97Udf($"q_a", $"q_b"))
      .select($"id_a".as("src"), $"id_b".as("dst"))
    // two-phase opt-in (see TextQueries.dedupComponentsImpl): the exact-
    // cosine-verified edge set is tiny relative to the corpus, so the
    // bounded local finish applies when it fits. Nodes come from a fresh
    // id-only plan (not the cached corpus handle): corpus is unpersisted
    // before the returned plan executes, and column pruning strips the
    // quantization UDFs from an id-only scan.
    val labels = ConnectedComponents.labels(
      annCorpus(spark, dir).select($"vec_id".as("id")), edges,
      localFinish = ConnectedComponents.DefaultLocalFinish)
    corpus.unpersist(false)
    labels
      .withColumn("kept", ($"id" === $"comp").cast("int"))
      .select($"id".as("vec_id"), $"comp".as("component"), $"kept")
      .orderBy($"vec_id")
  }

  val qDedupEmbeddingSql: String =
    s"""WITH RECURSIVE $bandedBucketsSql,
       |capped AS (
       |  SELECT band, bucket, vec_id FROM (
       |    SELECT band, bucket, vec_id,
       |      row_number() OVER (PARTITION BY band, bucket ORDER BY vec_id) AS rn
       |    FROM bk) t WHERE rn <= $MaxBucketOcc),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |q100 AS (SELECT vec_id, i, CAST(floor(qv / 100.0) AS BIGINT) AS q FROM corpus),
       |nrm AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n FROM q100 GROUP BY vec_id),
       |pdot AS (
       |  SELECT p.id_a, p.id_b, CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
       |  FROM pairs p
       |  JOIN q100 qa ON qa.vec_id = p.id_a
       |  JOIN q100 qb ON qb.vec_id = p.id_b AND qb.i = qa.i
       |  GROUP BY p.id_a, p.id_b),
       |edges AS (
       |  SELECT d.id_a, d.id_b FROM pdot d
       |  JOIN nrm na ON na.vec_id = d.id_a
       |  JOIN nrm nb ON nb.vec_id = d.id_b
       |  WHERE d.dot > 0 AND d.dot * d.dot * 10000 >= 9409 * na.n * nb.n),
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM edges
       |  UNION ALL SELECT id_b, id_a FROM edges),
       |reach(id, r) AS (
       |  SELECT DISTINCT vec_id, vec_id FROM corpus
       |  UNION
       |  SELECT reach.id, e.dst FROM reach JOIN sym e ON reach.r = e.src)
       |SELECT id AS vec_id, CAST(min(r) AS BIGINT) AS component,
       |  CASE WHEN id = min(r) THEN 1 ELSE 0 END AS kept
       |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin

  val NumCells = 16 // IVF coarse-quantizer size for the oracle queries

  /** sqrt(n)-ish IVF cell count (standard IVF sizing: ~sqrt(n) cells keeps
    * both the quantizer scan and the probed lists at ~sqrt(n); at 10^12
    * vectors that is ~10^6 cells — far beyond executor count, and each
    * inverted list is a bucket-prunable partition). */
  def suggestedCells(n: Long): Int =
    math.max(16, math.round(math.sqrt(n.toDouble)).toInt)

  /** IVF-style ANN (the other scale path beside sign-LSH): a deterministic
    * coarse quantizer — centroids are the first `numCells` vectors (a
    * k-means seeding, SQL-replicable without float k-means) — assigns
    * every vector to its max-dot cell (ties → lowest centroid id); a
    * query probes its `nprobe` closest cells, ranked by exact dot via the
    * bounded top-k aggregate. At 10^12 vectors the cells are the partition
    * keys: a query reads ~nprobe/numCells of the data, the inverted lists
    * are bucket-pruned scans, and recall is tuned by nprobe — AnnSpec
    * measures the recall/nprobe curve vs q_knn_brute, including the
    * nprobe == numCells ≡ brute-force anchor. */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame =
    qAnnIvfWith(spark, dir, NumCells, 1)

  def qAnnIvfProbe2(spark: SparkSession, dir: String): DataFrame =
    qAnnIvfWith(spark, dir, NumCells, 2)

  def qAnnIvfWith(spark: SparkSession, dir: String,
      numCells: Int, nprobe: Int): DataFrame =
    qAnnIvfOf(spark, Tables.embeddings(spark, dir), numCells, nprobe)

  def qAnnIvfOf(spark: SparkSession, emb: DataFrame,
      numCells: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    // coarse quantizer: numCells quantized centroid vectors, collected once
    // on the driver (bounded: numCells rows) and broadcast — member
    // assignment is a single shuffle-free map (argmax of numCells exact
    // integer dots; ties → lowest centroid id), never a row explosion
    // through an exchange
    val centsLocal: Array[(Int, Array[Long])] = emb.filter($"vec_id" < numCells)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0).toInt,
        r.getSeq[Float](1).toArray.map(quant)))
      .sortBy(_._1)
    // BROADCAST the quantizer, never closure-capture it: a closed-over
    // array serializes into EVERY task closure — harmless at 16 cells,
    // ~0.5 GB/task at the documented suggestedCells(10^12) ≈ 10^6. A
    // broadcast ships once per executor over the torrent protocol. At
    // numCells ≥ 10^4 the per-row O(numCells·dim) argmax also needs a
    // coarse-to-fine (two-level) quantizer: argmax over ~sqrt(numCells)
    // super-cells first, then only that super-cell's children — the
    // standard IMI/HNSW-coarse refinement; not needed at oracle scale.
    val cents = spark.sparkContext.broadcast(centsLocal)
    val assignUdf = udf((e: Array[Float]) => {
      val cs = cents.value
      var bestCid = -1
      var bestDot = Long.MinValue
      var c = 0
      while (c < cs.length) {
        val (cid, cq) = cs(c)
        var d = 0L
        var i = 0
        while (i < e.length) { d += cq(i) * quant(e(i)); i += 1 }
        // cents is cid-ascending and only a STRICT improvement replaces,
        // so equal dots keep the lowest centroid id (the oracle's min(cid))
        if (d > bestDot) { bestDot = d; bestCid = cid }
        c += 1
      }
      bestCid
    })
    // query side: the nprobe closest cells by (dot desc, cid asc) — the
    // top-1 probe is exactly the member assignment, so nprobe=1 reproduces
    // the classic search-own-cell IVF
    val probeUdf = udf((e: Array[Float]) => {
      val q = e.map(quant)
      cents.value.map { case (cid, cq) =>
        var d = 0L
        var i = 0
        while (i < q.length) { d += cq(i) * q(i); i += 1 }
        (d, cid)
      }.sortBy { case (d, cid) => (-d, cid) }.take(nprobe).map(_._2)
    })
    val member = emb
      .select(assignUdf($"embedding").as("cell"), $"vec_id".as("nid"),
        $"embedding".as("ne"))
    val queries = emb.filter($"vec_id" < NumQueries)
      .select(explode(probeUdf($"embedding")).as("cell"),
        $"vec_id".as("qid"), $"embedding".as("qe"))
    val topk = udaf(new TopKAgg(TopK))
    // each nid lives in exactly one cell and a query's probed cells are
    // distinct, so (qid, nid) appears at most once — no dedup needed
    member.join(broadcast(queries), Seq("cell"))
      .filter($"nid" =!= $"qid")
      .select($"qid", $"nid", dotUdf($"qe", $"ne").as("dot"))
      .groupBy($"qid")
      .agg(topk($"dot", $"nid").as("top"))
      .select($"qid", posexplode($"top").as(Seq("pos", "dn")))
      .select($"qid", $"dn._2".as("nid"), $"dn._1".as("dot"),
        ($"pos" + 1).cast("int").as("rn"))
      .orderBy($"qid", $"rn")
  }

  private def qdotSql(a: String, b: String) =
    s"""(SELECT CAST(sum(
       |    CAST(floor(CAST(list_extract($a, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT)
       |  * CAST(floor(CAST(list_extract($b, CAST(i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT))
       |  AS BIGINT)
       | FROM range(1, ${Dim + 1}) t(i))""".stripMargin

  /** Shared IVF CTEs: quantizer dots, member cell assignment. */
  private val ivfCtesSql: String =
    s"""cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < $NumCells),
       |cdots AS (
       |  SELECT e.vec_id, c.cid, ${qdotSql("c.ce", "e.embedding")} AS cdot
       |  FROM embeddings e CROSS JOIN cents c),
       |best AS (SELECT vec_id, max(cdot) AS mx FROM cdots GROUP BY vec_id),
       |cells AS (
       |  SELECT d.vec_id, min(d.cid) AS cell
       |  FROM cdots d JOIN best b ON b.vec_id = d.vec_id AND d.cdot = b.mx
       |  GROUP BY d.vec_id),
       |member AS (
       |  SELECT cells.cell, e.vec_id AS nid, e.embedding AS ne
       |  FROM embeddings e JOIN cells ON cells.vec_id = e.vec_id)""".stripMargin

  val qAnnIvfSql: String =
    s"""WITH $ivfCtesSql,
       |qs AS (SELECT cell, nid AS qid, ne AS qe FROM member WHERE nid < $NumQueries),
       |scored AS (
       |  SELECT q.qid, m.nid, ${qdotSql("q.qe", "m.ne")} AS dot
       |  FROM qs q JOIN member m ON m.cell = q.cell AND m.nid != q.qid)
       |SELECT qid, nid, dot, rn FROM (
       |  SELECT qid, nid, dot,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rn
       |  FROM scored) r
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin

  /** nprobe=2: a query searches its two closest cells (dot desc, cid asc). */
  val qAnnIvfProbe2Sql: String =
    s"""WITH $ivfCtesSql,
       |qprobe AS (
       |  SELECT vec_id AS qid, cid AS cell FROM (
       |    SELECT d.vec_id, d.cid,
       |      row_number() OVER (PARTITION BY d.vec_id ORDER BY d.cdot DESC, d.cid) AS pr
       |    FROM cdots d WHERE d.vec_id < $NumQueries) t
       |  WHERE pr <= 2),
       |qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.qid, m.nid, ${qdotSql("qv.qe", "m.ne")} AS dot
       |  FROM qprobe q JOIN qv ON qv.qid = q.qid
       |  JOIN member m ON m.cell = q.cell AND m.nid != q.qid)
       |SELECT qid, nid, dot, rn FROM (
       |  SELECT qid, nid, dot,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rn
       |  FROM scored) r
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin

  /** Lloyd iterations for the TRAINED quantizer (fixed — both engines run
    * exactly this many). */
  val LloydIters = 2

  /** Elementwise Array[Long] sum with map-side partial aggregation: the
    * centroid-update step reduces each partition to ≤ numCells vectors
    * before the shuffle, so the exchange carries O(cells × dim) longs —
    * never a row explosion through posexplode. */
  private class VecSumAgg(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](dim)
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      var i = 0; while (i < dim) { b(i) += a(i); i += 1 }; b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      bufferEncoder
  }

  /** TRAINED IVF quantizer (round-4 verdict, Next #4): the first-N seeds
    * refined by [[LloydIters]] DETERMINISTIC integer Lloyd iterations —
    * assignment by exact squared-L2 over 1e4-quantized components (ties →
    * lowest cid), centroid update by per-dimension floor(sum/count) on
    * Long-exact sums (the division is IEEE-double over < 2^53 integers,
    * bit-identical in Spark and DuckDB), empty cells keep their previous
    * centroid. Every step is integer-deterministic, so the oracle
    * replicates the full training trajectory bit-for-bit.
    *
    * Scale shape per iteration: ONE shuffle-free assignment map (broadcast
    * centroids) + ONE grouped aggregation whose map-side partials bound
    * the exchange at O(cells × dim) longs per partition; the driver only
    * ever holds numCells centroid rows. Search is nprobe=1 over the
    * trained cells, ranked by exact quantized dot like every IVF query
    * here (FAISS trains its IP-metric coarse quantizers with L2 k-means
    * the same way). AnnSpec measures the recall lift over first-N seeding
    * at equal nprobe. */
  def qAnnIvfTrained(spark: SparkSession, dir: String): DataFrame =
    qAnnIvfTrainedWith(spark, dir, NumCells, LloydIters)

  private def argminL2(cents: Array[(Int, Array[Long])], q: Array[Long]): Int = {
    var best = -1; var bd = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cq = cents(c)._2
      var d = 0L; var i = 0
      while (i < q.length) { val t = q(i) - cq(i); d += t * t; i += 1 }
      // cid-ascending scan + strict improvement ⇒ ties keep lowest cid
      if (d < bd) { bd = d; best = cents(c)._1 }
      c += 1
    }
    best
  }

  /** The Lloyd trajectory itself (seed → `iters` deterministic updates);
    * one bounded (≤ numCells rows) collect per iteration plus the seed. */
  private def lloydCentroids(spark: SparkSession, dir: String,
      numCells: Int, iters: Int): Array[(Int, Array[Long])] =
    lloydCentroidsOf(spark, Tables.embeddings(spark, dir), numCells, iters)

  private def lloydCentroidsOf(spark: SparkSession, emb: DataFrame,
      numCells: Int, iters: Int): Array[(Int, Array[Long])] = {
    import spark.implicits._
    // seed: first numCells vectors, quantized (bounded collect)
    var cents: Array[(Int, Array[Long])] = emb.filter($"vec_id" < numCells)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray.map(quant)))
      .sortBy(_._1)
    val vecSum = udaf(new VecSumAgg(Dim))
    val quantVec = udf((e: Array[Float]) => e.map(quant))
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val assignT = udf((q: Array[Long]) => argminL2(bc.value, q))
      // ≤ numCells result rows — bounded collect, one per iteration
      val sums = emb.select(quantVec($"embedding").as("q"))
        .select(assignT($"q").as("cell"), $"q")
        .groupBy($"cell").agg(vecSum($"q").as("s"), count(lit(1)).as("n"))
        .collect()
      val updated = sums.map { r =>
        val n = r.getLong(2)
        r.getInt(0) -> r.getSeq[Long](1).toArray
          .map(x => math.floor(x.toDouble / n).toLong)
      }.toMap
      cents = cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
      bc.unpersist(false)
    }
    cents
  }

  /** Member counts per cell for the trained vs seeded quantizer (bounded
    * ≤ numCells rows) — the balance evidence behind the Lloyd claim:
    * nprobe=1 expected scan fraction is Σcell²/n², so skewed lists cost
    * scan time recall numbers alone don't show. */
  def cellSizes(spark: SparkSession, dir: String, trainedQ: Boolean): Seq[Long] = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val cell =
      if (trainedQ) {
        val bc = spark.sparkContext.broadcast(
          lloydCentroids(spark, dir, NumCells, LloydIters))
        udf((e: Array[Float]) => argminL2(bc.value, e.map(quant)))
      } else {
        val bc = spark.sparkContext.broadcast(
          lloydCentroids(spark, dir, NumCells, 0)) // iters=0 ⇒ raw seeds
        // seeded assignment is DOT-argmax (qAnnIvfWith's rule)
        udf((e: Array[Float]) => {
          val q = e.map(quant)
          var best = -1; var bd = Long.MinValue
          val cs = bc.value
          var c = 0
          while (c < cs.length) {
            val cq = cs(c)._2
            var d = 0L; var i = 0
            while (i < q.length) { d += cq(i) * q(i); i += 1 }
            if (d > bd) { bd = d; best = cs(c)._1 }
            c += 1
          }
          best
        })
      }
    emb.select(cell($"embedding").as("cell")).groupBy($"cell")
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).toSeq
  }

  /** Total squared-L2 quantization cost of assigning every vector to its
    * nearest centroid after `iters` Lloyd iterations — the objective Lloyd
    * provably never increases. Single-row aggregate; the spec asserts the
    * decrease (training works even where uniform data gives recall no
    * room to move). */
  def quantizationCost(spark: SparkSession, dir: String, iters: Int): Long =
    quantizationCostOf(spark, Tables.embeddings(spark, dir), iters)

  def quantizationCostOf(spark: SparkSession, emb: DataFrame, iters: Int): Long = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      lloydCentroidsOf(spark, emb, NumCells, iters))
    val costU = udf((e: Array[Float]) => {
      val q = e.map(quant)
      val cs = bc.value
      var best = Long.MaxValue
      var c = 0
      while (c < cs.length) {
        val cq = cs(c)._2
        var d = 0L; var i = 0
        while (i < q.length) { val t = q(i) - cq(i); d += t * t; i += 1 }
        if (d < best) best = d
        c += 1
      }
      best
    })
    emb.agg(sum(costU($"embedding"))).head().getLong(0)
  }

  /** Deterministic CLUSTERED embedding corpus — the recall testbed the
    * uniform `embeddings` table cannot be (on uniform data every quantizer
    * scores the same; BENCH.md round-4/5). `n` vectors in `numClusters`
    * Gaussian-ish blobs: cluster ids are a splitmix hash of vec_id (random
    * arrival order — so the first-N IVF seeds cover only a coupon-collector
    * subset of clusters, the realistic failure mode Lloyd training exists
    * to fix), centers are hash-derived in [-1,1]^Dim, members add ±0.5
    * component noise — broad enough that a cluster with no nearby centroid
    * scatters its members across cells (tight blobs assign consistently to
    * SOME cell whatever the seeds, which is all nprobe=1 recall needs, and
    * would hide bad seeding). Everything is a pure function of vec_id, so any
    * engine, partitioning, or rerun builds the identical corpus — same
    * discipline as TextQueries.dedupCorpus. */
  def clusteredCorpus(spark: SparkSession, n: Int, numClusters: Int): DataFrame = {
    import spark.implicits._
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val k = numClusters
    val embUdf = udf((vecId: Long) => {
      val c = java.lang.Long.remainderUnsigned(mix(vecId), k.toLong).toInt
      Array.tabulate(Dim) { i =>
        val center = (java.lang.Long.remainderUnsigned(
          mix(c.toLong * 1000003L + i), 2001L) - 1000L) / 1000.0f
        val noise = (java.lang.Long.remainderUnsigned(
          mix(vecId * 7919L + i * 31L), 201L) - 100L) / 200.0f
        center + noise
      }
    })
    spark.range(n.toLong).select($"id".as("vec_id"), embUdf($"id").as("embedding"))
  }

  def qAnnIvfTrainedWith(spark: SparkSession, dir: String,
      numCells: Int, iters: Int): DataFrame =
    qAnnIvfTrainedOf(spark, Tables.embeddings(spark, dir), numCells, iters)

  def qAnnIvfTrainedOf(spark: SparkSession, emb: DataFrame,
      numCells: Int, iters: Int): DataFrame = {
    import spark.implicits._
    val cents = lloydCentroidsOf(spark, emb, numCells, iters)
    val bcF = spark.sparkContext.broadcast(cents)
    val assignF = udf((e: Array[Float]) => argminL2(bcF.value, e.map(quant)))
    val member = emb
      .select(assignF($"embedding").as("cell"), $"vec_id".as("nid"),
        $"embedding".as("ne"))
    val qs = member.filter($"nid" < NumQueries)
      .select($"cell", $"nid".as("qid"), $"ne".as("qe"))
    val topk = udaf(new TopKAgg(TopK))
    member.join(broadcast(qs), Seq("cell"))
      .filter($"nid" =!= $"qid")
      .select($"qid", $"nid", dotUdf($"qe", $"ne").as("dot"))
      .groupBy($"qid")
      .agg(topk($"dot", $"nid").as("top"))
      .select($"qid", posexplode($"top").as(Seq("pos", "dn")))
      .select($"qid", $"dn._2".as("nid"), $"dn._1".as("dot"),
        ($"pos" + 1).cast("int").as("rn"))
      .orderBy($"qid", $"rn")
  }

  /** DuckDB replication of the full Lloyd trajectory: c0 = seeds; per
    * iteration, L2 assignment (min dist, ties min cid) then per-(cell,dim)
    * floor-mean centroids, empty cells carried forward; final assignment
    * from c{iters}; search = own cell, dot-ranked top-k. */
  val qAnnIvfTrainedSql: String = {
    val T = LloydIters
    val iterCtes = (0 until T).map { t =>
      s"""d$t AS (
         |  SELECT v.vec_id, c.cid, CAST(sum((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS dist
         |  FROM qv v JOIN c$t c ON c.i = v.i
         |  GROUP BY v.vec_id, c.cid),
         |b$t AS (SELECT vec_id, min(dist) AS md FROM d$t GROUP BY vec_id),
         |a$t AS (
         |  SELECT d.vec_id, min(d.cid) AS cell
         |  FROM d$t d JOIN b$t b ON b.vec_id = d.vec_id AND d.dist = b.md
         |  GROUP BY d.vec_id),
         |m${t + 1} AS (
         |  SELECT a.cell AS cid, v.i, CAST(floor(1.0 * sum(v.q) / count(*)) AS BIGINT) AS q
         |  FROM qv v JOIN a$t a ON a.vec_id = v.vec_id
         |  GROUP BY a.cell, v.i),
         |c${t + 1} AS (
         |  SELECT cid, i, q FROM m${t + 1}
         |  UNION ALL
         |  SELECT c.cid, c.i, c.q FROM c$t c
         |  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM m${t + 1}))""".stripMargin
    }.mkString(",\n")
    s"""WITH qv AS (
       |  SELECT e.vec_id, t.i,
       |    CAST(floor(CAST(list_extract(e.embedding, CAST(t.i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS q
       |  FROM embeddings e CROSS JOIN range(1, ${Dim + 1}) t(i)),
       |c0 AS (SELECT vec_id AS cid, i, q FROM qv WHERE vec_id < $NumCells),
       |$iterCtes,
       |dF AS (
       |  SELECT v.vec_id, c.cid, CAST(sum((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS dist
       |  FROM qv v JOIN c$T c ON c.i = v.i
       |  GROUP BY v.vec_id, c.cid),
       |bF AS (SELECT vec_id, min(dist) AS md FROM dF GROUP BY vec_id),
       |cells AS (
       |  SELECT d.vec_id, min(d.cid) AS cell
       |  FROM dF d JOIN bF b ON b.vec_id = d.vec_id AND d.dist = b.md
       |  GROUP BY d.vec_id),
       |member AS (
       |  SELECT cells.cell, e.vec_id AS nid, e.embedding AS ne
       |  FROM embeddings e JOIN cells ON cells.vec_id = e.vec_id),
       |qs AS (SELECT cell, nid AS qid, ne AS qe FROM member WHERE nid < $NumQueries),
       |scored AS (
       |  SELECT q.qid, m.nid, ${qdotSql("q.qe", "m.ne")} AS dot
       |  FROM qs q JOIN member m ON m.cell = q.cell AND m.nid != q.qid)
       |SELECT qid, nid, dot, rn FROM (
       |  SELECT qid, nid, dot,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rn
       |  FROM scored) r
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin
  }

  val NumSupers = 4 // level-1 (super-cell) quantizer size for the 2-level oracle

  /** TWO-LEVEL (coarse-to-fine, IMI-style) IVF — the refinement the flat
    * quantizer's docstring promises for numCells ≥ 10^4: a vector first
    * picks its nearest of [[NumSupers]] super-centroids, then argmaxes
    * only over that super-cell's CHILD centroids (cells whose own nearest
    * super is the same), so the per-row assignment cost drops from
    * O(numCells·dim) to O((numSupers + children)·dim) ≈ O(√numCells·dim)
    * when both levels are √-sized. Every tie resolves to the lowest id
    * and all dots are exact quantized-integer products, so the DuckDB
    * oracle reproduces the hierarchy bit-for-bit; search is nprobe=1
    * (own cell), the classic IVF read path. A super-cell with no children
    * yields no member rows — identically in both engines. */
  def qAnnIvf2Level(spark: SparkSession, dir: String): DataFrame =
    qAnnIvf2LevelOf(spark, Tables.embeddings(spark, dir))

  def qAnnIvf2LevelOf(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    def collectQuant(n: Int): Array[(Int, Array[Long])] = emb
      .filter($"vec_id" < n).select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray.map(quant)))
      .sortBy(_._1)
    val supersLocal = collectQuant(NumSupers)
    val centsLocal = collectQuant(NumCells)
    def qdotQ(a: Array[Long], b: Array[Long]): Long = {
      var d = 0L; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }
      d
    }
    // id-ascending scan with strict improvement ⇒ ties keep the lowest id,
    // matching the oracle's min() over the max-dot rows
    def argmaxLowest(cands: Array[(Int, Array[Long])], q: Array[Long]): Int = {
      var best = -1; var bd = Long.MinValue
      var i = 0
      while (i < cands.length) {
        val d = qdotQ(cands(i)._2, q)
        if (d > bd) { bd = d; best = cands(i)._1 }
        i += 1
      }
      best
    }
    // the cell hierarchy is computed ONCE on the driver (numCells rows)
    // and broadcast as super → sorted children, never closure-captured
    val children: Map[Int, Array[(Int, Array[Long])]] = centsLocal
      .groupBy { case (_, cq) => argmaxLowest(supersLocal, cq) }
      .view.mapValues(_.sortBy(_._1)).toMap
    val supersBc = spark.sparkContext.broadcast(supersLocal)
    val childrenBc = spark.sparkContext.broadcast(children)
    val assign2 = udf((e: Array[Float]) => {
      val q = e.map(quant)
      val supers = supersBc.value
      var sid = -1; var sd = Long.MinValue
      var i = 0
      while (i < supers.length) {
        var d = 0L; var j = 0
        val sq = supers(i)._2
        while (j < q.length) { d += sq(j) * q(j); j += 1 }
        if (d > sd) { sd = d; sid = supers(i)._1 }
        i += 1
      }
      childrenBc.value.get(sid) match {
        case None => -1
        case Some(cs) =>
          var cid = -1; var cd = Long.MinValue
          var c = 0
          while (c < cs.length) {
            var d = 0L; var j = 0
            val cq = cs(c)._2
            while (j < q.length) { d += cq(j) * q(j); j += 1 }
            if (d > cd) { cd = d; cid = cs(c)._1 }
            c += 1
          }
          cid
      }
    })
    val member = emb
      .select(assign2($"embedding").as("cell"), $"vec_id".as("nid"),
        $"embedding".as("ne"))
      .filter($"cell" >= 0)
    val qs = member.filter($"nid" < NumQueries)
      .select($"cell", $"nid".as("qid"), $"ne".as("qe"))
    val topk = udaf(new TopKAgg(TopK))
    member.join(broadcast(qs), Seq("cell"))
      .filter($"nid" =!= $"qid")
      .select($"qid", $"nid", dotUdf($"qe", $"ne").as("dot"))
      .groupBy($"qid")
      .agg(topk($"dot", $"nid").as("top"))
      .select($"qid", posexplode($"top").as(Seq("pos", "dn")))
      .select($"qid", $"dn._2".as("nid"), $"dn._1".as("dot"),
        ($"pos" + 1).cast("int").as("rn"))
      .orderBy($"qid", $"rn")
  }

  /** Driver-local deterministic integer Lloyd over ≤numCells centroid
    * vectors (the super-level training set is the CHILD CENTROIDS, never
    * the corpus — so this is bounded work whatever the corpus size; at the
    * documented 10^6-cell scale the same refinement runs as
    * [[lloydCentroidsOf]] on a centroids table instead). Identical rules
    * to the distributed trainer: L2 assignment with ties→lowest id,
    * floor-mean updates, empty cells carried forward. */
  private def lloydLocal(points: Array[(Int, Array[Long])],
      k: Int, iters: Int): Array[(Int, Array[Long])] = {
    val dim = points.head._2.length
    var cents: Array[(Int, Array[Long])] =
      points.take(k).zipWithIndex.map { case ((_, p), i) => (i, p.clone()) }
    for (_ <- 1 to iters) {
      val sums = scala.collection.mutable.LinkedHashMap.empty[Int, (Array[Long], Long)]
      points.foreach { case (_, p) =>
        val c = argminL2(cents, p)
        val (s, n) = sums.getOrElseUpdate(c, (new Array[Long](dim), 0L))
        var i = 0; while (i < dim) { s(i) += p(i); i += 1 }
        sums(c) = (s, n + 1)
      }
      cents = cents.map { case (cid, old) =>
        sums.get(cid) match {
          case Some((s, n)) => (cid, s.map(x => math.floor(x.toDouble / n).toLong))
          case None => (cid, old)
        }
      }
    }
    cents
  }

  /** TRAINED two-level IVF: Lloyd-refined child centroids
    * ([[lloydCentroidsOf]], the committed oracle-exact trainer) plus
    * super-centroids obtained by Lloyd over the CHILD CENTROIDS themselves
    * ([[lloydLocal]] — the classic IMI recipe: each quantizer level is
    * k-means-trained on the level below). Assignment is L2 at both levels
    * (matching the trained flat quantizer), ties→lowest id throughout, so
    * the whole hierarchy is integer-deterministic. Search is nprobe=1 over
    * the hierarchy-assigned cell. AnnSpec measures the recall against the
    * seeded hierarchy on the clustered corpus. */
  def qAnnIvf2LevelTrainedOf(spark: SparkSession, emb: DataFrame,
      numSupers: Int, numCells: Int, iters: Int): DataFrame = {
    import spark.implicits._
    val centsLocal = lloydCentroidsOf(spark, emb, numCells, iters)
    val supersLocal = lloydLocal(centsLocal, numSupers, iters)
    // hierarchy: child → nearest super by L2 (ties lowest sid), computed
    // once on the driver (numCells rows) and broadcast
    val children: Map[Int, Array[(Int, Array[Long])]] = centsLocal
      .groupBy { case (_, cq) => argminL2(supersLocal, cq) }
      .view.mapValues(_.sortBy(_._1)).toMap
    val supersBc = spark.sparkContext.broadcast(supersLocal)
    val childrenBc = spark.sparkContext.broadcast(children)
    val assign2 = udf((e: Array[Float]) => {
      val q = e.map(quant)
      val sid = argminL2(supersBc.value, q)
      childrenBc.value.get(sid) match {
        case None => -1
        case Some(cs) => argminL2(cs, q)
      }
    })
    val member = emb
      .select(assign2($"embedding").as("cell"), $"vec_id".as("nid"),
        $"embedding".as("ne"))
      .filter($"cell" >= 0)
    val qs = member.filter($"nid" < NumQueries)
      .select($"cell", $"nid".as("qid"), $"ne".as("qe"))
    val topk = udaf(new TopKAgg(TopK))
    member.join(broadcast(qs), Seq("cell"))
      .filter($"nid" =!= $"qid")
      .select($"qid", $"nid", dotUdf($"qe", $"ne").as("dot"))
      .groupBy($"qid")
      .agg(topk($"dot", $"nid").as("top"))
      .select($"qid", posexplode($"top").as(Seq("pos", "dn")))
      .select($"qid", $"dn._2".as("nid"), $"dn._1".as("dot"),
        ($"pos" + 1).cast("int").as("rn"))
      .orderBy($"qid", $"rn")
  }

  def qAnnIvf2LevelTrained(spark: SparkSession, dir: String): DataFrame =
    qAnnIvf2LevelTrainedOf(spark, Tables.embeddings(spark, dir),
      NumSupers, NumCells, LloydIters)

  /** DuckDB replication of the FULL trained hierarchy: the child Lloyd
    * chain (identical to [[qAnnIvfTrainedSql]]), then a super-level Lloyd
    * chain whose training points are the trained child centroids, then
    * L2 assignment child→super, vector→super, vector→cell-within-super —
    * every argmin ties→lowest id, every mean floor()'d, so the whole
    * two-level trajectory is bit-identical across engines. */
  val qAnnIvf2LevelTrainedSql: String = {
    val T = LloydIters
    val childCtes = (0 until T).map { t =>
      s"""d$t AS (
         |  SELECT v.vec_id, c.cid, CAST(sum((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS dist
         |  FROM qv v JOIN c$t c ON c.i = v.i
         |  GROUP BY v.vec_id, c.cid),
         |b$t AS (SELECT vec_id, min(dist) AS md FROM d$t GROUP BY vec_id),
         |a$t AS (
         |  SELECT d.vec_id, min(d.cid) AS cell
         |  FROM d$t d JOIN b$t b ON b.vec_id = d.vec_id AND d.dist = b.md
         |  GROUP BY d.vec_id),
         |m${t + 1} AS (
         |  SELECT a.cell AS cid, v.i, CAST(floor(1.0 * sum(v.q) / count(*)) AS BIGINT) AS q
         |  FROM qv v JOIN a$t a ON a.vec_id = v.vec_id
         |  GROUP BY a.cell, v.i),
         |c${t + 1} AS (
         |  SELECT cid, i, q FROM m${t + 1}
         |  UNION ALL
         |  SELECT c.cid, c.i, c.q FROM c$t c
         |  WHERE c.cid NOT IN (SELECT DISTINCT cid FROM m${t + 1}))""".stripMargin
    }.mkString(",\n")
    val superCtes = (0 until T).map { t =>
      s"""sd$t AS (
         |  SELECT c.cid, s.sid, CAST(sum((c.q - s.q) * (c.q - s.q)) AS BIGINT) AS dist
         |  FROM c$T c JOIN s$t s ON s.i = c.i
         |  GROUP BY c.cid, s.sid),
         |sb$t AS (SELECT cid, min(dist) AS md FROM sd$t GROUP BY cid),
         |sa$t AS (
         |  SELECT d.cid, min(d.sid) AS sid
         |  FROM sd$t d JOIN sb$t b ON b.cid = d.cid AND d.dist = b.md
         |  GROUP BY d.cid),
         |sm${t + 1} AS (
         |  SELECT a.sid, c.i, CAST(floor(1.0 * sum(c.q) / count(*)) AS BIGINT) AS q
         |  FROM c$T c JOIN sa$t a ON a.cid = c.cid
         |  GROUP BY a.sid, c.i),
         |s${t + 1} AS (
         |  SELECT sid, i, q FROM sm${t + 1}
         |  UNION ALL
         |  SELECT s.sid, s.i, s.q FROM s$t s
         |  WHERE s.sid NOT IN (SELECT DISTINCT sid FROM sm${t + 1}))""".stripMargin
    }.mkString(",\n")
    val sql = s"""WITH qv AS (
       |  SELECT e.vec_id, t.i,
       |    CAST(floor(CAST(list_extract(e.embedding, CAST(t.i AS INT)) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS q
       |  FROM embeddings e CROSS JOIN range(1, ${Dim + 1}) t(i)),
       |c0 AS (SELECT vec_id AS cid, i, q FROM qv WHERE vec_id < $NumCells),
       |$childCtes,
       |s0 AS (SELECT cid AS sid, i, q FROM c$T WHERE cid < $NumSupers),
       |$superCtes,
       |hd AS (
       |  SELECT c.cid, s.sid, CAST(sum((c.q - s.q) * (c.q - s.q)) AS BIGINT) AS dist
       |  FROM c$T c JOIN s$T s ON s.i = c.i GROUP BY c.cid, s.sid),
       |hb AS (SELECT cid, min(dist) AS md FROM hd GROUP BY cid),
       |hp AS (
       |  SELECT d.cid, min(d.sid) AS sid
       |  FROM hd d JOIN hb b ON b.cid = d.cid AND d.dist = b.md
       |  GROUP BY d.cid),
       |vsd AS (
       |  SELECT v.vec_id, s.sid, CAST(sum((v.q - s.q) * (v.q - s.q)) AS BIGINT) AS dist
       |  FROM qv v JOIN s$T s ON s.i = v.i GROUP BY v.vec_id, s.sid),
       |vsb AS (SELECT vec_id, min(dist) AS md FROM vsd GROUP BY vec_id),
       |vsup AS (
       |  SELECT d.vec_id, min(d.sid) AS sid
       |  FROM vsd d JOIN vsb b ON b.vec_id = d.vec_id AND d.dist = b.md
       |  GROUP BY d.vec_id),
       |vcd AS (
       |  SELECT v.vec_id, c.cid, CAST(sum((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS dist
       |  FROM qv v
       |  JOIN vsup u ON u.vec_id = v.vec_id
       |  JOIN hp p ON p.sid = u.sid
       |  JOIN c$T c ON c.cid = p.cid AND c.i = v.i
       |  GROUP BY v.vec_id, c.cid),
       |vcb AS (SELECT vec_id, min(dist) AS md FROM vcd GROUP BY vec_id),
       |cells AS (
       |  SELECT d.vec_id, min(d.cid) AS cell
       |  FROM vcd d JOIN vcb b ON b.vec_id = d.vec_id AND d.dist = b.md
       |  GROUP BY d.vec_id),
       |member AS (
       |  SELECT cells.cell, e.vec_id AS nid, e.embedding AS ne
       |  FROM embeddings e JOIN cells ON cells.vec_id = e.vec_id),
       |qs AS (SELECT cell, nid AS qid, ne AS qe FROM member WHERE nid < $NumQueries),
       |scored AS (
       |  SELECT q.qid, m.nid, ${qdotSql("q.qe", "m.ne")} AS dot
       |  FROM qs q JOIN member m ON m.cell = q.cell AND m.nid != q.qid)
       |SELECT qid, nid, dot, rn FROM (
       |  SELECT qid, nid, dot,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rn
       |  FROM scored) r
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin
    // DuckDB INLINES each CTE reference by default; the super chain
    // references the child chain which references qv, so inlining expands
    // the plan (and its parquet scans) multiplicatively — at LloydIters=2
    // it exhausts the file-descriptor limit before it exhausts CPU.
    // MATERIALIZE every CTE: each is computed once, like Spark's stages.
    sql.replace(" AS (", " AS MATERIALIZED (")
  }

  val qAnnIvf2LevelSql: String =
    s"""WITH supers AS (
       |  SELECT vec_id AS sid, embedding AS se FROM embeddings WHERE vec_id < $NumSupers),
       |cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < $NumCells),
       |csdots AS (
       |  SELECT c.cid, s.sid, ${qdotSql("s.se", "c.ce")} AS d
       |  FROM cents c CROSS JOIN supers s),
       |csbest AS (SELECT cid, max(d) AS mx FROM csdots GROUP BY cid),
       |cparent AS (
       |  SELECT t.cid, min(t.sid) AS sid
       |  FROM csdots t JOIN csbest b ON b.cid = t.cid AND t.d = b.mx
       |  GROUP BY t.cid),
       |vsdots AS (
       |  SELECT e.vec_id, s.sid, ${qdotSql("s.se", "e.embedding")} AS d
       |  FROM embeddings e CROSS JOIN supers s),
       |vsbest AS (SELECT vec_id, max(d) AS mx FROM vsdots GROUP BY vec_id),
       |vsuper AS (
       |  SELECT t.vec_id, min(t.sid) AS sid
       |  FROM vsdots t JOIN vsbest b ON b.vec_id = t.vec_id AND t.d = b.mx
       |  GROUP BY t.vec_id),
       |vcdots AS (
       |  SELECT e.vec_id, c.cid, ${qdotSql("c.ce", "e.embedding")} AS d
       |  FROM embeddings e
       |  JOIN vsuper v ON v.vec_id = e.vec_id
       |  JOIN cparent p ON p.sid = v.sid
       |  JOIN cents c ON c.cid = p.cid),
       |vcbest AS (SELECT vec_id, max(d) AS mx FROM vcdots GROUP BY vec_id),
       |cells AS (
       |  SELECT t.vec_id, min(t.cid) AS cell
       |  FROM vcdots t JOIN vcbest b ON b.vec_id = t.vec_id AND t.d = b.mx
       |  GROUP BY t.vec_id),
       |member AS (
       |  SELECT cells.cell, e.vec_id AS nid, e.embedding AS ne
       |  FROM embeddings e JOIN cells ON cells.vec_id = e.vec_id),
       |qs AS (SELECT cell, nid AS qid, ne AS qe FROM member WHERE nid < $NumQueries),
       |scored AS (
       |  SELECT q.qid, m.nid, ${qdotSql("q.qe", "m.ne")} AS dot
       |  FROM qs q JOIN member m ON m.cell = q.cell AND m.nid != q.qid)
       |SELECT qid, nid, dot, rn FROM (
       |  SELECT qid, nid, dot,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rn
       |  FROM scored) r
       |WHERE rn <= $TopK ORDER BY qid, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> qKnnBrute,
    "q_ann_buckets" -> qAnnBuckets,
    "q_ann_top_pairs" -> qAnnTopPairs,
    "q_ann_bucket_stats" -> qAnnBucketStats,
    "q_ann_ivf" -> qAnnIvf,
    "q_ann_ivf_probe2" -> qAnnIvfProbe2,
    "q_ann_ivf_2level" -> qAnnIvf2Level,
    "q_ann_ivf_2level_trained" -> qAnnIvf2LevelTrained,
    "q_ann_ivf_trained" -> qAnnIvfTrained,
    "q_dedup_embedding" -> qDedupEmbedding)

  val oracleSql: Map[String, String] = Map(
    "q_knn_brute" -> qKnnBruteSql,
    "q_ann_buckets" -> qAnnBucketsSql,
    "q_ann_top_pairs" -> qAnnTopPairsSql,
    "q_ann_bucket_stats" -> qAnnBucketStatsSql,
    "q_ann_ivf" -> qAnnIvfSql,
    "q_ann_ivf_2level" -> qAnnIvf2LevelSql,
    "q_ann_ivf_2level_trained" -> qAnnIvf2LevelTrainedSql,
    "q_ann_ivf_probe2" -> qAnnIvfProbe2Sql,
    "q_ann_ivf_trained" -> qAnnIvfTrainedSql,
    "q_dedup_embedding" -> qDedupEmbeddingSql)
}
