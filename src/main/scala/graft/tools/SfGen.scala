package graft.tools

import graft.synth.SplitMix64
import org.apache.spark.sql.SparkSession

/** One synthetic document row — same shape as the driver testdata's
  * `documents` table (doc_id, text, lang, source, n_chars). */
final case class GenDoc(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

/** One synthetic embedding row — same shape as `embeddings`
  * (vec_id, embedding FLOAT[64], label INT). */
final case class GenEmb(vec_id: Long, embedding: Array[Float], label: Int)

/** Deterministic sf-equivalent table generator for the dedup-family scale
  * curve (BENCH.md): the driver's testdata stops at sf0.1 (5,000 docs),
  * so the 10× point is synthesized here with the same SHAPE — word-vocab
  * text of ~50 words with genuine near-dup clusters, weighted langs, 20
  * sources — from the same generator at both scales, so the per-query
  * ratio between them is a clean scale measurement.
  *
  * Near-dup structure: docs in a block of 10 share a 40-word body keyed
  * by the block id; the last 10 words are per-doc. Intra-block Jaccard is
  * high (real near-dups for MinHash/LSH/CC), cross-block low. Embeddings:
  * uniform [-1,1]^64; every vec_id ≡ 1 (mod 5) is its predecessor nudged
  * by 0.01 in one dimension (a planted cosine ≥ 0.97 near-dup pair).
  *
  * Pure function of row index (SplitMix64 sub-seeds) — byte-identical
  * under any partitioning; generation scales out as spark.range across
  * executors with zero shuffle.
  *
  * Usage: runMain graft.tools.SfGen <nDocs> <outDir>
  *   writes <outDir>/documents.parquet and <outDir>/embeddings.parquet
  *   (nVecs = 2·nDocs/5, the driver's docs:vecs ratio).
  */
object SfGen {

  private val vocab = Array(
    "spark", "batch", "part", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "plan", "join", "shuffle", "cache", "disk")

  private val langs = Array("en", "de", "es", "fr", "zh")

  private def word(seed: Long): String =
    vocab(((SplitMix64.mix(seed) >>> 1) % vocab.length).toInt)

  def docText(id: Long): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < 50) {
      if (i > 0) sb += ' '
      // first 40 words keyed by the block (near-dup cluster), last 10 by
      // the doc itself
      val seed = if (i < 40) (id / 10) * 1024 + i else id * 1024 + 512 + i
      sb ++= word(seed)
      i += 1
    }
    sb.toString
  }

  def doc(id: Long): GenDoc = {
    val t = docText(id)
    val h = SplitMix64.mix(id * 1024 + 999)
    // ~40% en, ~15% each of de/es/fr/zh — the driver table's weighting
    val lang = ((h >>> 1) % 10) match {
      case 0 | 1 | 2 | 3 => "en"
      case k => langs(1 + ((k - 4) % 4).toInt)
    }
    GenDoc(id, t, lang, s"src${id % 20}", t.length.toLong)
  }

  def emb(id: Long): GenEmb = {
    // planted near-dup: vec 5k+1 is vec 5k nudged in one dimension
    val base = if (id % 5 == 1) id - 1 else id
    val a = new Array[Float](64)
    var j = 0
    while (j < 64) {
      val u = (SplitMix64.mix(base * 128 + j) >>> 11) * 1.1102230246251565e-16
      a(j) = (u * 2.0 - 1.0).toFloat
      j += 1
    }
    if (id % 5 == 1) a(0) = a(0) + 0.01f
    GenEmb(id, a, (id % 8).toInt)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SfGen <nDocs> <outDir>")
    val n = args(0).toLong
    val out = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sfgen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(0, n, 1, cpus.toInt).as[Long]
      .mapPartitions(_.map(doc))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.range(0, 2 * n / 5, 1, cpus.toInt).as[Long]
      .mapPartitions(_.map(emb))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"""{"generated":{"documents":$n,"embeddings":${2 * n / 5}},"out":"$out"}""")
    spark.stop()
  }
}
