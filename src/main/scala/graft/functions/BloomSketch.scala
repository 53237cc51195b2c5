package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Shared Bloom-filter building blocks for the sharded incremental-dedup
  * family (CorpusQueries.qDedupIncrementalSharded, io.BloomStore).
  */
object BloomSketch {

  /** Digest-hash shard key: shards FILTERS by content hash so every batch
    * row probes exactly one shard's filter (time-bucket sharding would
    * force every row to consult every filter — a prior copy of the same
    * content can live in any time bucket). */
  def shardCol(h: Column, numShards: Int): Column =
    pmod(xxhash64(h), lit(numShards)).cast("int")

  /** Serialize/deserialize helpers (BloomFilter's own stable wire format). */
  def toBytes(f: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos); bos.toByteArray
  }

  def fromBytes(b: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))

  /** Per-group Bloom builder: one filter per group in a SINGLE grouped
    * aggregation — partitions build partial filters map-side and
    * mergeInPlace (bitwise OR) combines them, so the input streams once
    * and no digest list is ever collected. Insertions and merges commute,
    * so the finished filter's BYTES are independent of partitioning and
    * insert order — build(A ∪ B) ≡ build(A) merged with build(B)
    * bit-for-bit at equal capacity/fpp (BloomStoreSpec asserts it). */
  class BloomAgg(expected: Long, fpp: Double)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expected, fpp)
    override def reduce(b: BloomFilter, a: String): BloomFilter = {
      if (a != null) b.putString(a); b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    override def finish(r: BloomFilter): Array[Byte] = toBytes(r)
    override def bufferEncoder: org.apache.spark.sql.Encoder[BloomFilter] =
      org.apache.spark.sql.Encoders.javaSerialization[BloomFilter]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }
}
