package graft.functions

/** Deterministic text-hashing kernels for dedup / similarity:
  *
  *  - 8-char shingle MinHash (k=8 permutations) — Broder 1997, public
  *  - 16-bit SimHash over word hashes — Charikar 2002, public
  *  - chunked polynomial fingerprint (Rabin-style rolling hash)
  *
  * All arithmetic is exact Long math (base-31 polynomials, modulus 1e9+7)
  * chosen so a DuckDB SQL oracle can replicate every value bit-for-bit:
  * no Long overflow anywhere (shingle poly ≤ 31^7·127 ≈ 3.5e12;
  * A·h0 ≤ 1.1e8·1e9 ≈ 1.1e17). Inputs are ASCII (JVM charAt == SQL ord).
  */
object TextHash {

  val P = 1000000007L
  val MinHashK = 8
  val ShingleW = 8
  val ChunkW = 16

  // fixed permutation constants (primes just above 1e8 / small primes)
  val A: Array[Long] = Array(100000007L, 100000037L, 100000039L, 100000049L,
    100000073L, 100000081L, 100000123L, 100000127L)
  val B: Array[Long] = Array(37L, 101L, 197L, 331L, 457L, 571L, 691L, 823L)

  /** Base-31 polynomial over chars [i, i+ShingleW); no modulus needed. */
  @inline def shingleHash(text: String, i: Int): Long = {
    var h = 0L
    var j = i
    val end = i + ShingleW
    while (j < end) { h = h * 31 + text.charAt(j); j += 1 }
    h
  }

  /** k min-hashes over all 8-char shingles (stride 1). Docs shorter than
    * one shingle get all-(P) sentinels (never collide). */
  def minhash(text: String): Array[Long] = {
    val out = Array.fill(MinHashK)(P)
    val n = text.length
    var i = 0
    while (i <= n - ShingleW) {
      val h0 = shingleHash(text, i) % P
      var j = 0
      while (j < MinHashK) {
        val v = (A(j) * h0 + B(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  /** Base-31 polynomial over the word's first 8 chars, space-padded. */
  def word8Hash(w: String): Long = {
    var h = 0L
    var j = 0
    while (j < ShingleW) {
      val c: Char = if (j < w.length) w.charAt(j) else ' '
      h = h * 31 + c
      j += 1
    }
    h
  }

  /** 16-bit SimHash over single-space-separated words (empties skipped). */
  def simhash16(text: String): Int = {
    val counts = new Array[Int](16)
    val n = text.length
    var start = 0
    while (start < n) {
      while (start < n && text.charAt(start) == ' ') start += 1
      var end = start
      while (end < n && text.charAt(end) != ' ') end += 1
      if (end > start) {
        val wh = word8Hash(text.substring(start, end))
        var b = 0
        while (b < 16) {
          counts(b) += (((wh >> b) & 1L).toInt * 2) - 1
          b += 1
        }
      }
      start = end
    }
    var sim = 0
    var b = 0
    while (b < 16) {
      if (counts(b) > 0) sim |= 1 << b
      b += 1
    }
    sim
  }

  /** 32-bit SimHash over single-space-separated words — the wider variant
    * the Hamming-neighbor join (Manku, Jain & Das Sarma, WWW '07) blocks
    * into 4×8-bit bands. Same word8Hash bit source as simhash16 (bits
    * 0..31 of the base-31 polynomial); kept separate so the 16-bit
    * fingerprint query's bytes never change. */
  def simhash32(text: String): Long = {
    val counts = new Array[Int](32)
    val n = text.length
    var start = 0
    while (start < n) {
      while (start < n && text.charAt(start) == ' ') start += 1
      var end = start
      while (end < n && text.charAt(end) != ' ') end += 1
      if (end > start) {
        val wh = word8Hash(text.substring(start, end))
        var b = 0
        while (b < 32) {
          counts(b) += (((wh >> b) & 1L).toInt * 2) - 1
          b += 1
        }
      }
      start = end
    }
    var sim = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }

  /** Document fingerprint: sum (mod P) of per-chunk Horner-mod hashes over
    * 16-char chunks (last chunk space-padded). Identical chunks anywhere
    * contribute identically — an order-insensitive content signature. */
  def fingerprint(text: String): Long = {
    val n = text.length
    var sum = 0L
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < ChunkW) {
        val c: Char = if (i + j < n) text.charAt(i + j) else ' '
        h = (h * 31 + c) % P
        j += 1
      }
      sum = (sum + h) % P
      i += ChunkW
    }
    sum
  }

  /** In-place sort + dedup of the first `n` hashes. */
  private def sortDedup(a: Array[Long]): Array[Long] = {
    val n = a.length
    if (n <= 1) return a
    java.util.Arrays.sort(a)
    var w = 1
    var r = 1
    while (r < n) {
      if (a(r) != a(r - 1)) { a(w) = a(r); w += 1 }
      r += 1
    }
    if (w == n) a else java.util.Arrays.copyOf(a, w)
  }

  /** Distinct shingle hashes, sorted ascending — the per-doc SET used by
    * exact Jaccard verification. Computed once per doc so candidate pairs
    * never re-shingle text; arrays (not raw text) ride any later join. */
  def shingleSet(text: String): Array[Long] = {
    val n = text.length - ShingleW + 1
    if (n <= 0) return Array.emptyLongArray
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = shingleHash(text, i); i += 1 }
    sortDedup(a)
  }

  /** shingleSet straight off UTF8String BYTES: for pure-ASCII input each
    * byte equals its char, so the base-31 polynomial over bytes is
    * bit-identical to the String path with no UTF-16 materialization (the
    * decode-side lever — the doc text never becomes a java.lang.String).
    * Any multibyte content falls back to the exact String path. */
  def shingleSetUtf8(u: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if (u.getByte(i) < 0) return shingleSet(u.toString)
      i += 1
    }
    val m = n - ShingleW + 1
    if (m <= 0) return Array.emptyLongArray
    val a = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0L
      var j = i
      val end = i + ShingleW
      while (j < end) { h = h * 31 + u.getByte(j); j += 1 }
      a(i) = h
      i += 1
    }
    sortDedup(a)
  }

  /** MinHash over an already-distinct shingle set — identical to
    * `minhash(text)` because min is duplicate-insensitive. */
  def minhashFromSet(hset: Array[Long]): Array[Long] = {
    val out = Array.fill(MinHashK)(P)
    var i = 0
    while (i < hset.length) {
      val h0 = hset(i) % P
      var j = 0
      while (j < MinHashK) {
        val v = (A(j) * h0 + B(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  /** Intersection size of two sorted distinct Long arrays (linear merge). */
  def sortedIntersect(a: Array[Long], b: Array[Long]): Long = {
    var i = 0
    var j = 0
    var inter = 0L
    while (i < a.length && j < b.length) {
      val d = java.lang.Long.compare(a(i), b(j))
      if (d == 0) { inter += 1; i += 1; j += 1 }
      else if (d < 0) i += 1
      else j += 1
    }
    inter
  }

  /** LSH band keys over the minhash signature: MinHashK/2 bands of 2 rows.
    * Collision in ANY band marks a candidate near-duplicate pair. */
  def bandKeys(sig: Array[Long]): Array[Long] = {
    val nBands = MinHashK / 2
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      out(b) = sig(2 * b) * P + sig(2 * b + 1)
      b += 1
    }
    out
  }
}
