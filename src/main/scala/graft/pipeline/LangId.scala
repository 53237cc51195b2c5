package graft.pipeline

import graft.synth.Vocab

/** fastText-style language ID: hashed character n-gram (1..3) features
  * against a dense per-language weight matrix, scored as cosine similarity.
  *
  * The model is a plain `Array[Float]` of shape (numLangs × D) built
  * deterministically from the per-language token tables — on a cluster it is
  * built once on the driver (≈ numLangs × 2^16 floats ≈ 1.3 MB) and
  * broadcast; scoring runs in mapPartitions with a reusable scratch buffer
  * per partition (no per-row allocation). This mirrors fastText's
  * hashed-bigram linear layer (Joulin et al. 2016, public) without the
  * trained embedding — profiles suffice because scoring is relative.
  */
final class LangIdModel(
    val langs: Array[String],
    val dim: Int,
    val weights: Array[Float] // LANE-MAJOR dim × numLangs (all language
    // weights for one hash are adjacent — one cache line per unique hash
    // in the scoring loop), rows L2-normalized per language
) extends Serializable {

  /** (bestLang, cosineScore). Deterministic; ties → first lang in order.
    * Sparse scoring: the doc contributes ~3·|text| hashed n-grams; we sort
    * the hash list (reusable scratch) and walk runs, so cost is
    * O(n log n + n·numLangs) per doc instead of O(dim·numLangs).
    */
  def predict(text: String, scratch: LangIdScratch): (String, Double) = {
    // classify on a bounded sample: language signal saturates long before
    // the full document, and cost is linear in chars (fastText practice)
    val sample =
      if (text.length <= LangId.SampleChars) text
      else text.substring(0, LangId.SampleChars)
    val m = LangId.hashList(sample, dim, scratch)
    if (m == 0) return (langs(0), 0.0)
    // open-addressing count table (reused): O(m) instead of sort's O(m log m)
    // — the sort dominated the hot-path thread profile
    val hs = scratch.hashes
    scratch.ensureTable(m)
    val keys = scratch.tableKeys
    val counts = scratch.tableCounts
    val mask = keys.length - 1
    val shift = 32 - Integer.numberOfTrailingZeros(keys.length)
    var used = 0
    var i = 0
    while (i < m) {
      val h = hs(i)
      var slot = (h * 0x9e3779b1) >>> shift
      var probing = true
      while (probing) {
        if (counts(slot) == 0) {
          keys(slot) = h; counts(slot) = 1
          scratch.usedSlots(used) = slot; used += 1
          probing = false
        } else if (keys(slot) == h) {
          counts(slot) += 1; probing = false
        } else slot = (slot + 1) & mask
      }
      i += 1
    }
    val dots = scratch.dots
    java.util.Arrays.fill(dots, 0.0)
    var norm = 0.0
    var u = 0
    while (u < used) {
      val slot = scratch.usedSlots(u)
      val c = counts(slot).toDouble
      counts(slot) = 0 // reset for the next doc
      norm += c * c
      val off = keys(slot) * langs.length
      var l = 0
      while (l < langs.length) {
        dots(l) += c * weights(off + l)
        l += 1
      }
      u += 1
    }
    val inv = 1.0 / math.sqrt(norm)
    var best = 0
    var bestScore = java.lang.Double.NEGATIVE_INFINITY
    var l = 0
    while (l < langs.length) {
      val cos = dots(l) * inv
      if (cos > bestScore) { bestScore = cos; best = l }
      l += 1
    }
    (langs(best), bestScore)
  }

  def predict(text: String): (String, Double) = predict(text, new LangIdScratch(langs.length))
}

/** Per-partition reusable buffers — one allocation per Spark partition. */
final class LangIdScratch(numLangs: Int) {
  var hashes: Array[Int] = new Array[Int](1 << 12)
  val dots: Array[Double] = new Array[Double](numLangs)
  var tableKeys: Array[Int] = new Array[Int](1 << 12)
  var tableCounts: Array[Int] = new Array[Int](1 << 12)
  var usedSlots: Array[Int] = new Array[Int](1 << 12)
  def ensure(n: Int): Unit =
    if (hashes.length < n) hashes = new Array[Int](Integer.highestOneBit(n - 1) << 1)
  def ensureTable(m: Int): Unit = {
    val want = Integer.highestOneBit(math.max(4 * m, 16) - 1) << 1
    if (tableKeys.length < want) {
      tableKeys = new Array[Int](want)
      tableCounts = new Array[Int](want)
      usedSlots = new Array[Int](want)
    }
  }
}

object LangId {

  val Dim: Int = 1 << 16

  /** Chars of text used for classification (bounded cost per doc). */
  val SampleChars: Int = 256

  /** Write the doc's hashed 1..3-gram indices into scratch; returns count. */
  def hashList(text: String, dim: Int, scratch: LangIdScratch): Int = {
    val s = normalize(text)
    val n = s.length
    scratch.ensure(3 * n + 3)
    val mask = dim - 1
    val out = scratch.hashes
    var m = 0
    var i = 0
    while (i < n) {
      // FNV-1a is prefix-extendable: the 2-gram hash extends the 1-gram's
      // state, the 3-gram the 2-gram's — 3 char steps per position
      // instead of the 6 the three from-scratch hashes cost. Identical
      // values in identical order.
      var h = 0x811c9dc5
      var j = i
      val end = if (i + 3 <= n) i + 3 else n
      while (j < end) {
        h ^= s.charAt(j)
        h *= 0x01000193
        out(m) = h & mask
        m += 1
        j += 1
      }
      i += 1
    }
    m
  }

  /** FNV-1a over chars — stable across JVMs (no String.hashCode reliance). */
  @inline private def fnv1a(s: CharSequence, from: Int, to: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < to) {
      h ^= s.charAt(i)
      h *= 0x01000193
      i += 1
    }
    h
  }

  /** Accumulate hashed 1..3-gram counts of the lowercased, space-padded
    * text into `acc` (length dim). */
  def hashFeatures(text: String, dim: Int, acc: Array[Float]): Unit = {
    val s = normalize(text)
    val n = s.length
    val mask = dim - 1
    var i = 0
    while (i < n) {
      var g = 1
      while (g <= 3 && i + g <= n) {
        val h = fnv1a(s, i, i + g)
        acc(h & mask) += 1.0f
        g += 1
      }
      i += 1
    }
  }

  /** Lowercase (ROOT), collapse all whitespace runs to single spaces, pad. */
  def normalize(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length + 2)
    sb.append(' ')
    var lastSpace = true
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val isWs = c == ' ' || c == '\n' || c == '\t' || c == '\r'
      if (isWs) {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      } else {
        sb.append(Character.toLowerCase(c))
        lastSpace = false
      }
      i += 1
    }
    if (!lastSpace) sb.append(' ')
    sb.toString
  }

  /** Build the deterministic profile model from the language token tables. */
  def buildModel(dim: Int = Dim): LangIdModel = {
    val langs = Vocab.languages
    val weights = new Array[Float](langs.length * dim)
    var l = 0
    while (l < langs.length) {
      val row = new Array[Float](dim)
      for (w <- Vocab.byLang(langs(l))) hashFeatures(w, dim, row)
      // L2-normalize the row so cosine scoring is a plain dot product
      var norm = 0.0
      var i = 0
      while (i < dim) { norm += row(i).toDouble * row(i); i += 1 }
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { weights(i * langs.length + l) = (row(i) * inv).toFloat; i += 1 }
      l += 1
    }
    new LangIdModel(langs, dim, weights)
  }

  lazy val default: LangIdModel = buildModel()
}
