package graft.pipeline

import graft.synth.{SplitMix64, Vocab}

/** Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995; Chen &
  * Goodman 1999 formulation — public literature), one per language, built
  * from a deterministic seed corpus drawn from the token tables.
  *
  *   P_KN(w|v) = max(c(v,w) - D, 0)/c(v) + (D·N1+(v,·)/c(v)) · P_cont(w)
  *   P_cont(w) = N1+(·,w) / N1+(·,·),  unseen words get a floor.
  *
  * The models are small (vocab ≈ 60 words each) and broadcast to executors;
  * per-doc scoring is a single pass over tokens in mapPartitions.
  * Perplexity = exp(−Σ log P / N).
  */
final class KnBigramModel(
    val vocabIndex: Map[String, Int],
    unigramCount: Array[Double],
    bigramDense: Array[Double], // V x V dense counts (vocab is tiny; a
    // boxed Map lookup dominated the hot-path thread profile)
    contProb: Array[Double],
    followerTypes: Array[Int],
    discount: Double,
    unkProb: Double
) extends Serializable {

  private val vSize = unigramCount.length

  /** P(w | v); v = -1 means sentence start (backoff to continuation). */
  def prob(v: Int, w: Int): Double = {
    if (w < 0) return unkProb
    if (v < 0) return math.max(contProb(w), unkProb)
    val cv = unigramCount(v)
    if (cv == 0.0) return math.max(contProb(w), unkProb)
    val cvw = bigramDense(v * vSize + w)
    val direct = math.max(cvw - discount, 0.0) / cv
    val lambda = discount * followerTypes(v) / cv
    direct + lambda * math.max(contProb(w), unkProb)
  }

  /** Perplexity over whitespace tokens (lowercased ROOT). */
  def perplexity(tokens: Array[String]): Double = {
    if (tokens.isEmpty) return Double.MaxValue
    var logSum = 0.0
    var prev = -1
    var i = 0
    while (i < tokens.length) {
      val w = vocabIndex.getOrElse(tokens(i), -1)
      logSum += math.log(prob(prev, w))
      prev = w
      i += 1
    }
    math.exp(-logSum / tokens.length)
  }
}

object Perplexity {

  val CorpusTokens = 40000
  val Discount = 0.75
  val UnkProb = 1e-7

  /** Deterministic seed corpus for one language: Zipf-weighted draws so the
    * bigram table has realistic mass concentration. */
  private def seedCorpus(lang: String): Array[String] = {
    val vocab = Vocab.byLang(lang)
    val rng = new SplitMix64(SplitMix64.mix(0x9e12_7a5eL ^ lang.hashCode.toLong))
    // Zipf(1.0) over vocab order
    val w = Array.tabulate(vocab.length)(r => 1.0 / (r + 1.0))
    val total = w.sum
    val cdf = new Array[Double](vocab.length)
    var acc = 0.0
    var i = 0
    while (i < vocab.length) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    Array.fill(CorpusTokens) {
      val u = rng.nextDouble()
      val idx = java.util.Arrays.binarySearch(cdf, u)
      vocab(math.min(if (idx >= 0) idx else -idx - 1, vocab.length - 1))
    }
  }

  def buildModel(lang: String): KnBigramModel = {
    val corpus = seedCorpus(lang)
    val vocab = Vocab.byLang(lang).distinct
    val index = vocab.zipWithIndex.toMap
    val uni = new Array[Double](vocab.length)
    val bi = new Array[Double](vocab.length * vocab.length)
    val followers = Array.fill(vocab.length)(scala.collection.mutable.HashSet.empty[Int])
    val predecessors = Array.fill(vocab.length)(scala.collection.mutable.HashSet.empty[Int])
    var prev = -1
    for (tok <- corpus) {
      val w = index(tok)
      uni(w) += 1.0
      if (prev >= 0) {
        bi(prev * vocab.length + w) += 1.0
        followers(prev) += w
        predecessors(w) += prev
      }
      prev = w
    }
    val totalBigramTypes = predecessors.map(_.size).sum.toDouble
    val cont = Array.tabulate(vocab.length)(w =>
      if (totalBigramTypes == 0) 0.0 else predecessors(w).size / totalBigramTypes)
    new KnBigramModel(index, uni, bi, cont, followers.map(_.size), Discount, UnkProb)
  }

  /** All per-language models, keyed by language code (broadcast unit). */
  lazy val models: Map[String, KnBigramModel] =
    Vocab.languages.map(l => l -> buildModel(l)).toMap

  /** Whitespace tokenization, lowercase ROOT — the pipeline's shared rule. */
  def tokenize(text: String): Array[String] =
    tokenizeLower(text.toLowerCase(java.util.Locale.ROOT))

  /** Tokenize an ALREADY-lowercased text (callers that need the lowercase
    * copy elsewhere pass it in — one copy per doc, not three). */
  def tokenizeLower(t: String): Array[String] = {
    // count first, then fill an exact-size array: no ArrayBuffer growth
    // copies and no terminal toArray copy on the per-doc hot path
    val n = t.length
    var cnt = 0
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(t.charAt(i))) i += 1
      if (i < n) {
        cnt += 1
        while (i < n && !Character.isWhitespace(t.charAt(i))) i += 1
      }
    }
    val out = new Array[String](cnt)
    var k = 0
    i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(t.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(t.charAt(i))) i += 1
      if (i > start) { out(k) = t.substring(start, i); k += 1 }
    }
    out
  }

  /** Doc perplexity under the given language's model (fallback: worst). */
  def score(text: String, lang: String): Double =
    models.get(lang) match {
      case Some(m) => m.perplexity(tokenize(text))
      case None => Double.MaxValue
    }
}
