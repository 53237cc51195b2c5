package graft.pipeline

import graft.synth.Vocab

/** Gopher/C4-style heuristic quality rules (Rae et al. 2021 "Scaling
  * Language Models" Gopher rules; Raffel et al. 2020 C4 filters — public
  * papers). Ordered; the FIRST failing rule id is the document's drop
  * reason — rvl's refusal discipline applied per document (the reference
  * reports the first offending cell the same way,
  * /root/reference/src/numeric/columns.rs:250-275).
  */
object Heuristics {

  final case class DocStats(
      nChars: Int,
      nWords: Int,
      meanWordLen: Double,
      symbolRatio: Double,
      bulletFraction: Double,
      ellipsisFraction: Double,
      dupLineFraction: Double,
      distinctStopwords: Int,
      hasLorem: Boolean,
      hasBrace: Boolean,
      hasNaughty: Boolean,
      hasAt: Boolean, // scrub trigger flags, computed in the same char
      hasDigit: Boolean) // scan so the scrubber skips its own pass

  def stats(text: String): DocStats = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    stats(text, lower, Perplexity.tokenizeLower(lower))
  }

  def stats(text: String, tokens: Array[String]): DocStats =
    stats(text, text.toLowerCase(java.util.Locale.ROOT), tokens)

  /** Stopword → dense index (distinct counting via a 2-long BitSet per
    * call instead of an immutable-Set rebuild per hit) and the naughty
    * list as a hash set (the Array.contains was a linear scan with a
    * String equals per entry per token). Same membership semantics. */
  private val stopIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    for (w <- Vocab.stopwords) { m.put(w, Integer.valueOf(i)); i += 1 }
    m
  }
  private val naughtySet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Vocab.naughty.foreach(s.add)
    s
  }

  /** Overload taking the pre-computed lowercase copy and tokens — the
    * pipeline lowercases and tokenizes once per doc, shared across the
    * heuristics and perplexity scorers (hot-path allocation win). */
  def stats(text: String, lowerText: String, tokens: Array[String]): DocStats = {
    val lines = text.split("\n", -1)
    val nWords = tokens.length
    var wordLenSum = 0L
    val stopBits = new java.util.BitSet(stopIdx.size())
    var naughty = false
    var i = 0
    while (i < nWords) {
      val t = tokens(i)
      wordLenSum += t.length
      val si = stopIdx.get(t)
      if (si != null) stopBits.set(si.intValue())
      if (naughtySet.contains(t)) naughty = true
      i += 1
    }
    var symbols = 0
    var chars = 0
    var hasAt = false
    var hasDigit = false
    var ci = 0
    while (ci < text.length) {
      val c = text.charAt(ci)
      if (!Character.isWhitespace(c)) {
        chars += 1
        if (c == '#' || c == '$' || c == '%' || c == '@' || c == '~' || c == '^' || c == '|') symbols += 1
        if (c == '@') hasAt = true
        else if (c >= '0' && c <= '9') hasDigit = true
      }
      ci += 1
    }
    var bullets = 0
    var ellipsis = 0
    val seen = scala.collection.mutable.HashSet.empty[String]
    var dups = 0
    var li = 0
    var nonEmpty = 0
    while (li < lines.length) {
      val l = lines(li)
      if (l.nonEmpty) {
        nonEmpty += 1
        if (l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")) bullets += 1
        if (l.endsWith("...") || l.endsWith("…")) ellipsis += 1
        if (!seen.add(l)) dups += 1
      }
      li += 1
    }
    DocStats(
      nChars = text.length,
      nWords = nWords,
      meanWordLen = if (nWords == 0) 0.0 else wordLenSum.toDouble / nWords,
      symbolRatio = if (chars == 0) 0.0 else symbols.toDouble / chars,
      bulletFraction = if (nonEmpty == 0) 0.0 else bullets.toDouble / nonEmpty,
      ellipsisFraction = if (nonEmpty == 0) 0.0 else ellipsis.toDouble / nonEmpty,
      dupLineFraction = if (nonEmpty == 0) 0.0 else dups.toDouble / nonEmpty,
      distinctStopwords = stopBits.cardinality(),
      hasLorem = lowerText.contains("lorem ipsum"),
      hasBrace = text.indexOf('{') >= 0,
      hasNaughty = naughty,
      hasAt = hasAt,
      hasDigit = hasDigit)
  }

  /** Thresholds — fixed config, versioned with the pipeline. */
  final case class Config(
      minWords: Int = 25,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 1.5,
      maxMeanWordLen: Double = 12.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFraction: Double = 0.5,
      maxEllipsisFraction: Double = 0.3,
      maxDupLineFraction: Double = 0.3,
      minDistinctStopwords: Int = 2)

  val default: Config = Config()

  /** First failing rule id, or None if the doc passes all heuristics.
    * Rule order is part of the contract (ids are machine-stable). */
  def firstFailure(s: DocStats, cfg: Config = default): Option[String] = {
    if (s.nWords < cfg.minWords) Some("too_few_words")
    else if (s.nWords > cfg.maxWords) Some("too_many_words")
    else if (s.meanWordLen < cfg.minMeanWordLen) Some("mean_word_length_low")
    else if (s.meanWordLen > cfg.maxMeanWordLen) Some("mean_word_length_high")
    else if (s.symbolRatio > cfg.maxSymbolRatio) Some("symbol_ratio")
    else if (s.bulletFraction > cfg.maxBulletFraction) Some("bullet_lines")
    else if (s.ellipsisFraction > cfg.maxEllipsisFraction) Some("ellipsis_lines")
    else if (s.dupLineFraction > cfg.maxDupLineFraction) Some("dup_lines")
    else if (s.hasLorem) Some("lorem_ipsum")
    else if (s.hasBrace) Some("brace")
    else if (s.hasNaughty) Some("naughty_word")
    else if (s.distinctStopwords < cfg.minDistinctStopwords) Some("no_stopwords")
    else None
  }
}
