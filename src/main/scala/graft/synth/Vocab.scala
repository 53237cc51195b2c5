package graft.synth

/** Deterministic per-language token tables for the synthesized pages corpus
  * (FIXTURES.md §1). Word lists are common high-frequency words (public
  * knowledge); they drive language ID profiles, the KN perplexity seed
  * corpus, and the generator, so the pipeline is exercised with realistic
  * disjoint-ish character distributions.
  */
object Vocab {

  val en: Array[String] = Array(
    "the", "of", "and", "to", "in", "is", "was", "that", "for", "on", "as",
    "with", "by", "at", "from", "it", "an", "be", "this", "which", "or",
    "had", "are", "but", "not", "have", "they", "his", "her", "she", "he",
    "we", "you", "all", "were", "their", "one", "said", "there", "been",
    "has", "when", "who", "will", "more", "no", "if", "out", "so", "up",
    "people", "time", "year", "work", "world", "house", "water", "light")

  val de: Array[String] = Array(
    "der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich",
    "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als",
    "auch", "es", "an", "werden", "aus", "er", "hat", "dass", "sie", "nach",
    "wird", "bei", "einer", "um", "am", "sind", "noch", "wie", "einem",
    "über", "einen", "so", "zum", "war", "haben", "nur", "oder", "aber",
    "vor", "zur", "jahr", "zeit", "mensch", "welt", "haus", "wasser", "licht")

  val fr: Array[String] = Array(
    "le", "de", "un", "être", "et", "à", "il", "avoir", "ne", "je", "son",
    "que", "se", "qui", "ce", "dans", "en", "du", "elle", "au", "pour",
    "pas", "sur", "faire", "plus", "dire", "me", "on", "mon", "lui", "nous",
    "comme", "mais", "avec", "tout", "y", "aller", "voir", "bien", "où",
    "sans", "tu", "ou", "leur", "homme", "si", "deux", "moi", "vouloir",
    "temps", "année", "monde", "maison", "eau", "lumière", "gens", "jour")

  val es: Array[String] = Array(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque", "esta",
    "entre", "cuando", "muy", "sin", "sobre", "también", "me", "hasta",
    "hay", "donde", "quien", "desde", "todo", "nos", "durante", "todos",
    "uno", "les", "ni", "tiempo", "año", "mundo", "casa", "agua", "luz", "gente")

  val zh: Array[String] = Array(
    "de", "shi", "zai", "le", "wo", "you", "ta", "zhe", "ge", "men",
    "zhong", "guo", "shang", "lai", "dao", "shuo", "he", "ni", "yao",
    "jiu", "chu", "ye", "dui", "sheng", "neng", "er", "hui", "xia", "zi",
    "nian", "fa", "cheng", "yi", "wei", "hao", "kan", "tian", "xin", "li",
    "da", "ren", "bu", "shui", "jia", "shijie", "shijian", "guang", "ming")

  val byLang: Map[String, Array[String]] =
    Map("en" -> en, "de" -> de, "fr" -> fr, "es" -> es, "zh" -> zh)

  val languages: Array[String] = Array("en", "de", "fr", "es", "zh")

  /** Stopword union used by the heuristic "has stopwords" rule (C4-style,
    * generalized to the corpus's languages). */
  val stopwords: Set[String] =
    (en.take(20) ++ de.take(20) ++ fr.take(20) ++ es.take(20) ++ zh.take(20)).toSet

  /** Block-list for the toxicity rule — synthetic placeholder tokens (the
    * real list would ship as config, not code). */
  val naughty: Array[String] = Array("badword1", "badword2", "badword3", "slurword")

  /** Deterministic gibberish token: consonant-heavy noise, 4-9 chars. */
  def gibberishWord(rng: SplitMix64): String = {
    val chars = "bcdfghjklmnpqrstvwxz"
    val n = 4 + rng.nextInt(6)
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) { sb.append(chars.charAt(rng.nextInt(chars.length))); i += 1 }
    sb.toString
  }
}
