package graft.synth

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

/** One Common-Crawl-style page per BASELINE.json `input_hint`:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  * `lang` is the generation-truth label ("xx" = gibberish class).
  */
final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

/** Deterministic page generator (seeded splitmix64 on row index — FIXTURES.md
  * §1). Pure function idx → Page, so Spark generation via
  * `spark.range(n).mapPartitions` is embarrassingly parallel and byte-stable
  * across any partitioning. Feature injections (PII, lorem, bullets, dup
  * lines, symbol spam, naughty words, encoding-corrupted html) happen at
  * fixed per-doc rates so downstream keep/drop rates are predictable.
  */
object PageGen {

  val Seed = 0x5eed_c0ffeeL
  val NumHosts = 1000
  val EpochMs: Long = 1767225600000L // 2026-01-01T00:00:00Z

  /** Zipf(1.2) CDF over the host pool — a few hosts are hot (skew). */
  private lazy val hostCdf: Array[Double] = {
    val w = Array.tabulate(NumHosts)(r => 1.0 / math.pow(r + 1.0, 1.2))
    val total = w.sum
    val cdf = new Array[Double](NumHosts)
    var acc = 0.0
    var i = 0
    while (i < NumHosts) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def pickHost(rng: SplitMix64): Int = {
    val u = rng.nextDouble()
    val idx = java.util.Arrays.binarySearch(hostCdf, u)
    val pos = if (idx >= 0) idx else -idx - 1
    math.min(pos, NumHosts - 1)
  }

  def hostName(h: Int): String = s"host$h.example.org"

  /** HTML-escape exactly what the extractor decodes. */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def generate(idx: Long): Page = {
    val rng = new SplitMix64(SplitMix64.mix(Seed ^ idx))

    // ---- language class -------------------------------------------------
    val lr = rng.nextDouble()
    val lang =
      if (lr < 0.40) "en"
      else if (lr < 0.52) "de"
      else if (lr < 0.64) "fr"
      else if (lr < 0.76) "es"
      else if (lr < 0.88) "zh"
      else "xx" // gibberish
    val vocab = Vocab.byLang.getOrElse(lang, null)

    def word(): String =
      if (vocab == null) Vocab.gibberishWord(rng) else vocab(rng.nextInt(vocab.length))

    // ---- feature flags (independent per-doc draws) ----------------------
    val tooShort = rng.nextDouble() < 0.04
    val pii = rng.nextDouble() < 0.08
    val lorem = rng.nextDouble() < 0.03
    val bulletsHeavy = rng.nextDouble() < 0.03
    val ellipsisHeavy = rng.nextDouble() < 0.02
    val dupLines = rng.nextDouble() < 0.03
    val symbolSpam = rng.nextDouble() < 0.03
    val naughtyDoc = rng.nextDouble() < 0.04
    val braces = rng.nextDouble() < 0.02

    // ---- body ----------------------------------------------------------
    val nLines = if (tooShort) 1 else 4 + rng.nextInt(7)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var li = 0
    while (li < nLines) {
      val nWords = if (tooShort) 2 + rng.nextInt(6) else 8 + rng.nextInt(12)
      val sb = new StringBuilder
      if (bulletsHeavy && li % 10 != 9) sb.append("- ")
      var wi = 0
      while (wi < nWords) {
        if (wi > 0) sb.append(' ')
        sb.append(word())
        wi += 1
      }
      if (ellipsisHeavy && li % 2 == 0) sb.append("...")
      lines += sb.toString
      li += 1
    }
    if (naughtyDoc)
      lines.insert(rng.nextInt(lines.length + 1),
        s"${word()} ${Vocab.naughty(rng.nextInt(Vocab.naughty.length))} ${word()} ${word()}")
    if (lorem)
      lines.insert(rng.nextInt(lines.length + 1),
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod")
    if (braces)
      lines.insert(rng.nextInt(lines.length + 1),
        "function f() { return { a: 1, b: 2 }; }")
    if (symbolSpam)
      lines.insert(rng.nextInt(lines.length + 1),
        "### $$$ %%% @@@ ### $$$ %%% @@@ ### $$$ %%% @@@")
    if (pii) {
      val a = rng.nextInt(900) + 100
      val b = rng.nextInt(9000) + 1000
      lines += s"contact user$idx@example.com or call 555-$a-$b ssn 123-45-$b ip 10.0.${rng.nextInt(256)}.${rng.nextInt(256)}"
    }
    if (dupLines && lines.nonEmpty) {
      val src = lines(rng.nextInt(lines.length))
      var d = 0
      val nDup = 4 + rng.nextInt(4)
      while (d < nDup) { lines += src; d += 1 }
    }
    val text = lines.mkString("\n")

    // ---- html (30% of rows; extract(html) must equal `text` byte-for-byte)
    val hasHtml = rng.nextDouble() < 0.30
    val html: Array[Byte] =
      if (!hasHtml) null
      else {
        val title = s"${word()} ${word()}"
        val body = lines.map(l => s"<p>${esc(l)}</p>").mkString
        val doc =
          s"<html><head><title>${esc(title)}</title>" +
            "<style>body { margin: 0; }</style>" +
            s"<script>var x = 1 < 2;</script></head><body>$body</body></html>"
        val bytes = doc.getBytes(StandardCharsets.UTF_8)
        val corrupt = rng.nextDouble()
        if (corrupt < 0.03) {
          // UTF-16LE BOM → extractor must refuse (encoding guard)
          val out = new Array[Byte](bytes.length + 2)
          out(0) = 0xff.toByte; out(1) = 0xfe.toByte
          System.arraycopy(bytes, 0, out, 2, bytes.length)
          out
        } else if (corrupt < 0.08) {
          // UTF-8 BOM → extractor strips it, still fine
          val out = new Array[Byte](bytes.length + 3)
          out(0) = 0xef.toByte; out(1) = 0xbb.toByte; out(2) = 0xbf.toByte
          System.arraycopy(bytes, 0, out, 3, bytes.length)
          out
        } else bytes
      }

    // ---- identity -------------------------------------------------------
    val host = hostName(pickHost(rng))
    val url = s"https://$host/p/${lang}doc-$idx"
    val ts = new Timestamp(EpochMs + (SplitMix64.mix(idx) >>> 1) % (180L * 86400 * 1000))

    Page(url, ts, html, text, lang)
  }
}
