package graft.synth

/** SplitMix64 PRNG (public domain algorithm, Steele et al. 2014) — the
  * deterministic seed → stream used by the page generator. Pure function of
  * (seed); no shared state, so generation is embarrassingly parallel across
  * Spark partitions: each row derives its own generator from its index.
  */
final class SplitMix64(seed0: Long) {
  private var state = seed0

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, n). */
  def nextInt(n: Int): Int = {
    require(n > 0)
    ((nextLong() >>> 1) % n).toInt
  }

  /** Uniform in [0.0, 1.0). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

object SplitMix64 {
  /** Stateless single-step mix — for deriving per-(row, tag) sub-seeds. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
