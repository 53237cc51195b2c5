package graft.tools

/** Cheap hypervisor-weather probe (~15 s, no Spark): prints the integer
  * and memory-bandwidth burn rates at 1/8/32 threads as one JSON line.
  * Use it to decide whether a full ScalingBench window is worth paying
  * for: an 8→32 window can only qualify in-band when the host is
  * granting ~4× integer capacity AND ≥3× memory bandwidth from 8 to 32
  * threads (BENCH.md round-5 scaling notes — the pipeline is
  * string-heavy, so a flat ~75 GB/s bandwidth grant caps scaling at the
  * 8-thread level no matter what the integer burn says).
  *
  * Usage: runMain graft.tools.WeatherProbe
  */
object WeatherProbe {
  def main(args: Array[String]): Unit = {
    import graft.bench.ScalingBench.{burnRate, memBurnRate}
    val b1 = burnRate(1); val b8 = burnRate(8); val b32 = burnRate(32)
    val m1 = memBurnRate(1); val m8 = memBurnRate(8); val m32 = memBurnRate(32)
    def r(hi: Double, lo: Double): String =
      if (lo > 0) f"${hi / lo}%.2f" else "-1"
    println(
      f"""{"metric":"weather","burn_1t":$b1%.0f,"burn_8t":$b8%.0f,"burn_32t":$b32%.0f,"int_8_32":${r(b32, b8)},"mem_1t_gbps":${m1 / 1e9}%.1f,"mem_8t_gbps":${m8 / 1e9}%.1f,"mem_32t_gbps":${m32 / 1e9}%.1f,"mem_8_32":${r(m32, m8)}}""")
  }
}
