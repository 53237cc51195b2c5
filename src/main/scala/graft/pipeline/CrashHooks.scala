package graft.pipeline

/** Crash-injection seam for the resume proof (CrashResumeSpec): lets a
  * CHILD-PROCESS harness halt its own JVM at a chosen point inside a
  * pipeline run — `Runtime.halt`, not `sys.exit`, so no shutdown hooks,
  * no committer cleanup, no stream flushing run: the closest in-process
  * moral equivalent of a SIGKILL / OOM-kill / node loss.
  *
  * Production behavior is untouched: the hook is a no-op unless the
  * process explicitly arms it (only graft.tools.CrashResumeChild does).
  */
private[graft] object CrashHooks {

  /** Halt after this many checkpoint manifests have been written
    * (−1 = disarmed). Landing BETWEEN manifest writes is the interesting
    * crash window: output data already visible, some buckets' lineage
    * committed, the rest not. */
  @volatile var haltAfterCheckpoints: Int = -1

  private val written = new java.util.concurrent.atomic.AtomicInteger()

  def onCheckpointWritten(): Unit =
    if (haltAfterCheckpoints >= 0 &&
        written.incrementAndGet() >= haltAfterCheckpoints)
      Runtime.getRuntime.halt(137)
}
