ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rvlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Shuffle/spill dir: tmpfs on THIS sandbox VM (virtio DISK READS run at
// ~30 MB/s burning kernel sys-time; writes are fine at ~370 MB/s —
// measured, see BENCH.md), so every shuffle read-back and spill re-read
// crawls on disk. A real cluster puts shuffle on fast local NVMe;
// /dev/shm is this VM's equivalent. Data tables stay on disk.
// GUARDED (round-4 verdict #4 / ADVICE): tmpfs converts disk spill into
// RAM, so a host without /dev/shm — or with a small one (< 4 GiB free) —
// falls back to the JVM tmpdir instead of failing shuffles with
// no-space/OOM; SPARK_GRAFT_LOCAL_DIR overrides either way.
val graftLocalDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.getUsableSpace > 4L * 1024 * 1024 * 1024) "/dev/shm"
  else System.getProperty("java.io.tmpdir")
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Dspark.local.dir=$graftLocalDir",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // GC default flipped to G1 on this VM generation: ParallelGC full GCs
  // death-spiral under the array-heavy set joins (measured 670 s GC in a
  // 32 s stage; dedup family 274-367 s vs 94 s under G1 on identical
  // input — BENCH.md). The old boot's "+20% ParallelGC" pipeline result
  // no longer reproduces; selectable for A/B via SPARK_GRAFT_GC.
  s"-XX:+${sys.env.getOrElse("SPARK_GRAFT_GC", "UseG1GC")}",
)
