ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "weatherdataingestiongcpspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession (TestSpark) and several assert on
// physical plans or mutate runtime conf on derived sessions; running
// suites sequentially keeps those interactions deterministic.
Test / parallelExecution := false
run / fork := true
// Pass forked-run output straight through to sbt's own stdout/stderr
// instead of the LoggedOutput pipe that prefixes every line with
// "[info] " — the prefix broke the driver's BENCH json parse in rounds
// 1 and 2 ("parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Codegen class cache sized to the registry (round-16 measurement:
  // the default 100 entries thrashes across 176 queries × ~5
  // WholeStageCodegen/comparator units × 3 reps — every rep re-runs
  // Janino on plans whose generated source is identical, pure fixed
  // cost at any data scale). A long-lived multi-query engine JVM wants
  // the compiled-class cache to cover its working set; entries are
  // classes, not data, so the memory cost is a few hundred MB at most.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
  // 24g default: the single-JVM bench runs 110+ queries × 3 reps in
  // one session; at 8g the old gen fills with broadcast/codegen debris
  // and the embedding-heavy queries (per-row double[] allocation)
  // degrade into full-GC crawl — x10 measured 27.8s in-bench vs 3.2s
  // isolated at 8g, and uniformly recovers with headroom. The machine
  // has 128 GiB; executors are threads in this same JVM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
