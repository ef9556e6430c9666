ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gipsspark"
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
// Forked run output goes straight to this process's stdout without sbt's
// "[info] " log prefix — the bench/verify drivers parse the last stdout
// line as JSON and the prefix broke that (BENCH_r01.json "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and sbt's own "[success] Total time: ..." epilogue printed AFTER the
// forked run's JSON line broke a parse-the-last-line driver just the same
// (BENCH_r02.json "parsed": null with the JSON intact mid-tail). Silence it.
Global / showSuccess := false
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
  // 16g default: at local[32] over the 1.28e9-row headline input the old
  // 8g heap sat at the GC ceiling — tile-pass wall fluctuated 3.8-5.5s
  // run-to-run and join lost ~10%; 16g restores stable timings (the box
  // has 128 GiB). Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ParallelGC beats the G1 default by ~19% on the 32-thread headline
  // (77.6 vs 65.3 M rows/s, join 2.10s vs 2.88s measured A/B): this is a
  // batch-throughput workload with no latency SLO, exactly ParallelGC's
  // design point. Override with SPARK_GC.
  sys.env.getOrElse("SPARK_GC", "-XX:+UseParallelGC"),
)
