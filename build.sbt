ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ticktockspark"
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
// The driver parses Bench's ONE-LINE JSON from this process's stdout.
// Default LoggedOutput re-emits the forked child's stdout as "[info] ..."
// lines and appends "[success] Total time ...", so a bare-JSON-line
// parser finds nothing (every BENCH_r01..r16.json: parsed: null).
// StdoutOutput passes child stdout through raw; showSuccess drops the
// trailing [success] line so the JSON stays the LAST stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command loop, not a task — exclude it from
// the unused-key lint so its [warn] block doesn't precede the run.
Global / excludeLintKeys += showSuccess
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
  // 48g: the full 98-query bench sweep accumulates enough shuffle/cache
  // state that a 16g heap spends multi-second GC pauses inside timed
  // regions (measured: pl_dedup_clusters 10.8s at 16g vs 1.9s at 48g on
  // the same plans); the machine has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
