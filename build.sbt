ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "openaqlcsfetchspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the LAST
// stdout line as JSON. Two sbt behaviors have broken that for four
// rounds: the logger wraps forked-process output as `[info] {...}`,
// and a `[success] Total time...` line follows it. StdoutOutput makes
// the forked JVM's stdout pass through bare (no [info] prefix), and
// showSuccess=false suppresses the trailing [success] line — so the
// bench JSON is the literal final stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A long-lived local-mode Spark driver accumulates weak/soft refs
  // (one per RDD/broadcast/accumulator) by the million across a
  // 190-query bench session; G1's reference processing is serial by
  // default and shows up as GC-bound stages on the allocation-heavy
  // pair pipelines (PERF.md round 15: x20b mean 3.51 -> 2.95 s over a
  // 20-rep A/B with this flag, storms attributed via spread_profile).
  "-XX:+ParallelRefProcEnabled",
)
