ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ccmapreducerspark"
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
// Pass the forked JVM's stdout through UNPREFIXED: by default sbt wraps
// forked output as "[info] ..." / "[error] ..." and appends its own
// "[success] Total time:" line, so the driver's tail parser never sees the
// bare compact-JSON line Bench prints last (BENCH_r{1..11}.json all have
// parsed:null for exactly this reason). StdoutOutput hands the child's
// stdout/stderr straight to the terminal. Project-level so run/runMain/test
// all inherit it via setting delegation.
outputStrategy := Some(StdoutOutput)
// ...and drop sbt's own "[success] Total time:" trailer, so the compact
// JSON line Bench prints last is the LITERAL last line of the sbt run.
showSuccess := false
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
// local[32] packs the whole "cluster" into this one JVM: at 8g the 32
// executor threads get ~250 MB each and shuffle-heavy queries spend their
// time in GC (and wobble run to run). 48g ≈ 1.5 GB/core, in line with a
// real executor's memory-per-core.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
