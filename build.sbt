ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pysparkxgboostspark"
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
// Forked run output must reach stdout unprefixed: the bench/verify
// drivers parse the one-line JSON Bench prints, and sbt's default
// LoggedOutput decorates every line with "[info] " which breaks that.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 96g default (round 18; was 8g): the box has 125 GiB and the brief's
  // target shape is local[32]/128 GiB. At 8g the 100x fixture's
  // aggregation-heavy queries were GC-bound, not plan-bound — q1_agg
  // measured 13-18s in the forked JVM vs 3.0s for the IDENTICAL plan at
  // a 100g heap, and per-query times swung 2-4x with heap state. Records
  // carry "heap_gb" so cross-regime totals can never be silently
  // compared (BASELINE.md "Heap regime").
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "96g")}",
)
