ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ctatraintrackeranalyticsspark"
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
// The bench/verify drivers parse the LAST stdout line as JSON; sbt's
// "[success] Total time: ..." footer would otherwise follow the metric
// line and break that parse (BENCH_r01/r02 "parsed": null). StdoutOutput
// keeps the forked child's stdout un-prefixed (no "[info] ").
Global / showSuccess := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
scalacOptions ++= Seq("-deprecation")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32g default: local[32] runs 32 concurrent tasks in ONE JVM — at 8g the
  // unified memory pool left ~70 MB of execution memory per task once
  // memoized localCheckpoint blocks claimed their protected storage share,
  // putting shuffle-heavy queries at the spill boundary (run-to-run
  // variance). The box has 128 GiB; a real 32-core executor would get
  // comparable headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
