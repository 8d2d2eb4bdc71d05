ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "feastjavaoldspark"
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
// The bench/verify collectors keep only the last ~2000 chars of the sbt
// command's output and json-parse the LAST non-empty line, so the forked
// program must own the tail: no "[success] Total time" footer after it,
// and no "[info] " prefix wrapping its stdout (both broke BENCH_r06/r07).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
run / connectInput := false
outputStrategy := Some(StdoutOutput)
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
  // 16g: at 231 gate queries x 3 executions (warm-up + 2 timed) the 8g
  // heap spent the suite's tail in GC — driver-action-heavy queries
  // (pagerank loops, classifier training, the recall gate) measured
  // 1.5-3x hot purely from collector pressure on a 128 GiB box
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // gate queries x 3 runs of whole-stage codegen in one JVM emit far
  // more JIT-compiled code than the 240m default reserves; once the code
  // cache fills, the sweeper discards hot methods and timings get noisy
  "-XX:ReservedCodeCacheSize=768m",
)
