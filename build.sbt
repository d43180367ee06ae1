ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "platypusingestionpluginsspark"
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
// The driver json-parses the bench's final stdout line; sbt's default
// LoggedOutput strategy for forked runs prefixes every line with
// "[info] ", which broke that parse in every round so far ("parsed":
// null in BENCH_r01–r17). StdoutOutput passes the forked process's
// stdout through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default: the bench fork runs 3 passes x 155 queries in one JVM
  // (index builds included) — 8g left old-gen pressure that showed up as a
  // board-wide lockstep slowdown in the r4 bench.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The JIT code cache defaults to 240 MB; a 250-query bench board
  // generates thousands of codegen classes, and once the code cache
  // fills HotSpot stops JIT-compiling (flushing/interpreted fallback
  // shows up as the board-size slowdown on common rows). 1 GB keeps
  // every generated class compiled across the 3 bench passes.
  "-XX:ReservedCodeCacheSize=1g",
)
