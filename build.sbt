ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "shcspark"
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
// Pass the forked run's stdout through RAW instead of re-logging each
// line behind an "[info] " prefix: Bench prints ONE machine-readable
// JSON line that downstream tooling parses from captured stdout, and the
// sbt logger prefix has kept that record unparseable for two rounds.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The 169-query suite JIT-compiles thousands of whole-stage-codegen
  // classes in one JVM; the JDK default 240 MB code cache fills before the
  // late-alphabet (sv) queries run, and the resulting sweeping/interpreted
  // fallback measured 2-3x on them (sv4 6.5 -> 2.4 s, sv2 2.3 -> 0.8,
  // px11 3.3 -> 1.4 at 512 MB). Pure JVM capacity, no behavior change.
  "-XX:ReservedCodeCacheSize=512m",
)
