ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tfxaddonsfeastexamplegenspark"
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
// Pass forked-run output through unprefixed: the bench/verify harness
// parses the JSON metric line from sbt stdout, and the default logger
// buries it under an "[info] " tag.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop sbt's trailing "[success] Total time: ..." line: the harness
// keeps only a bounded tail of stdout, and those ~75 chars come AFTER
// the bench JSON line — with 78 per-query timings the line needs every
// byte of that window.
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // A 200-query sweep generates thousands of unique whole-stage-codegen
  // classes in one JVM; at the JVM default (240m) the code cache fills
  // mid-sweep and HotSpot starts flushing/declining compiles, leaving
  // hot generated methods interpreted — measured as bimodal 4-13x
  // slowdowns of expression-heavy stages late in long runs (same
  // stage: 74 vs 999 task-CPU-seconds). Not a local-mode tweak: any
  // long-lived driver/executor JVM running this many distinct plans
  // needs code-cache headroom.
  "-XX:ReservedCodeCacheSize=1g",
  // Whole-stage codegen fuses a 9-table join cascade + scoring
  // arithmetic into single generated methods that exceed HotSpot's
  // huge-method bytecode limit (8000); by default such methods are
  // NEVER JIT-compiled and run in the bytecode interpreter — measured
  // at 310 µs/row (295 task-CPU-seconds) on the order-5 scoring
  // stage. Standard JVM setting for wide Spark plans; pairs with the
  // enlarged code cache above.
  "-XX:-DontCompileHugeMethods",
)
