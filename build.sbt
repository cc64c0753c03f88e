ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stadvdbolapspark"
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
// Forked runMain output normally passes through sbt's logger, which
// prefixes every stdout line with "[info] " — the harness parses the
// Bench/Verify JSON line out of raw stdout, and the prefix broke that
// (BENCH_r05/r06 both record "parsed": null). Inheriting stdout gives
// the driver clean lines; Spark's log4j noise stays on stderr.
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
  // 8g gave local[32] only ~250 MB/task and made the gram-explode
  // queries GC/spill-bound whenever the machine was otherwise busy
  // (driver round-6 bench: q_dup_ngrams 27 s vs 2 s clean); 24g keeps
  // the heavy shuffles in memory with plenty of host headroom
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
