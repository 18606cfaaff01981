ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataengineeringassignmentspark"
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
// Forward the forked program's stdout verbatim (no "[info] " prefix):
// the bench driver json-parses the emitted line from stdout.
outputStrategy := Some(sbt.OutputStrategy.StdoutOutput)
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
// local[32] means 32 concurrent tasks sharing this ONE heap. Two measured
// lessons (round 2→3): (a) 8g starved 32 tasks to ~150 MB of execution
// memory each and the dedup queries collapsed into spill (11-25x); (b) an
// UN-pre-sized heap was just as bad the other way — G1 growing 2g→64g
// under load doubled-to-quadrupled first-run times (measured q41 20 s
// pre-sized-16g → 6.6 s). Fixed 16g: young collections stay fast, 32
// tasks get ~300 MB execution memory each, no growth stalls.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 74 queries x ~10 janino classes each (plus warmup copies) overflow
  // the 240 MB default code cache; the JIT then silently flushes hot
  // compiled methods and re-runs them interpreted — observed as
  // intermittent 5-10x slowdowns appearing MID-session.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_JVM").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
