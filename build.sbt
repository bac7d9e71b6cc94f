ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "botkoptelcotrafficsparkspark"
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
// Driver bench contract: `sbt "runMain graft.Bench"` must end stdout
// with ONE parseable JSON line. Two sbt defaults broke that in every
// round r08-r16 (BENCH_r*.json all carry parsed:null): the forked
// run's output was routed through sbt's logger (prefixing `[info] `),
// and sbt appended a `[success] Total time: ...` banner AFTER the
// JSON, so a literal-last-line parse read the banner. StdoutOutput
// inherits the parent's stdout/stderr (no prefix, Spark's stderr logs
// stay on stderr); showSuccess=false drops the trailing banner.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by another
// setting — exclude it from the unused-key lint so the warning block
// doesn't land in the driver's captured stdout
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
)
