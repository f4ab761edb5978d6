ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "amazons3findandforgetspark"
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
// Bench/Verify print ONE machine-parsed JSON line; keep stdout clean of
// harness framing around it: forked mains write to the real stdout (no
// "[info] " prefix) and sbt's trailing "[success] Total time" banner is
// off, so the JSON line is the LAST stdout line of `sbt runMain`.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by sbt's logger, lint can't see it
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
// The full-corpus robustness sweeps (tag graft.Sweeps — each replays
// all gate queries over a cloned pathology corpus, minutes apiece)
// dominated the ~35-min `sbt test` wall. Default `sbt test` excludes
// them so the edit-compile-test loop stays fast; `sbt sweeps` runs
// ONLY the sweeps, `sbt testAll` runs everything. Run the sweeps once
// per round and before any commit touching their subject area — the
// exclusion changes WHEN they run, never whether.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest,
  "-l", "graft.Sweeps")
addCommandAlias("sweeps",
  "; set Test / testOptions := Seq(Tests.Argument(TestFrameworks.ScalaTest, \"-n\", \"graft.Sweeps\")); test")
addCommandAlias("testAll",
  "; set Test / testOptions := Seq(); test")
