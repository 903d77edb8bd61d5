ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arcticspark"
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
// ChaosVerifySpec mutates the JVM-GLOBAL default TimeZone/Locale for the
// duration of a full-catalog pass; under sbt's intra-JVM parallel suite
// execution any concurrent spec touching ORC/date/formatter paths could
// flake nondeterministically. Isolate it in its own forked JVM.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  val (chaos, rest) = tests.partition(_.name.contains("ChaosVerifySpec"))
  Seq(
    Tests.Group("chaos-isolated", chaos, Tests.SubProcess(opts)),
    Tests.Group("main", rest, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
// Pass forked-run output through verbatim: sbt's default logger prefixes
// every line with [info]/[error], which breaks machine parsing of the one
// JSON line Bench/Verify print (BENCH_r01.json recorded "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and drop the trailing "[success] Total time: ..." line sbt prints after
// the forked run exits: the bench driver parses the LAST stdout line as JSON,
// and three rounds of BENCH_r*.json recorded "parsed": null because the
// success banner landed after Bench's JSON line.
Global / showSuccess := false
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
  // 24g default: the bench box has 128 GiB; an 8g heap showed multi-second
  // full-GC stalls under 32 concurrent local tasks (bench spikes moved
  // between queries run-to-run — classic ambient-GC signature).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
