ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusionsqlgenspark"
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
// Pass the forked app's stdout through UNPREFIXED: the default
// LoggedOutput strategy prepends "[info] " to every line, which
// defeats any line-wise JSON parse of Bench/Verify output (13 rounds
// of BENCH_r*.json carried "parsed": null because the final summary
// line arrived as `[info] {...}`). StdoutOutput writes the raw bytes.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop the trailing "[success] Total time:" line, so the
// bench's compact JSON summary is the LAST stdout line a bounded
// tail capture sees.
Global / showSuccess := false
Global / excludeLintKeys ++= Set(
  run / outputStrategy, Compile / run / outputStrategy, showSuccess)
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
// ── Test wall-clock (round 20) ────────────────────────────────────
// One forked JVM ran every suite SEQUENTIALLY on its 4-core local
// session — 28½ minutes on a 32-core box, which overran the external
// test budget (round 19's third-party run was cut off mid-suite with
// zero failures). The suites are independent — each JVM builds its
// own SparkSession (SparkSpec.session), temp roots are per-run
// unique, the sf inputs are read-only — so split them into forked
// GROUPS and let sbt run the groups concurrently. Coverage is
// unchanged: same suites, same tests, same assertions; only the
// process layout differs. Group count × local[4] session × -Xmx8g
// fits the 128 GiB box with ample slack. Suites are DEALT by name
// round-robin, which splits the alphabetical clusters of heavy
// suites (Cow*/Corpus*, SqlGen*) across groups.
val testForkGroups = 6
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val fo = ForkOptions().withRunJVMOptions(opts)
  (Test / definedTests).value.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % testForkGroups).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"fork$i", ts.map(_._1), Tests.SubProcess(fo))
    }
}
// let the forked groups actually overlap (sbt's default tag limits
// would serialize them); everything else keeps a CPU-bound cap
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkGroups),
  Tags.limitAll(testForkGroups + 2))
// per-test durations in the output — the profiling that sized the
// groups, kept on so future rounds see where the time goes
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
