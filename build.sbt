ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kickhouseiti_graduate_projectkafkasparkairflowgcp_warehousepowerbispark"
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
// Forked `run` output must pass through UNDECORATED: the bench driver
// parses a bare one-line JSON metric from stdout, and sbt's default
// LoggedOutput strategy prefixes every child line with "[info] " /
// "[error] " (which broke round-1 bench parsing — BENCH_r01.json
// "parsed": null).
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Parallel forked test groups. The streaming suites are trigger-latency-
// bound, not CPU-bound — serialized in one JVM they alone were ~5½ min of
// an 8-10 min suite wall. Each group forks its own JVM (own SparkSession,
// own temp warehouse dir — no shared-session races by construction), and
// up to 6 groups run concurrently. Heavy suites (measured r6) are pinned
// to spread the tail; unknown/new suites land in the light catch-all
// group. Wall clock ≈ the slowest group, not the sum.
val testGroupOf: String => Int = {
  val pinned = Map(
    "graft.StreamingRestartSpec" -> 0,
    "graft.StreamingJoinSpec" -> 1,
    "graft.StreamingSpec" -> 2,
    "graft.StatefulSpec" -> 3,
    "graft.StreamDedupSpec" -> 3,
    "graft.MaintenanceSpec" -> 3,
    "graft.ExtSpec" -> 4,
    "graft.SnapshotsSpec" -> 4,
    "graft.PlanSweepSpec" -> 6) // ~2 min solo: the whole-surface sweep
  name => pinned.getOrElse(name, 5)
}
Test / testGrouping := {
  val opts = (Test / forkOptions).value
  (Test / definedTests).value.groupBy(t => testGroupOf(t.name)).toSeq
    .sortBy(_._1)
    .map { case (i, ts) => Tests.Group(s"g$i", ts, Tests.SubProcess(opts)) }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(12))
