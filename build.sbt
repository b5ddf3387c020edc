ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "covsonarspark"
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
// Forked run output passes straight through to stdout/stderr (no sbt
// "[info]" prefix) so the driver can parse Bench's single JSON line.
// Unscoped: `runMain` does NOT delegate to `run / outputStrategy`, so a
// run-scoped setting silently leaves `sbt "runMain graft.Bench"` prefixed.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's "[success] Total time: …" trailer: Bench prints its JSON
// artifact line LAST, and any sbt chatter after it lands inside the
// driver's bounded tail capture and defeats last-line JSON parsing (the
// r10/r11 `parsed: null` artifacts). This makes the JSON line genuinely
// the final stdout line no matter how sbt is invoked.
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — lint can't see that
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
  // JDK17 G1's GCLocker retry default is 2: with 32 task threads inside
  // native (zlib/parquet) JNI critical sections, an allocating thread can
  // throw a SPURIOUS OutOfMemoryError ("Retried waiting for GCLocker too
  // often allocating 4 words") with gigabytes free — hit reproducibly by
  // the sf10 bench at stage ~1909 (g1's checkpoint unroll) and gone with
  // a sane retry budget.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
// Surface deprecation sites explicitly (the default only counts them).
scalacOptions += "-deprecation"
// ClusterModeSpec boots a local-cluster[2,2,1024] master (real executor
// JVMs), which cannot share a JVM with the suite-wide local[4] session every
// other spec uses — one SparkContext per JVM — so it runs in its own forked
// test JVM; everything else keeps sharing one.
Test / testGrouping := {
  val (cluster, rest) = (Test / definedTests).value
    .partition(_.name == "graft.ClusterModeSpec")
  val opts = (Test / forkOptions).value
  Seq(Tests.Group("cluster-mode", cluster, Tests.SubProcess(opts)),
      Tests.Group("default", rest, Tests.SubProcess(opts)))
    .filter(_.tests.nonEmpty)
}
