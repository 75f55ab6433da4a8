ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinks3readwritespark"
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
// The bench driver keeps only the last ~2000 chars of stdout; sbt's
// trailing "[success] Total time: ..." line would push the head of the
// bench summary JSON line out of that window. Suppress it.
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
// Route the forked run's stdout straight through, without sbt's logger
// "[info] " prefix: the bench driver parses the LAST stdout line as JSON
// and the prefix alone defeats that parse (BENCH_r05 recorded
// "parsed": null even though the summary line fit the 2000-char tail).
run / connectInput := false
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
  // local[32] with a noop-sink bench over 50+ queries needs real heap
  // headroom: at 8g the late-running queries were GC-inflated ~10x over
  // their warm truth (the host has 128 GiB; 24g keeps full-bench GC flat).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// ---- parallel test execution (r20) ----
// The sequential suite ran ~40 min in ONE forked JVM — past the round
// driver's verification budget (VERIFY_r19 recorded tests_ok=false with
// an all-passing tail: a timeout, not a failure). One forked JVM per
// SUITE, up to 8 concurrent: each suite's SparkSession is local[4]
// (SparkSpec), so 8 × 4 saturates the 32-core box; per-suite
// java.io.tmpdir and spark.sql.warehouse.dir (Spark adopts spark.*
// system properties into SparkConf) keep fixture paths and saveAsTable
// tables collision-free. Wall time ≈ slowest suite + sum/8.
Test / testGrouping := {
  val forkOpts = jdk17AddOpens ++ Seq(
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
    // tiny test data at local[4] — 8g per JVM keeps 8 concurrent JVMs
    // well under the box's 128 GiB while leaving GC headroom
    s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "8g")}")
  (Test / definedTests).value.map { t =>
    val tmp = s"/tmp/graft-tests/${t.name.replaceAll("[^A-Za-z0-9.]", "_")}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    Tests.Group(t.name, Seq(t), Tests.SubProcess(ForkOptions()
      .withRunJVMOptions((forkOpts ++ Seq(
        s"-Djava.io.tmpdir=$tmp",
        s"-Dspark.sql.warehouse.dir=$tmp/warehouse")).toVector)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(16))
