ThisBuild / scalaVersion := "2.13.17"
ThisBuild / scalacOptions += "-deprecation"
ThisBuild / version := "0.1.0"
name := "pydatalakemovefilesspark"
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
// Forked stdout must bypass the sbt logger: the bench driver parses the
// final stdout line as bare JSON, and sbt's default output strategy
// prefixes every line with "[info] " (and appends its own "[success]
// Total time" trailer AFTER the program's output), which broke the
// parse for four rounds. StdoutOutput drops the prefix; showSuccess
// := false drops the trailer, so the bench's JSON line is genuinely
// the last line of stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude
// it from the unused-key lint
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
  // javax.imageio (the multimodal decode path) must never try to talk
  // to a display server from executor threads
  "-Djava.awt.headless=true",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector for this batch workload: JDK 17 defaults to
  // G1, which trades throughput for pause-time goals no batch job
  // has. Measured on a 15-query mixed bench subset (min-of-2,
  // local[32], sf0.1): 26.9 s under G1 vs 23.4 s under ParallelGC —
  // the allocation-heavy dedup/minhash family alone dropped ~30%
  // (d_minhash_bbit 3.9 -> 2.6 s). Overridable via GRAFT_GC=UseG1GC.
  // Allowlisted: a typo'd/empty GRAFT_GC would otherwise interpolate
  // into a malformed -XX flag that aborts every forked JVM at startup
  // with a far-from-the-cause error.
  s"-XX:+${
    val gc = sys.env.getOrElse("GRAFT_GC", "UseParallelGC")
    val allowed = Set("UseParallelGC", "UseG1GC", "UseZGC", "UseSerialGC")
    require(allowed.contains(gc),
      s"GRAFT_GC must be one of ${allowed.mkString(", ")}; got '$gc'")
    gc
  }",
)
