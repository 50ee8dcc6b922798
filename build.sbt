ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributed_system_mapreducespark"
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
  // Catalyst codegen emits one Janino class per plan fragment; a full
  // Bench pass compiles hundreds. The JDK default 240 MB code cache
  // fills mid-run, the JIT stops compiling, and later queries execute
  // interpreted (measured: trivial 0.3 s queries degrade to 4-9 s once
  // the cache is full). Metaspace floor avoids threshold-triggered GCs
  // from the same class churn.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:MetaspaceSize=512m",
)
// Dev-only extra JVM flags for forked run/test (GC-profiling A/Bs, e.g.
// SPARK_GRAFT_JVM_EXTRA="-XX:G1HeapRegionSize=32m") — appended last so
// they override the defaults above.
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA")
  .toSeq.flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)

// forward stdin to forked runMain processes (graft.Cli REPL)
run / connectInput := true

// Pass the forked JVM's stdout/stderr through verbatim instead of
// re-logging each line with an "[info] " prefix: graft.Bench prints a
// machine-readable JSON line that downstream tooling parses from the
// tail of captured output, and the logger prefix broke that parse in
// every round so far. Also drop sbt's "[success] Total time" epilogue
// so the JSON line stays the last thing on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// outputStrategy is consumed by the run task at execution time and
// showSuccess by sbt's command engine; the unused-setting lint can't
// see either — exclude both from the check
Global / excludeLintKeys ++= Set(run / outputStrategy, Global / showSuccess)
