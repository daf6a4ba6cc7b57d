ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aced_etl_podspark"
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
// Forked run output goes straight to stdout (no sbt [info] log framing) so
// the driver can json-parse the Bench/Verify result lines from the raw log.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and no "[success] Total time" trailer: the driver parses the LAST
// stdout line of a bench run as JSON; sbt's success banner after the
// forked process's output is exactly what turned BENCH_r0*.json's
// "parsed" field null. Exit code still signals failure.
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
// The container locale is POSIX (platform charset ANSI_X3.4-1968): any
// platform-default decode turns non-ASCII bytes into U+FFFD. Pin UTF-8 at
// both the compiler (source files carry §/—/→ in scaladoc and literals)
// and every forked JVM (doc generators read-modify-write SURVEY.md).
ThisBuild / scalacOptions += "-encoding"
ThisBuild / scalacOptions += "utf-8"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The 338-query catalog compiles ~1,000 whole-stage-codegen units;
  // measured code-cache occupancy is ~200 MB, above the default
  // segmented reserve's per-segment caps (240 MB total → ~117 MB
  // profiled / ~117 MB non-profiled), so at the default size the
  // sweeper flushes hot compiled code continuously and every query
  // pays re-JIT on every pass — the round-9 "catalog-wide warm drift"
  // (1.64× on unchanged queries). With headroom: bench pass walls
  // 1102 → 543 → 419 s and pass-1 JIT thread time 515 s drops to
  // ~90 s by pass 3 (bench artifact jit_ms/code_cache_mb columns).
  "-XX:ReservedCodeCacheSize=1024m",
) ++
  // extra forked-JVM flags for rig experiments (e.g.
  // SPARK_GRAFT_JAVA_OPTS="-XX:+UseParallelGC" for the allocator-churn
  // soaks in docs/SCALE.md) without editing the build
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
