ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "incubatorxtablespark"
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
// -oD: print per-test durations — makes the suite's wall-clock budget
// attributable (which suites/tests own it) from any plain `sbt test` log
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// The driver parses ONE JSON line from the forked Bench JVM's stdout tail.
// Without an explicit strategy sbt decorates every forked-stdout line with
// "[info] ", so the driver's `line.startswith("{")` parser returned null for
// eleven straight rounds. StdoutOutput passes the child's stdout through raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Static conf (must be set before the context starts). The default
  // 100-entry codegen cache thrashes under a many-query session (each
  // gate plans dozens of codegen units; a 157-query suite recompiles
  // warm plans constantly — GateProbe showed 0.2-0.9 s of
  // CodeGenerator.doCompile per WARM gate run). Entries are weakly
  // keyed per classloader, so a bigger cache costs only live-session
  // memory; override via env for constrained drivers.
  s"-Dspark.sql.codegen.cache.maxEntries=${
    sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192")}",
) ++ sys.env.get("SPARK_GRAFT_EXCLUDED_RULES").map(r =>
  s"-Dspark.sql.optimizer.excludedRules=$r").toSeq

// ---------------------------------------------------------------------
// Glue SDK adapter: compile-only signature gate. The real AWS SDK is not
// resolvable offline, so the adapter compiles against a same-shape stub
// (deploy/glue-adapter/sdk-stub) — signature drift in GlueApi.scala now
// fails `sbt compile` instead of going unnoticed in a source-only file.
// Deployments swap the stub for the real software.amazon.awssdk:glue jar
// (see deploy/glue-adapter/README.md).
lazy val root: Project = (project in file("."))
  // the adapter gate rides `sbt test` (every CI round) — root's own
  // compile can't depend on it (glueAdapter needs root's classpath)
  .settings(Test / compile :=
    ((Test / compile)
      dependsOn (LocalProject("glueAdapter") / Compile / compile)
      dependsOn (LocalProject("hudiSyncTool") / Compile / compile)).value)

lazy val glueAdapter: Project = (project in file("deploy/glue-adapter"))
  .dependsOn(root)
  .settings(
    name := "graft-glue-adapter",
    unmanagedBase := file("/opt/spark/jars"),
    Compile / unmanagedSourceDirectories +=
      baseDirectory.value / "sdk-stub" / "src" / "main" / "scala",
    Test / sources := Nil,
    publish / skip := true,
  )

// Hudi foreign-writer post-commit hook: same compile-only gate pattern.
// GraftHudiSyncTool extends Hudi's public HoodieSyncTool SPI (stubbed,
// same shape); a deployment compiles against the real hudi-sync-common.
lazy val hudiSyncTool: Project = (project in file("deploy/hudi-sync-tool"))
  .dependsOn(root)
  .settings(
    name := "graft-hudi-sync-tool",
    unmanagedBase := file("/opt/spark/jars"),
    Compile / unmanagedSourceDirectories +=
      baseDirectory.value / "spi-stub" / "src" / "main" / "scala",
    Test / sources := Nil,
    publish / skip := true,
  )
