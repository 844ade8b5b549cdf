ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hdkspark"
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
// The forked program's stdout must land BARE on the process stdout: sbt's
// default LoggedOutput re-emits every line through its logger with an
// "[info] " prefix, which is why the driver's bare-JSON-line parse of the
// Bench record failed in every round (BENCH_r*.json parsed:null). With
// StdoutOutput the one-line JSON record is the program's own last line.
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
  // 28g: local[32] holds all executor state in one JVM; the bench's
  // ~100 queries each persist/checkpoint intermediates — 8g showed
  // eviction-driven slowdowns late in a pass, and at 16g the old-gen
  // debt of 103 queries still leaked ~10% into timed regions (measured
  // 103.1s vs 93.2s same-commit at sf0.1). Single-JVM artifact only:
  // a cluster's executors don't share one heap with the whole suite.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)
// Ad-hoc -D flags for config experiments (e.g. A/B-ing an AQE setting
// through QTime without a code edit): GRAFT_JAVA_OPTS="-Dspark.x=y ..."
javaOptions ++= sys.env.get("GRAFT_JAVA_OPTS")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
  .getOrElse(Seq.empty)
