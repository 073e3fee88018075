ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "threadbasedmapreducespark"
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
// LocalClusterSpec owns a local-cluster SparkContext (forked executor JVMs
// via the standalone launcher, which needs SPARK_HOME/SPARK_SCALA_VERSION);
// a JVM holds one SparkContext, so it runs in its own forked test JVM.
// Honor an externally-set SPARK_HOME so a machine with Spark elsewhere still
// runs the local-cluster group; LocalClusterSpec cancels with an explicit
// message when the launcher prerequisites are absent.
Test / envVars := Map(
  "SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"),
  "SPARK_SCALA_VERSION" -> sys.env.getOrElse("SPARK_SCALA_VERSION", "2.13"))
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
    .withWorkingDirectory((Test / baseDirectory).value)
  val (cluster, rest0) = (Test / definedTests).value
    .partition(_.name.endsWith("LocalClusterSpec"))
  // SpeculationSpec needs spark.speculation=true, which the TaskScheduler
  // reads once at init — so it owns a SparkContext in its own JVM too.
  val (speculation, rest) = rest0.partition(_.name.endsWith("SpeculationSpec"))
  Seq(Tests.Group("default", rest, Tests.SubProcess(forkOpts)),
      Tests.Group("local-cluster", cluster, Tests.SubProcess(forkOpts)),
      Tests.Group("speculation", speculation, Tests.SubProcess(forkOpts)))
    .filter(_.tests.nonEmpty)
}
// The bench driver parses the LAST stdout line as JSON; sbt's trailing
// "[success] Total time: ..." line otherwise shadows Bench's JSON output,
// and the default fork output strategy prefixes every stdout line with
// "[info] ", which un-JSONs it.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
// Heap is pinned, NOT taken from SPARK_DRIVER_MEM: a ~100 GB -Xmx makes the
// JVM page-commit/GC-stall for tens of seconds at random points, turning the
// bench into noise (the identical sf0.1 suite runs ~24 s at 8g vs ~470 s at
// 100g). 16g is ample for sf0.1 on local[32].
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Xmx16g",
)
