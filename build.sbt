ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "clickhousetablecopierspark"
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
// Round 1 post-mortem: the driver captured `sbt "runMain graft.Bench"` stdout
// but every line carried sbt's `[info]` prefix (default LoggedOutput for
// forked runs), so BENCH_r01.json came back unparsed. StdoutOutput passes the
// forked JVM's stdout through verbatim — the bench JSON is a clean line.
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
// Heap sizing: on this VM an oversized lazily-committed heap causes
// multi-second allocation stalls (first-touch page faults froze the JVM long
// enough for Spark to time out 10s RPCs to itself; a 22-query bench went
// 637s -> 47s by shrinking 48g -> 4g). Keep the heap modest and pre-touch it
// once at startup so no faults land mid-query.
val driverHeap = sys.env.getOrElse("SPARK_DRIVER_MEM", "4g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms$driverHeap", s"-Xmx$driverHeap", "-XX:+AlwaysPreTouch",
  "-XX:ReservedCodeCacheSize=512m",
)
