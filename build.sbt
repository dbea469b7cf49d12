ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mongodbcdcdeltaspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two sbt behaviors defeat that: the logger prefixes forked
// program output with [info], and sbt prints "[success] Total time: …"
// AFTER the program's summary line (BENCH_r07–r12 all recorded
// parsed:null because of it). StdoutOutput passes the forked JVM's
// stdout through untouched, and showSuccess drops the trailer — so the
// bench summary line is physically last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  // ImageIO (multimodal decode) must never touch a display
  "-Djava.awt.headless=true",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 128 GiB box; a small heap makes late queries in a long Bench run
  // pay accumulating GC. Overridable via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
