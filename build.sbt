ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rasterframesspark"
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
  // The 350-query bench generates thousands of codegen classes; the JDK17
  // default 240 MB code cache fills mid-suite, HotSpot stops JIT-compiling,
  // and codegen'd operators run INTERPRETED at ~10x until the sweeper frees
  // space (r16's confirmed q_mean_pool 10.9s-in-suite/0.39s-isolated
  // artifact; r19 baseline reproduced it on q_ljung_box 14.9s-in-suite/
  // 1.2s-isolated). bench_stability.sh has carried this flag since r16;
  // the sbt runMain path (what the driver's BENCH_r*.json measures) now
  // matches it.
  "-XX:ReservedCodeCacheSize=1g",
)
