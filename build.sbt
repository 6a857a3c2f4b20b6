ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "csvtoparquetspark"
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
  // the 87-query bench session compiles ~42k JIT nmethods (~130 MB of
  // code); the JDK17 default 240 MB segmented code cache hits its
  // flushing threshold mid-run and the resulting evict/recompile churn
  // degraded EVERY query 2-30x (measured: full-surface bench 172.5 s
  // default vs 76.6 s with headroom, q39 35 s -> 2.1 s). Uniform
  // late-session inflation, invisible on short runs.
  "-XX:ReservedCodeCacheSize=1g",
  // the 171-query surface compiles ~5k distinct whole-stage-codegen
  // units per pass; Spark's generated-class cache holds only 100
  // (static conf, so set at JVM level for every forked main AND the
  // test harness). With the default, EVERY warm run of EVERY query
  // re-Janino-compiles its full plan (measured: q140 re-compiled 34-37
  // classes per warm run; full sf0.1 bench 120.4 -> 102.4 s with the
  // cache sized to hold the working set). Scale-neutral: compile churn
  // costs the same on cluster executors.
  s"-Dspark.sql.codegen.cache.maxEntries=${sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192")}",
)
