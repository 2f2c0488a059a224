ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arrowparquetlogsspark"
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
// Forked run output goes straight to stdout with NO "[info] " prefix:
// the bench harness's one-line JSON must be machine-parseable as-is
// (a log-framed line is what left BENCH_r02 with parsed=null).
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] = 32 concurrent tasks in one heap; 8g left ~150 MB of
  // execution memory per task slot and pushed document-explode queries
  // into spill churn. But the heap must also leave the OS room for the
  // RAM-backed scratch dir (Scratch.scala) plus page cache: a 48g heap
  // never GC'd, dead shuffle blocks piled up in tmpfs, and the 100-query
  // bench hit reclaim stalls (825 s total vs 183 s). 16g ≈ 300 MB of
  // unified memory per slot with >100 GiB left for scratch + cache.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
