ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "beatsspark"
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
  // local[32] with a string-heavy pipeline needs headroom — an 8g heap
  // GC-throttles the 32-thread benches (the host has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // deep generated plans (the 1k-rule chained-replace BPE fold used as the
  // kernel's equivalence oracle) recurse per tree node in analysis and
  // interpreted eval — the 1 MB default thread stack is not enough
  "-Xss16m",
) ++ (
  // ParallelGC beats G1 on this throughput-batch workload (measured: full
  // 64M-row transform 5.52→4.94 s at 8 threads, 2.20→2.05 s at 32); G1's
  // concurrent phases compete with the 32 worker threads for memory
  // bandwidth. SPARK_GRAFT_GC=g1 opts back out.
  if (sys.env.getOrElse("SPARK_GRAFT_GC", "parallel") == "parallel")
    Seq("-XX:+UseParallelGC") else Seq.empty
)
