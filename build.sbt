ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ferendaspark"
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
  "-Dfile.encoding=UTF-8",
  // local mode = single JVM; the box has 125 GiB and the bench pipeline
  // persists ~1 GiB of stage data per run — 8g caused GC pressure at
  // higher thread counts
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The VM advertises 32 CPUs but delivers ~4.4 (BENCH_SCALING.md), and
  // the JVM cannot see the hypervisor cap — defaults would run ~23
  // parallel GC threads that thrash every stop-the-world pause. The
  // throughput collector with thread counts sized to DELIVERED capacity
  // cuts both pause wall time and the G1 write-barrier tax on the
  // allocation-heavy parse path. On a production executor the JVM sizes
  // GC threads from the visible cgroup limit, so this is the local
  // equivalent, overridable via SPARK_GRAFT_GC_THREADS.
  "-XX:+UseParallelGC",
  s"-XX:ParallelGCThreads=${sys.env.getOrElse("SPARK_GRAFT_GC_THREADS", "4")}",
)

// POSIX locale on the runner makes the forked JVM map non-ASCII
// filenames (the reference Swedish-named fixtures) to
// InvalidPathException — sun.jnu.encoding only follows the OS locale
Test / envVars += "LANG" -> "C.UTF-8"
run / envVars += "LANG" -> "C.UTF-8"
