ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatausaspendingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession (and ExtensionsSpec briefly swaps the
// default session) — run them sequentially for determinism
Test / parallelExecution := false
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
// Default driver heap DERIVED from physical memory (ADVICE r15: a
// fixed 48g default tuned to the 125 GiB box would OOM-kill or swap a
// smaller contributor/CI machine): 40% of MemTotal, clamped to
// [8g, 48g] — 48g on the 125 GiB box (the r14 eviction fix: the
// bench/verify JVM holds the memoized localCheckpoints of 270+
// queries in ONE session, and at 8g those MEMORY_AND_DISK blocks
// evict to disk, inflating the checkpoint-heavy PQ/IVF-PQ family
// 1.35-1.6x), 8g floor elsewhere. SPARK_DRIVER_MEM overrides.
val defaultHeapGb: Int = {
  val memTotalKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal")).map(_.replaceAll("[^0-9]", "").toLong)
      .getOrElse(0L)
    catch { case _: Throwable => 0L }
  math.max(8, math.min(48, (memTotalKb * 2 / 5 / (1024 * 1024)).toInt))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)
