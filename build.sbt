ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdcviaflinkspark"
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
  // Whole-stage-codegen class cache (STATIC conf, default 100
  // entries): a 252-query session cycles ~1000+ distinct codegen
  // units, so at the default size every pass recompiles nearly every
  // stage (~20-50 ms Janino compile each). Sized to hold the whole
  // suite's units; the same setting is applied by GraftSession /
  // Bench for non-sbt launches. Driver-memory cost is the cached
  // classes (~KBs each) — negligible against the heap below.
  "-Dspark.sql.codegen.cache.maxEntries=10000",
  // local[N] puts all executor threads plus the SQL cache in this one
  // JVM; a fixed 8g forced cache eviction + GC churn that inflated
  // every query once the fuzzy-dedup family had persisted its
  // intermediates (measured: +0.5-1 s on unrelated queries). Size the
  // heap to the machine — 3/8 of physical RAM, clamped to [4g, 48g]
  // (48g on the 128 GiB bench box, 6g on a 16 GiB laptop) — with
  // SPARK_DRIVER_MEM as the explicit override.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val physGiB =
      try
        java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
          .getTotalMemorySize >> 30
      catch { case _: Throwable => 16L }
    s"${math.max(4L, math.min(48L, physGiB * 3 / 8))}g"
  })}",
)
