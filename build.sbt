ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "serverlessetlreportingpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one thread-safe SparkSession (TestSpark) and were built
// for concurrency: lake/corpus builders are exactly-once via graft.etl.Memo,
// streaming memory sinks draw unique names from an atomic counter. Running
// the 27 suites in parallel inside the forked JVM cuts the wall-clock of
// `sbt test` severalfold (the suite is dominated by many small Spark jobs,
// not by any single saturating one).
Test / testForkedParallel := true
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 47 queries × whole-stage codegen in one JVM overflow the default
  // 240 MB JIT code cache; once full the JVM stops compiling and later
  // queries run interpreted (observed as a progressive 5-20× bench
  // slowdown). Size it for the full inventory and let cold methods flush.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // Wide whole-stage-codegen methods (e.g. the 64-min MinHash aggregate)
  // exceed HotSpot's 8000-bytecode DontCompileHugeMethods limit and would
  // otherwise run interpreted FOREVER (q37 benched 56s -> 2s with this).
  "-XX:-DontCompileHugeMethods",
  // ~190 queries of whole-stage codegen saturate the default C2 compile
  // queue (sized for ~4 compiler threads): a query whose generated code
  // is stuck in queue runs interpreted for its entire measurement, which
  // showed up as 5-10x first-run cliffs IN-SUITE that vanish isolated
  // (r10: q191 13.5s in-suite vs 1.1s isolated, q105 6.6 vs 3.0). 16
  // compiler threads on this 32-core box drain the queue in time: same
  // suite total, per-query spread collapses to <2x suite-wide. (-Xbatch
  // also cures the cliffs but costs +30% total; measured, rejected.)
  "-XX:CICompilerCount=16",
) ++ sys.env.get("GRAFT_EXTRA_JVM").toSeq.flatMap(_.split(" "))
