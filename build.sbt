ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cartographyspark"
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
// The round driver captures `sbt "runMain graft.Bench"` stdout and parses
// the LAST line as the bench JSON. sbt's "[success] Total time" footer
// lands after Bench's println and breaks that parse (BENCH_r01..r03 all
// have parsed:null). Suppress the footer so the JSON line is final.
Global / showSuccess := false
// Forked run output goes through sbt's logger by default, prefixing every
// line with "[info] " — which also breaks a last-line JSON parse. Write the
// forked process's stdout straight through instead.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys ++= Set(run / outputStrategy, Global / showSuccess)
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
  // The 299-query battery compiles ~4.4k Janino fragments in pass 1; their
  // nmethods occupy a MEASURED 175 MB of the JDK-17 default 240 MB code
  // cache at sf0.1 (per-query code_kb gauge in BENCH_FULL) — 73% full, no
  // headroom for battery growth before the sweeper starts flushing hot
  // kernels. Reserved ≠ committed, so the larger budget costs nothing.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "1g")}",
  // r12's one-query pass-2/3 blowup (analytics_exact_quantiles 5.4s →
  // 148.9s → 74.4s, task-CPU ×15 at identical task/stage census, jit_ms
  // FALLING, GC flat, code cache 73%, zero fresh fragment compiles) is the
  // signature of HotSpot abandoning a repeatedly-deoptimizing generated
  // kernel: after PerMethodRecompilationCutoff (default 400) recompiles the
  // method is made not-compilable and runs INTERPRETED for the JVM's life —
  // per-JVM-instance state, which is why three controlled re-runs of the
  // identical code+config+data never reproduced it. Raising the cutoff lets
  // the kernel recompile instead of being parked in the interpreter.
  "-XX:PerMethodRecompilationCutoff=10000",
)
