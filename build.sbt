ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mcpicebergduckdbspark"
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
// Forked run output goes RAW to this process's stdout/stderr instead of
// through sbt's logger — keeps Bench's one-line JSON un-prefixed (no
// "[info] ") so the driver can parse it from the captured stdout.
run / connectInput := true
outputStrategy := Some(StdoutOutput)
// Scratch dir for the forked JVMs: tmpfs when the host has it (the virtual
// disk intermittently stalls writes — see Sessions.scala), GRAFT_TMPDIR to
// override, and the stock java.io.tmpdir anywhere /dev/shm doesn't exist
// (macOS/Windows) so the build still loads there. Created before fork.
val graftTmp: Option[String] = {
  val pick = sys.env.get("GRAFT_TMPDIR").orElse {
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      Some("/dev/shm/graft-tmp")
    else None
  }
  pick.foreach(p => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p)))
  pick
}
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
  // pin the JVM zone too: java.sql.Timestamp literals must not shift on
  // non-UTC hosts
  "-Duser.timezone=UTC",
  // local[32] runs driver+executors in THIS one JVM: 8g forced old-gen
  // GC churn that inflated late-bench queries 3-10x over their isolated
  // times (r3: s_hybrid_search 10s in-bench vs 1.6s isolated). The box
  // has 125 GiB; give the single JVM a real share of it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
) ++ graftTmp.map(p => s"-Djava.io.tmpdir=$p").toSeq
