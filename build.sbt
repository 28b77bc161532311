ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "salesetlpipelinespark"
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
// Fixed-size heap: G1 heap expansion under load showed multi-second
// young-GC stalls (page commit); -Xms=-Xmx avoids them entirely.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc:$f").toSeq

// Parallel forked test groups (r18): the 24-suite run is 8 min
// wall in ONE forked JVM (suites strictly sequential), dominated by
// OpsSpec ~130 s, StreamingSpec ~64 s, SkewSpec ~63 s,
// RetrievalGraphSpec+PlanSpec ~85 s. Four JVMs sized by those
// measured suite walls bring the suite to ~max(group) ≈ 2.5 min at
// 4 × local[4] = 16 cores. Each group gets its OWN warehouse dir:
// BucketSpec/IndexMaintenanceSpec saveAsTable fixed table names, and
// two JVMs sharing ./spark-warehouse would race on the table dirs.
val testGroupOf: String => Int = {
  case "graft.OpsSpec" | "graft.CurateTextSpec" |
       "graft.AggMaintenanceSpec" => 0
  case "graft.StreamingSpec" | "graft.SkewSpec" |
       "graft.PipelineSpec" => 1
  case "graft.RetrievalGraphSpec" | "graft.PlanSpec" |
       "graft.IndexMaintenanceSpec" | "graft.RepartitionSweepSpec" |
       "graft.SourcesSpec" => 2
  case _ => 3
}
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val wh = target.value
  (Test / definedTests).value
    .groupBy(t => testGroupOf(t.name))
    .toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(
        name = s"g$i",
        tests = ts,
        runPolicy = Tests.SubProcess(ForkOptions().withRunJVMOptions(
          opts :+ s"-Dspark.sql.warehouse.dir=${(wh / s"test-warehouse-g$i").getAbsolutePath}")))
    }
}
// sbt's default caps concurrently running forked test groups at 1;
// lift it to the group count (and bound total parallelism sanely).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(16),
)
// Per-test durations in the report (-oD): group balance is maintained
// from measured suite walls, not guesses.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
