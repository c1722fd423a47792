ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "openskidataprocessorspark"
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
// Partition the suite across 4 forked JVMs, each with its own
// local[4] SparkSession: suites are independent (per-JVM shared
// session, temp-dir fixtures, no cross-suite files except
// TpchScaleSpec's target/scaffolds cache which only it touches), and
// one JVM left ~28 of 32 cores idle. The heaviest suites are placed
// in distinct groups so no group inherits two of them.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val n = 4
  val heavy = Seq("graft.LlmOpsSpec", "graft.ScenarioSpec",
    "graft.TileExtractSpec", "graft.TilesStreamingSpec",
    "graft.ClusteringSpec", "graft.PlanPinSpec",
    "graft.GeoJsonlSourceSpec", "graft.QualityModelSpec")
  val (h, rest) = tests.partition(t => heavy.contains(t.name))
  val groups = Array.fill(n)(Vector.newBuilder[TestDefinition])
  h.sortBy(t => heavy.indexOf(t.name)).zipWithIndex
    .foreach { case (t, i) => groups(i % n) += t }
  rest.sortBy(_.name).zipWithIndex
    .foreach { case (t, i) => groups(i % n) += t }
  groups.toSeq.zipWithIndex.map { case (g, i) =>
    Tests.Group(s"g$i", g.result(), Tests.SubProcess(forkOpts)) }
}
// sbt's default restriction runs forked test groups one at a time —
// allow the four groups to run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limitAll(8), Tags.limit(Tags.ForkedTestGroup, 4))
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
)
