package graft

import org.apache.spark.sql.SparkSession

/** Single-query probe: print the formatted physical plan for any
  * REGISTERED query (headline or not) and optionally time it with the
  * noop sink (guide §1.4). Usage:
  *
  *   tools/jrun.sh graft.ExplainOne <sfDir> <q1,q2,...> [warmups] [runs]
  *
  * With runs > 0 each query is warmed `warmups` times then timed
  * `runs` times; wall seconds plus THIS PROCESS's cpu-seconds per
  * sample go to stdout (the CPU figure is what distinguishes a
  * compute-bound candidate explosion from an I/O floor). Session
  * config mirrors Bench (SPARK_GRAFT_CPUS, scale-aware agg fallback)
  * so probe numbers are comparable with bench arms.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val warmups = if (args.length > 2) args(2).toInt else 1
    val runs = if (args.length > 3) args(3).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfBytes: Long =
      try {
        val root = java.nio.file.Paths.get(sfDir)
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      } catch { case _: Throwable => Long.MaxValue }
    val aggFallback = sys.env.getOrElse("SPARK_GRAFT_AGG_FALLBACK",
      if (sfBytes <= 64L * 1024 * 1024 ||
          Runtime.getRuntime.maxMemory >= 40L * 1024 * 1024 * 1024)
        "10000000"
      else "128")
    if (sfBytes >= DiskLock.HeavyInputBytes &&
        !sys.env.get("SPARK_GRAFT_DISKLOCK_HELD").contains("1"))
      DiskLock.acquire(s"graft.ExplainOne $sfDir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        aggFallback)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def procCpuSec(): Double =
      try {
        val self = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
        val rest = self.substring(self.lastIndexOf(')') + 2).split(" ")
        (rest(11).toLong + rest(12).toLong) / 100.0
      } catch { case _: Throwable => -1.0 }

    val qmap = SparkEntry.queries
    names.foreach { n =>
      val fn = qmap.getOrElse(n, sys.error(s"unknown query: $n"))
      val df = fn(spark, sfDir)
      println(s"==== $n plan ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      def once(): (Double, Double) = {
        val c0 = procCpuSec(); val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, procCpuSec() - c0)
      }
      if (runs > 0) {
        spark.sparkContext.setJobDescription(s"probe:$n")
        for (i <- 1 to warmups) {
          val (w, c) = once()
          println(f"==== $n warmup$i wall=$w%.2f s cpu=$c%.1f s")
        }
        val ws = for (i <- 1 to runs) yield {
          val (w, c) = once()
          println(f"==== $n run$i wall=$w%.2f s cpu=$c%.1f s")
          w
        }
        println(f"==== $n median wall=${Bench.median(ws)}%.2f s")
      }
    }
    spark.stop()
  }
}
