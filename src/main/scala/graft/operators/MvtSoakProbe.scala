package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only sustained-load soak of the streamed .mbtiles container
  * writer: generates a decade-up spots workload (MvtScaleProbe's
  * generator), pushes the full encoded tile set through
  * `writeMbtilesOf`'s single-file streaming sink, and samples the
  * driver heap every 100 ms for the run's high-water mark — proving
  * the page-by-page SQLite writer and the `toLocalIterator` feed hold
  * driver memory FLAT while the artifact grows (the claim
  * SqliteFile's header makes). Run with
  * `sbt "runMain graft.operators.MvtSoakProbe [nEvents]"`.
  */
object MvtSoakProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-mvt-soak-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = spark.range(0, n).toDF("event_id")
      .select(col("event_id"),
        expr("timestamp_seconds(820483200 + event_id % 10000000)")
          .as("ts"),
        pmod(col("event_id"), lit(5000)).as("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .localCheckpoint()
    // materialize the tile BUILD up front (eager checkpoint): in local
    // mode executors share the driver JVM, so sampling across the
    // build would measure the 32-thread encode workspace, not the
    // sink; with the build already in block storage, the high-water
    // delta isolates what the page-streaming SINK itself adds
    val tiles = MvtTiles.encodeOf(MvtTiles.prepOf(MvtTiles.tilesOf(
      MvtTiles.spotFeatures(events)))).localCheckpoint()

    // settle, then record the baseline
    System.gc(); Thread.sleep(500); System.gc()
    val rt = Runtime.getRuntime
    def used(): Long = rt.totalMemory() - rt.freeMemory()
    val baseline = used()
    @volatile var high = baseline
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        val u = used()
        if (u > high) high = u
        Thread.sleep(100)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val out = java.nio.file.Files
      .createTempDirectory("graft_soak_").resolve("soak.mbtiles")
    val t0 = System.nanoTime()
    MvtTiles.writeMbtilesOf(spark, tiles, out, barrier = false)
    val secs = (System.nanoTime() - t0) / 1e9
    stop = true
    sampler.join()

    val fileMb = java.nio.file.Files.size(out) / 1e6
    val nTiles = graft.sources.SqliteReader.openMapped(out)
      .table("tiles").size
    println(f"[soak] events=$n tiles=$nTiles file=$fileMb%.1f MB " +
      f"write=$secs%.1f s heap_baseline=${baseline / 1e6}%.0f MB " +
      f"heap_high=${high / 1e6}%.0f MB delta=${(high - baseline) / 1e6}%.0f MB")
    java.nio.file.Files.deleteIfExists(out)
    spark.stop()
  }
}
