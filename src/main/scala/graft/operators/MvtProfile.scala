package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage profiler for the MVT pipeline — times each stage of
  * the tile queries in isolation so a regression or optimization is
  * attributable to prep vs encode vs decode vs the final sort rather
  * than to the query as a whole. Not part of the bench or the
  * correctness surface; run with
  * `sbt "runMain graft.operators.MvtProfile"`.
  *
  * `SPARK_GRAFT_MVT_STAGES=C,F` runs a prefix-matched subset;
  * `SPARK_GRAFT_AGG_FALLBACK` overrides the ObjectHashAggregate
  * sort-fallback threshold (default mirrors Bench's scale-aware rule
  * — the pinned 10M of earlier rounds OOM'd a 24 GB JVM at sf1-size).
  */
object MvtProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfBytes: Long =
      try {
        val root = java.nio.file.Paths.get(sfDir)
        if (java.nio.file.Files.isDirectory(root)) {
          val st = java.nio.file.Files.walk(root)
          try st.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally st.close()
        } else 0L
      } catch {
        // conservative fallback for IO failures only — a fatal JVM
        // error (OOM, interrupt) must propagate, not read as "huge
        // input" (ADVICE r17)
        case scala.util.control.NonFatal(_) => Long.MaxValue
      }
    val aggFallback = sys.env.getOrElse("SPARK_GRAFT_AGG_FALLBACK",
      if (sfBytes <= 64L * 1024 * 1024 ||
          Runtime.getRuntime.maxMemory >= 40L * 1024 * 1024 * 1024)
        "10000000"
      else "128")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-mvt-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        aggFallback)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages: Option[Seq[String]] = sys.env.get("SPARK_GRAFT_MVT_STAGES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def time(name: String)(df: => DataFrame): Unit = {
      if (stages.exists(ps => !ps.exists(name.startsWith(_)))) return
      // warm once, then 3 timed runs; report each
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
    }

    val s = spark; val d = sfDir
    println("rows fan-out: " + MvtTiles.prepped(s, d).count())
    time("A0_features")(MvtTiles.features(s, d))
    time("A1_fanout_explode")(
      MvtTiles.tilesOf(graft.Tables.fanout(MvtTiles.features(s, d))
        .localCheckpoint(false)))
    time("A2_capped_noprep")(MvtTiles.cappedForProfile(s, d))
    time("A_prepped")(MvtTiles.prepped(s, d))
    time("B_stats_only")(MvtTiles.specs.head.fn(s, d))
    time("C_encode")(MvtTiles.tileBytes(s, d))
    time("D_decode_no_sort")(
      MvtTiles.decodedStats(MvtTiles.tileBytes(s, d))
        .sortWithinPartitions("zoom", "tile_x", "tile_y", "layer"))
    time("E_full_bytes_query")(
      MvtTiles.decodedStats(MvtTiles.tileBytes(s, d)))
    time("F_encode_stats")(MvtTiles.encodeStatsOf(MvtTiles.prepped(s, d)))
    time("G_encode_stats_stream")(
      MvtTiles.encodeStatsOfStreamed(MvtTiles.prepped(s, d)))
    time("H_encode_bytes_stream")(
      MvtTiles.encodeOfStreamed(MvtTiles.prepped(s, d)))
    spark.stop()
  }
}
