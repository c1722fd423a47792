package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only one-decade-up probe for the MVT core: generates an
  * sf1-scale spots workload (1M events — 10x the sf0.1 table, ~9M
  * exploded feature-tile rows) and times the
  * spotFeatures→tilesOf→prepOf→encodeOf pipeline, so the scaling
  * claim for the engine's heaviest fan-out rests on a measured point
  * one decade past the bench, not on extrapolation. Run with
  * `sbt "runMain graft.operators.MvtScaleProbe [nEvents]"`.
  */
object MvtScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-mvt-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // decade-up probes stage tens of GB of generated input + shuffle
    // spill by design — serialize against any concurrent disk-heavy
    // phase unconditionally (VERDICT r17 #2; same lock as Verify/Bench)
    graft.DiskLock.acquire(s"graft.operators.MvtScaleProbe n=$n")

    val events = spark.range(0, n).toDF("event_id")
      .select(col("event_id"),
        expr("timestamp_seconds(820483200 + event_id % 10000000)")
          .as("ts"),
        pmod(col("event_id"), lit(5000)).as("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .localCheckpoint()

    def pipeline() =
      MvtTiles.encodeOf(MvtTiles.prepOf(MvtTiles.tilesOf(
        MvtTiles.spotFeatures(events))))

    pipeline().write.format("noop").mode("overwrite").save() // warm
    val ts = (1 to 3).map { _ =>
      System.gc(); Thread.sleep(300)
      val t0 = System.nanoTime()
      pipeline().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = MvtTiles.prepOf(MvtTiles.tilesOf(
      MvtTiles.spotFeatures(events))).count()
    println(f"[probe] events=$n fanout_rows=$rows " +
      f"encode_times=${ts.map(t => f"$t%.1f").mkString(",")} s")
    spark.stop()
  }
}
