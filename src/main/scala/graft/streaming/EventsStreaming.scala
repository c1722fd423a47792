package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming path for the events pipeline.
  *
  * The reference has no event-time streaming (SURVEY §1.4) — this is
  * the engine's forward-looking ingest mode: the same hourly
  * aggregation as the batch query, expressed as readStream → event-time
  * watermark → groupBy → memory sink, driven to completion with
  * AvailableNow so a static parquet file produces a deterministic,
  * batch-equivalent result. On a live source only the trigger and sink
  * change.
  */
object EventsStreaming {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Batch-equivalent streaming run of the hourly aggregation.
    * `ts` arrives as epoch-nanos long (nanosAsLong read); it is floored
    * to ms and projected to an event-time timestamp for the watermark.
    */
  def hourlyViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    // nanosAsLong is set at session build (see Events.eventsMs note)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_hourly_${counter.incrementAndGet()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ms", expr("CAST(ts DIV 1000000 AS BIGINT)"))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .withWatermark("event_time", "1 hour")
      .groupBy(
        date_format(timestamp_millis(col("ms") - col("ms") % 3600000L),
          "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 2).as("total_value"),
        round(avg("value"), 4).as("avg_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(name).orderBy("hour", "event_type")
  }
}
