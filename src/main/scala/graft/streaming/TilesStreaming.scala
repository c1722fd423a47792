package graft.streaming

import graft.operators.MvtTiles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental MVT tile refresh — the production pattern for keeping
  * a tile set current against a live feature stream without
  * rebuilding the world: each micro-batch of arriving events (spot
  * features) marks the (z, tx, ty) keys its buffered tile ranges
  * touch as DIRTY, and `foreachBatch` re-encodes ONLY those tiles
  * from the accumulated feature store, appending them to a
  * last-writer-wins tile log (an LSM-style upsert: readers resolve
  * `max(ver)` per key; compaction is a deferred background rewrite).
  *
  * Invariant (THE correctness property of incremental maintenance):
  * after the stream drains, resolving the log equals the batch
  * rebuild of the same layer bit-for-bit — tiles are pure functions
  * of the feature set, features only arrive (no updates), and any
  * tile whose content would change is dirtied by the very feature
  * that changes it. The invariant survives micro-batch REPLAY
  * (foreachBatch is at-least-once): all writes are batchId-keyed
  * overwrites, so a replayed batch rewrites its own directories with
  * identical content instead of duplicating features or inflating
  * tile versions. The oracle is therefore the SAME relational
  * tile-stats replay as `q_tiles_mvt`, filtered to the spots layer.
  *
  * Scale shape: the dirty-key set per micro-batch is broadcast into a
  * semi-join that prunes the fan-out before the expensive prep/encode
  * stages; the store append is partitioned by the tile key the
  * resolve-read shuffles on. A production variant would additionally
  * bucket the feature store by coarse tile prefix so the per-batch
  * recompute reads only covering features instead of scanning the
  * store (documented tradeoff — at the driver tables' scale the scan
  * is the cheaper plan).
  */
object TilesStreaming {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** One micro-batch of the incremental refresh. foreachBatch is
    * at-least-once: a micro-batch may REPLAY after a failure. Every
    * write here keys its output directory by batchId and OVERWRITES,
    * so a replay lands on the same paths with the same content
    * instead of appending duplicate features / inflating re-encoded
    * tiles — the store reads glob the per-batch subdirectories back
    * together. TilesStreamingSpec proves the property by calling this
    * twice with the same batch and diffing the store.
    */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      spotsDir: String, tilesDir: String): Unit = {
    val batchSpots = MvtTiles.spotFeatures(batch)
    // 1. the batch's features join the accumulated store
    batchSpots.write.mode("overwrite").parquet(s"$spotsDir/b$batchId")
    // 2. dirty keys: every tile whose buffered range a new feature
    //    touches
    val dirty = MvtTiles.tilesOf(batchSpots)
      .select("z", "tx", "ty").distinct()
    // 3. re-encode ONLY dirty tiles, from ALL features seen so far
    //    (the semi-join prunes before quantize/prep/encode)
    val allSpots = batch.sparkSession.read.parquet(s"$spotsDir/b*")
    val fresh = MvtTiles.encodeOf(MvtTiles.prepOf(
      MvtTiles.tilesOf(allSpots)
        .join(broadcast(dirty), Seq("z", "tx", "ty"), "left_semi")))
    // 4. LSM-style upsert: this batch's version of each dirty tile
    fresh.withColumn("ver", lit(batchId))
      .write.mode("overwrite").parquet(s"$tilesDir/b$batchId")
  }

  def refreshViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.Files
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val run = counter.incrementAndGet()
    val stage = graft.TempDirs.scoped(s"graft_tiles_stage_${run}_")
    val spotsDir = graft.TempDirs.scoped(s"graft_tiles_spots_${run}_")
      .resolve("store").toString
    val tilesDir = graft.TempDirs.scoped(s"graft_tiles_log_${run}_")
      .resolve("store").toString

    // stage the events as THREE micro-batch files with pinned mtimes
    // so maxFilesPerTrigger=1 yields a deterministic three-batch
    // arrival order. The split is by id RANGE, not id mod 3: the
    // synthetic spot positions are functions of the id, and every
    // same-tile id delta happens to be ≡ 0 (mod 3), so a mod split
    // would never produce a cross-batch tile rewrite — the range
    // split straddles those deltas and exercises last-writer-wins on
    // the real data (at sf0.1; TilesStreamingSpec adds a crafted
    // collision fixture for the small scales)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val maxId = events.agg(max("event_id")).head().getLong(0)
    val step = maxId / 3 + 1
    (0 until 3).foreach { b =>
      EventsStreaming.writeEventsFile(
        events.filter(col("event_id") >= step * b &&
          col("event_id") < step * (b + 1)),
        stage, s"e${b}_events.parquet")
      stage.resolve(s"e${b}_events.parquet").toFile
        .setLastModified(1000000L * (b + 1))
    }

    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$stage/*.parquet")
      .writeStream
      .option("checkpointLocation", s"$stage-ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, spotsDir, tilesDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()

    // resolve last writer per tile key, then decode to the oracled
    // stats columns — hash-equal to the batch rebuild of the layer
    import org.apache.spark.sql.expressions.Window
    val latest = spark.read.parquet(s"$tilesDir/b*")
      .withColumn("rn", row_number().over(
        Window.partitionBy("zoom", "tile_x", "tile_y")
          .orderBy(col("ver").desc)))
      .filter(col("rn") === 1)
      .drop("rn", "ver", "n_layers")
    MvtTiles.decodedStats(latest)
  }
}
