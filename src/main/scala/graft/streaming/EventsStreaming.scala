package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Typed rows for the stateful sessionizer (public so Catalyst's
    * generated encoders can instantiate them).
    */
  case class SessEvent(user_id: Long, event_id: Long, ms: Long)
  case class SessState(events: Seq[(Long, Long)])
  case class SessOut(user_id: Long, session_id: Long, n_events: Long,
      start_ms: Long, duration_ms: Long)

  private val SessionGapMs = 30 * 60 * 1000L

  /** Gap-based sessionization as a STATEFUL stream:
    * `KeyValueGroupedDataset.flatMapGroupsWithState` holds the per-user
    * event buffer in `GroupState`, merging each micro-batch's arrivals
    * before cutting sessions at >30 min gaps — the custom-state path
    * SURVEY §0 prescribes for stream semantics Spark's windowed aggs
    * can't express.
    *
    * Batch-equivalence contract (same as [[hourlyViaStream]]): driven
    * with AvailableNow over a static file the source delivers one
    * micro-batch, so every session is complete at the first invocation
    * and is emitted immediately with state cleared. On an unbounded
    * source the open tail session stays in GroupState keyed by user
    * and an event-time timeout would flush it — only the
    * trigger/timeout wiring changes, not the session math.
    */
  def sessionizeViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_sessions_${counter.incrementAndGet()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        graft.operators.Events.msFromTs(schema("ts").dataType).as("ms"))
      .as[SessEvent]
    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, it, state) =>
          val merged = (state.getOption.map(_.events).getOrElse(Seq.empty)
            ++ it.map(e => (e.ms, e.event_id))).sorted
          state.remove() // single-batch contract; see doc comment
          // cut at >gap breaks; session ids number breaks 1..n in
          // (ms, event_id) order — identical to the batch window query
          var sid = 0L
          val out = scala.collection.mutable.ArrayBuffer[SessOut]()
          var cur = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          def flush(): Unit = if (cur.nonEmpty) {
            out += SessOut(user, sid, cur.size.toLong, cur.head._1,
              cur.last._1 - cur.head._1)
            cur = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          }
          merged.foreach { case (ms, eid) =>
            if (cur.isEmpty || ms - cur.last._1 > SessionGapMs) {
              flush(); sid += 1
            }
            cur += ((ms, eid))
          }
          flush()
          out.iterator
      }
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(name).orderBy("user_id", "session_id")
  }

  /** Rows for the timeout sessionizer (event_time carries the
    * watermark tag through the typed boundary).
    */
  case class SessEventT(user_id: Long, event_id: Long, ms: Long,
      event_time: java.sql.Timestamp)

  /** Cross-batch stateful sessionization with EVENT-TIME TIMEOUT —
    * the production shape [[sessionizeViaStream]]'s single-batch
    * contract sidesteps. Here the drive (restart-per-file, like
    * [[lateViaStream]]) delivers even-id events, then odd-id events,
    * then two watermark sentinels, so the operator actually
    * exercises: (1) merging a micro-batch's arrivals into buffered
    * per-user state, (2) emitting a session only once the watermark
    * proves it can no longer grow (last event + gap ≤ watermark — a
    * later event would have event time > watermark, hence > last +
    * gap), (3) GroupState.setTimeoutTimestamp(last + gap) so users
    * with no further traffic still flush when the watermark passes,
    * and (4) an explicit late rule — arrivals with ms ≤ watermark
    * are dropped, mirroring the ≤ eviction rule the aggregation path
    * pins in LlmOpsSpec. Everything surviving is sessionized exactly
    * like the batch twin, so the oracle is the batch sessionizer over
    * the deterministic surviving set.
    *
    * Session NUMBERING is assigned after the fact, by start-time rank
    * in the final read — never from streaming state. A timeout flush
    * removes a user's state, and a late-surviving arrival in the same
    * batch legitimately re-creates it (Spark runs the timeout and
    * data invocations separately), so any counter carried in state
    * would restart mid-stream; per-user sessions are time-disjoint,
    * so the start-time rank reproduces the batch numbering exactly.
    */
  def sessionTimeoutViaStream(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import java.nio.file.Files
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val maxMs = batch
      .agg(max(graft.operators.Events.msFromTs(schema("ts").dataType)))
      .head.getLong(0)
    val dir = graft.TempDirs.scoped("graft_sesst_in_")
    val outDir = graft.TempDirs.scoped("graft_sesst_out_")
    val cpDir = graft.TempDirs.scoped("graft_sesst_cp_")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(schema)
        .parquet(s"$dir/*.parquet")
        .select(col("user_id").cast("long").as("user_id"),
          col("event_id").cast("long").as("event_id"),
          graft.operators.Events.msFromTs(schema("ts").dataType).as("ms"))
        .withColumn("event_time", timestamp_millis(col("ms")))
        .withWatermark("event_time", "10 minutes")
        .as[SessEventT]
      val sessions = stream
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[SessState, SessOut](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          case (user, it, state) =>
            val wm = state.getCurrentWatermarkMs()
            val prior = state.getOption.map(_.events).getOrElse(Seq.empty)
            // late rule: ms ≤ watermark drops (watermark is ms-epoch)
            val incoming = it.filter(_.ms > wm)
              .map(e => (e.ms, e.event_id)).toSeq
            val merged = (prior ++ incoming).sorted
            if (merged.isEmpty) { state.remove(); Iterator.empty }
            else {
              // cut into gap-delimited sessions
              val sessions = scala.collection.mutable
                .ArrayBuffer[Seq[(Long, Long)]]()
              var cur = scala.collection.mutable.ArrayBuffer(merged.head)
              merged.tail.foreach { e =>
                if (e._1 - cur.last._1 > SessionGapMs) {
                  sessions += cur.toSeq
                  cur = scala.collection.mutable.ArrayBuffer(e)
                } else cur += e
              }
              sessions += cur.toSeq
              // a session is final once the watermark proves no
              // arrival can extend it; on timeout everything is
              val closed =
                if (state.hasTimedOut) sessions.toSeq
                else sessions.toSeq.takeWhile(_.last._1 + SessionGapMs <= wm)
              val out = closed.map { ss =>
                SessOut(user, 0L, ss.size.toLong, // sid assigned post-hoc
                  ss.head._1, ss.last._1 - ss.head._1)
              }
              val rest = sessions.drop(closed.size).flatten.toSeq
              if (rest.isEmpty) state.remove()
              else {
                state.update(SessState(rest))
                state.setTimeoutTimestamp(rest.last._1 + SessionGapMs)
              }
              out.iterator
            }
        }
      val q = sessions.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", cpDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    try {
      writeEventsFile(batch.filter(pmod(col("event_id"), lit(2)) === 0),
        dir, "e0_even.parquet")
      runOnce()
      writeEventsFile(batch.filter(pmod(col("event_id"), lit(2)) === 1),
        dir, "e1_odd.parquet")
      runOnce()
      writeEventsFile(sentinelDf(spark, schema, maxMs + 30L * 86400000L, 0),
        dir, "e2_sentinel.parquet")
      runOnce()
      writeEventsFile(sentinelDf(spark, schema, maxMs + 31L * 86400000L, 1),
        dir, "e3_sentinel.parquet")
      runOnce()
      spark.read.parquet(outDir.toString)
        .filter(col("user_id") >= 0) // sentinels advance time, never count
        .withColumn("session_id",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("start_ms")).cast("long"))
        .select("user_id", "session_id", "n_events", "start_ms",
          "duration_ms")
        .orderBy("user_id", "session_id")
        .localCheckpoint() // the scratch dirs are deleted on return
    } finally Seq(dir, outDir, cpDir).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
  }

  /** Incrementally-maintained materialized view: `foreachBatch` MERGES
    * each micro-batch's partial aggregate into a versioned parquet
    * view — the streaming upsert twin of q_merge_upsert, and the
    * mechanism behind every continuously-refreshed dashboard table.
    * Per batch: aggregate the batch (map-side partials only — the
    * batch is the small side), full-outer merge with the current view
    * on the group key, write version v<batchId>, then flip a pointer
    * file; a `_last_batch` marker makes re-delivered batches no-ops
    * (foreachBatch is at-least-once — idempotence is the sink's job).
    * The drive stages even-id then odd-id files as separate runs
    * (same restart pattern as [[lateViaStream]]) so the merge path
    * provably executes across micro-batches; the final view must
    * equal the one-shot batch aggregate, which is the oracle.
    */
  def matviewViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = graft.TempDirs.scoped("graft_mv_in_")
    val viewDir = graft.TempDirs.scoped("graft_mv_view_")
    val cpDir = graft.TempDirs.scoped("graft_mv_cp_")
    val pointer = viewDir.resolve("_CURRENT")
    val marker = viewDir.resolve("_last_batch")
    def currentView(): Option[DataFrame] =
      if (Files.exists(pointer))
        Some(spark.read.parquet(
          viewDir.resolve("v" + Files.readString(pointer)).toString))
      else None
    def runOnce(): Unit = {
      // explicit fn type — foreachBatch overloads on scala vs java fns
      val mergeBatch: (DataFrame, Long) => Unit = { (df, batchId) =>
          val last =
            if (Files.exists(marker)) Files.readString(marker).toLong
            else -1L
          if (batchId > last) {
            val b = df.groupBy("event_type")
              .agg(count(lit(1)).as("n"),
                sum(expr("CAST(floor((value * 100) + 0.5) AS BIGINT)"))
                  .as("cents"))
            val merged = currentView() match {
              case None => b
              case Some(cur) =>
                cur.select(col("event_type"), col("n").as("cn"),
                    col("cents").as("cc"))
                  .join(b, Seq("event_type"), "full_outer")
                  .select(col("event_type"),
                    (coalesce(col("cn"), lit(0L))
                      + coalesce(col("n"), lit(0L))).as("n"),
                    (coalesce(col("cc"), lit(0L))
                      + coalesce(col("cents"), lit(0L))).as("cents"))
            }
            merged.coalesce(1).write.mode("overwrite")
              .parquet(viewDir.resolve("v" + batchId).toString)
            Files.writeString(pointer, batchId.toString)
            Files.writeString(marker, batchId.toString)
          }
      }
      val q = spark.readStream
        .schema(schema)
        .parquet(s"$dir/*.parquet")
        .writeStream
        .foreachBatch(mergeBatch)
        .option("checkpointLocation", cpDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    try {
      writeEventsFile(batch.filter(pmod(col("event_id"), lit(2)) === 0),
        dir, "e0_even.parquet")
      runOnce() // view v0 = evens
      writeEventsFile(batch.filter(pmod(col("event_id"), lit(2)) === 1),
        dir, "e1_odd.parquet")
      runOnce() // merge path: v1 = v0 ⊕ odds
      currentView().get
        .select(col("event_type"), col("n"),
          col("cents").as("total_cents"))
        .orderBy("event_type")
        .localCheckpoint() // the scratch dirs are deleted on return
    } finally Seq(dir, viewDir, cpDir).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
  }

  /** Streaming duplicate collapse: `dropDuplicatesWithinWatermark` on
    * (user_id, event_type, minute) — the watermark bounds the dedupe
    * state exactly like the reference's bounded KV caches bound theirs.
    * The deduped stream lands in a memory sink; the per-run count
    * compares against the batch `countDistinct` twin.
    */
  def dedupViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_dedup_${counter.incrementAndGet()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ms",
        graft.operators.Events.msFromTs(schema("ts").dataType))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .withWatermark("event_time", "1 hour")
      .select(col("user_id"), col("event_type"),
        expr("CAST(ms DIV 60000 AS BIGINT)").as("minute"),
        col("event_time"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(name)
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_after_dedup"))
  }

  /** Declarative sessionization via Spark's native `session_window` —
    * the built-in-first alternative to the stateful
    * flatMapGroupsWithState sessionizer ([[sessionizeViaStream]]):
    * gap-merged windows per user computed entirely by the streaming
    * aggregation operator (state store managed by Spark, mergeable
    * across micro-batches), then session numbering by window start.
    * The batch twin breaks a session when the gap is STRICTLY greater
    * than 30 min; `session_window` merges while `next < prev + gap`,
    * so the gap passed is 30 min + 1 ms to make the boundary
    * inclusive-equal like the batch rule.
    */
  def sessionWindowViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_sesswin_${counter.incrementAndGet()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ms",
        graft.operators.Events.msFromTs(schema("ts").dataType))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .withWatermark("event_time", "1 hour")
      .groupBy(col("user_id"),
        session_window(col("event_time"), "30 minutes 1 milliseconds"))
      .agg(count(lit(1)).as("n_events"),
        min("ms").as("start_ms"),
        (max("ms") - min("ms")).as("duration_ms"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    val byUser = Window.partitionBy("user_id").orderBy("start_ms")
    spark.table(name)
      .select(col("user_id"), col("n_events"), col("start_ms"),
        col("duration_ms"))
      .withColumn("session_id", row_number().over(byUser).cast("long"))
      .select("user_id", "session_id", "n_events", "start_ms",
        "duration_ms")
      .orderBy("user_id", "session_id")
  }

  /** Stream-static enrichment: the events stream joins a STATIC
    * broadcast dimension (customer → market segment) before a
    * per-segment aggregation. The stream-static join is stateless —
    * each micro-batch hash-joins against the broadcast table with no
    * streaming state — which is the scale-correct shape for enriching
    * an unbounded event stream with slowly-changing reference data
    * (the dim reloads per restart; a true SCD would swap in a
    * Delta/parquet-backed table, same plan).
    */
  def enrichViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_enrich_${counter.incrementAndGet()}"
    val dim = broadcast(spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment")))
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .select(col("user_id"), col("event_type"), col("value"))
      .join(dim, Seq("user_id"))
      .groupBy("segment", "event_type")
      .agg(count(lit(1)).as("n_events"),
        // exact integer-cents sum (see Events.hourlyAggs note)
        expr("CAST(sum(CAST(floor((value * 100) + 0.5) AS BIGINT)) AS DOUBLE)" +
          " / 100.0").as("total_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(name).orderBy("segment", "event_type")
  }

  /** Stream-stream INTERVAL join: view→purchase conversion pairs
    * within 30 minutes per user — the remaining Structured Streaming
    * operator family (double-sided watermarked join). Both sides are
    * event-time watermarked and the join condition bounds purchase
    * time to [view time, view time + 30 min], which is what lets the
    * state store evict both sides as the watermark advances — without
    * the time bound a stream-stream inner join would buffer forever.
    *
    * Scale shape: state is keyed by user_id (the equality column), so
    * the join shuffles both streams once on user_id and holds only a
    * 30-minute-plus-watermark window of rows per user; pair emission
    * is append-mode incremental. The raw pair stream lands in the
    * sink; the per-user rollup runs as a batch aggregate over it (on
    * a live pipeline that rollup would be a second streaming agg).
    *
    * Equality contract with the batch oracle: event-times are exact
    * millisecond-derived timestamps, and the interval bound
    * `p_time <= v_time + 30 min` is evaluated on microsecond-precision
    * values that are whole milliseconds — identical to the oracle's
    * `pms - vms <= 1800000` integer arithmetic.
    */
  def convertViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_convert_${counter.incrementAndGet()}"
    def side(tpe: String, prefix: String) = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .filter(col("event_type") === tpe)
      .withColumn("ms",
        graft.operators.Events.msFromTs(schema("ts").dataType))
      .select(col("user_id").as(s"${prefix}_user"),
        col("event_id").as(s"${prefix}_id"),
        col("ms").as(s"${prefix}_ms"),
        timestamp_millis(col("ms")).as(s"${prefix}_time"))
      .withWatermark(s"${prefix}_time", "1 hour")
    val views = side("view", "v")
    val purchases = side("purchase", "p")
    val pairs = purchases.join(views,
      expr("""v_user = p_user
        AND v_time <= p_time
        AND p_time <= v_time + INTERVAL 30 MINUTES"""))
    val q = pairs.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(name)
      .groupBy(col("p_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("v_id")).as("n_views"),
        countDistinct(col("p_id")).as("n_purchases"),
        min(col("p_ms") - col("v_ms")).as("min_lag_ms"),
        max(col("p_ms") - col("v_ms")).as("max_lag_ms"))
      .orderBy("user_id")
  }

  /** Stream-stream LEFT OUTER interval join: views that saw no
    * purchase from the same user within 30 minutes are ABANDONED —
    * the null-padded rows a streaming outer join emits only once the
    * watermark proves no match can still arrive.
    *
    * Outer-row emission mechanics (the part inner joins don't have):
    * a view's unmatched row leaves the state store only when the
    * global watermark passes `v_time + 30 min + delay`, and the
    * watermark itself only advances between micro-batches. Driven
    * over a single static file everything lands in one batch and no
    * outer row would ever emit. So the drive builds a scratch stream
    * dir of the real file plus two far-future sentinel files (a
    * view + purchase pair each, user_id −1), throttled to one file
    * per micro-batch: sentinel 1 advances the watermark past every
    * real view's eviction bound, and the batch reading sentinel 2
    * flushes the evictions — no reliance on trailing no-data
    * batches. Sentinels filter out of the result before the rollup.
    * On an unbounded source the sentinels ARE the arriving traffic;
    * only this harness needs them injected.
    */
  /** `ts` literal for epoch-ms `ms` matching the scanned dtype (raw
    * nanos long under the legacy conf, or a timestamp cast).
    */
  private def tsLit(schema: org.apache.spark.sql.types.StructType,
      ms: Long): Column = schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => lit(ms * 1000000L)
    case dt => timestamp_millis(lit(ms)).cast(dt)
  }

  /** Writes one events-schema parquet FILE into `dir` (Spark writes a
    * directory; the single part-file is moved into place so the file
    * stream source sees a flat file list with controllable mtimes).
    */
  private[streaming] def writeEventsFile(df: DataFrame, dir: java.nio.file.Path,
      fileName: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val tmp = graft.TempDirs.scoped("graft_stage_w_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    Files.move(part.toPath, dir.resolve(fileName),
      StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  /** A far-future sentinel pair (view + purchase, user_id −1) whose
    * event time advances the watermark past every real row.
    */
  private def sentinelDf(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, ms: Long,
      idOff: Long): DataFrame =
    spark.range(2).select(
      (lit(-1L) - lit(idOff) * 2 - col("id")).as("event_id"),
      tsLit(schema, ms).as("ts"),
      lit(-1L).as("user_id"),
      when(col("id") === 0, "view").otherwise("purchase")
        .as("event_type"),
      lit(0.0).as("value"),
      lit("{}").as("props"))

  def abandonViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_abandon_${counter.incrementAndGet()}"
    val maxMs = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(max(graft.operators.Events.msFromTs(schema("ts").dataType)))
      .head.getLong(0)
    val dir = graft.TempDirs.scoped("graft_abandon_")
    def writeSentinel(fileName: String, ms: Long, idOff: Long): Unit =
      writeEventsFile(sentinelDf(spark, schema, ms, idOff), dir, fileName)
    try {
      // the source table may be a bare file (driver testdata) or a
      // Spark-written directory of part-files (specs). ALL real rows
      // must land in ONE micro-batch: with maxFilesPerTrigger=1 each
      // staged file is its own batch, and the 10-minute join watermark
      // advances between batches — if parts were not time-ordered,
      // rows behind the watermark would be silently dropped from the
      // stream-stream join. Staging a single merged file makes the
      // result independent of part-file time ordering; only the two
      // sentinel files ride in later batches (to flush state).
      val src = Paths.get(s"$sfDir/events.parquet")
      if (Files.isDirectory(src) &&
          src.toFile.listFiles().count(_.getName.endsWith(".parquet")) > 1)
        writeEventsFile(spark.read.parquet(src.toString), dir,
          "e0_events.parquet")
      else {
        val one =
          if (Files.isDirectory(src))
            src.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
              .headOption.getOrElse(sys.error(
                s"no .parquet part files under $src — cannot stage events"))
              .toPath
          else src
        Files.copy(one, dir.resolve("e0_events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      dir.resolve("e0_events.parquet").toFile.setLastModified(1000000L)
      writeSentinel("e1_sentinel.parquet", maxMs + 30L * 86400000L, 0)
      writeSentinel("e2_sentinel.parquet", maxMs + 31L * 86400000L, 1)
      // one file per micro-batch, oldest mtime first — pin the order
      dir.resolve("e1_sentinel.parquet").toFile.setLastModified(2000000L)
      dir.resolve("e2_sentinel.parquet").toFile.setLastModified(3000000L)
      def side(tpe: String, prefix: String) = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/*.parquet")
        .filter(col("event_type") === tpe)
        .withColumn("ms",
          graft.operators.Events.msFromTs(schema("ts").dataType))
        .select(col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"),
          timestamp_millis(col("ms")).as(s"${prefix}_time"))
        .withWatermark(s"${prefix}_time", "10 minutes")
      val joined = side("view", "v").join(side("purchase", "p"),
        expr("""v_user = p_user
          AND p_time >= v_time
          AND p_time <= v_time + INTERVAL 30 MINUTES"""),
        "leftOuter")
      val q = joined.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
      spark.table(name)
        .filter(col("v_user") >= 0)
        .groupBy(col("v_user"), col("v_id"))
        .agg(max(when(col("p_id").isNotNull, 1).otherwise(0)).as("matched"))
        .groupBy(col("v_user").as("user_id"))
        .agg(sum(when(col("matched") === 0, 1L).otherwise(0L))
            .as("n_abandoned"),
          sum(when(col("matched") === 1, 1L).otherwise(0L))
            .as("n_converted"))
        .orderBy("user_id")
        .localCheckpoint() // the scratch dir is deleted on return
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  /** Late-data accounting: the hourly aggregation under a 10-minute
    * watermark when HALF the corpus arrives late. The drive stages
    * even-event_id rows as micro-batch 1 and odd rows as micro-batch
    * 2 (plus the two sentinel flush files, one file per trigger), so
    * batch 2 runs under watermark W = max(even event time) − 10 min
    * and every odd row whose hour window has already closed
    * (window.end ≤ W) is DROPPED by the aggregation — Spark's
    * documented late-row rule, here made deterministic by pinning
    * which rows are late. The result is the hourly count table
    * MINUS exactly those dropped rows; the oracle recomputes the
    * same inclusion predicate in SQL. Sentinels are excluded after
    * the watermark node but before the aggregation, so they advance
    * event time without ever counting.
    */
  def lateViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.Files
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val maxMs = batch
      .agg(max(graft.operators.Events.msFromTs(schema("ts").dataType)))
      .head.getLong(0)
    val dir = graft.TempDirs.scoped("graft_late_in_")
    val outDir = graft.TempDirs.scoped("graft_late_out_")
    val cpDir = graft.TempDirs.scoped("graft_late_cp_")
    // Each run ingests exactly the files added since the previous run
    // (the checkpoint remembers the rest) and STARTS from the
    // watermark the previous run committed — restart-driven batch
    // boundaries, deterministic on any filesystem, no reliance on
    // per-trigger file throttling or filter-pushdown placement.
    // Sentinels flow through the watermark operator INTO far-future
    // window state that is never emitted (the watermark never passes
    // them), so they advance event time without polluting output.
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(schema)
        .parquet(s"$dir/*.parquet")
        .withColumn("ms",
          graft.operators.Events.msFromTs(schema("ts").dataType))
        .withColumn("event_time", timestamp_millis(col("ms")))
        .withWatermark("event_time", "10 minutes")
        .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("n"))
      val q = stream.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", cpDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    try {
      writeEventsFile(batch.filter(pmod(col("event_id"), lit(2)) === 0),
        dir, "e0_even.parquet")
      runOnce() // watermark commits at max(even) − 10 min
      writeEventsFile(batch.filter(pmod(col("event_id"), lit(2)) === 1),
        dir, "e1_odd.parquet")
      runOnce() // odd rows in closed windows are DROPPED here
      writeEventsFile(sentinelDf(spark, schema, maxMs + 30L * 86400000L, 0),
        dir, "e2_sentinel.parquet")
      runOnce() // emits windows closed by the real-data watermark
      writeEventsFile(sentinelDf(spark, schema, maxMs + 31L * 86400000L, 1),
        dir, "e3_sentinel.parquet")
      runOnce() // sentinel-advanced watermark flushes every real window
      spark.read.parquet(outDir.toString)
        .filter(col("wstart") <= timestamp_millis(lit(maxMs))) // belt+braces
        .select(date_format(col("wstart"), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"), col("n"))
        .orderBy("hour", "event_type")
        .localCheckpoint() // the scratch dirs are deleted on return
    } finally Seq(dir, outDir, cpDir).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
  }

  /** Exactly-once resume proof: the hourly aggregation run as FIVE
    * consecutive AvailableNow queries against one checkpoint — data,
    * then an EMPTY restart (no new files), then the two sentinel
    * flush files, then another empty restart after completion. A
    * file-source + file-sink pipeline that re-ingested or re-emitted
    * anything across those restarts would double its counts; the
    * oracle is the plain batch aggregate, so the hash compare IS the
    * exactly-once check. (The empty restarts are the interesting
    * part: offsets come from the checkpoint's commit log, and the
    * sink's _spark_metadata dedupes replayed batch ids.)
    */
  def reprocessViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.Files
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
    val maxMs = batch
      .agg(max(graft.operators.Events.msFromTs(schema("ts").dataType)))
      .head.getLong(0)
    val dir = graft.TempDirs.scoped("graft_rp_in_")
    val outDir = graft.TempDirs.scoped("graft_rp_out_")
    val cpDir = graft.TempDirs.scoped("graft_rp_cp_")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(schema)
        .parquet(s"$dir/*.parquet")
        .withColumn("ms",
          graft.operators.Events.msFromTs(schema("ts").dataType))
        .withColumn("event_time", timestamp_millis(col("ms")))
        .withWatermark("event_time", "10 minutes")
        .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("n"))
      val q = stream.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", cpDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    try {
      writeEventsFile(batch, dir, "e0_all.parquet")
      runOnce() // ingest everything (watermark still 0 — nothing emits)
      runOnce() // EMPTY restart: must be a no-op
      writeEventsFile(sentinelDf(spark, schema, maxMs + 30L * 86400000L, 0),
        dir, "e1_sentinel.parquet")
      runOnce() // watermark jumps; windows flush on the next run
      writeEventsFile(sentinelDf(spark, schema, maxMs + 31L * 86400000L, 1),
        dir, "e2_sentinel.parquet")
      runOnce() // flush every real window
      runOnce() // EMPTY restart after completion: must emit nothing
      spark.read.parquet(outDir.toString)
        .filter(col("wstart") <= timestamp_millis(lit(maxMs)))
        .select(date_format(col("wstart"), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"), col("n"))
        .orderBy("hour", "event_type")
        .localCheckpoint() // the scratch dirs are deleted on return
    } finally Seq(dir, outDir, cpDir).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
  }

  /** Batch-equivalent streaming run of the hourly aggregation.
    * `ts` is floored to ms (schema-dispatched, see Events.msFromTs) and
    * projected to an event-time timestamp for the watermark.
    */
  def hourlyViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_hourly_${counter.incrementAndGet()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ms",
        graft.operators.Events.msFromTs(schema("ts").dataType))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .withWatermark("event_time", "1 hour")
      .groupBy(
        date_format(timestamp_millis(col("ms") - col("ms") % 3600000L),
          "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      // shared exact-cents aggregates (see Events.hourlyOracle note)
      .agg(graft.operators.Events.hourlyAggs.head,
        graft.operators.Events.hourlyAggs.tail: _*)
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

  /** Per-hour top-k trending event types from a stream: the windowed
    * count aggregation runs IN the stream (watermarked state-store
    * agg, complete mode), and the rank-within-hour runs as a batch
    * query over the sink table — the standard split for streaming
    * top-k, because rank-over-window isn't an incremental streaming
    * operator but the counts it ranks are. On a live source the sink
    * would be a Delta/parquet table and this exact batch ranking runs
    * on whatever prefix has landed.
    */
  def topkViaStream(spark: SparkSession, sfDir: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_topk_${counter.incrementAndGet()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ms",
        graft.operators.Events.msFromTs(schema("ts").dataType))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .withWatermark("event_time", "1 hour")
      .groupBy(
        date_format(timestamp_millis(col("ms") - col("ms") % 3600000L),
          "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    val w = Window.partitionBy("hour")
      .orderBy(col("n").desc, col("event_type"))
    spark.table(name)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .orderBy("hour", "rk")
  }

  /** Streaming daily-volume anomaly monitor: the (event_type, day)
    * counts aggregate in the stream's state store; the mean+2σ
    * flagging — which needs each type's complete daily series — runs
    * as a batch pass over the sink through the same
    * [[graft.operators.Events.anomalyFromDaily]] kernel as the batch
    * query.
    */
  def anomalyViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_anomaly_${counter.incrementAndGet()}"
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .withColumn("ms",
        graft.operators.Events.msFromTs(schema("ts").dataType))
      .withColumn("event_time", timestamp_millis(col("ms")))
      .withWatermark("event_time", "1 hour")
      .groupBy(col("event_type"),
        date_format(timestamp_millis(col("ms") - col("ms") % 86400000L),
          "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    // localCheckpoint: anomalyFromDaily self-joins its input (stats
    // branch), and two references to the memory-sink relation fail
    // attribute dedup — the materialized RDD plan dedups fine
    graft.operators.Events.anomalyFromDaily(
      spark.table(name).localCheckpoint())
  }

  /** Rows for the stream-stream as-of (side 0 = view/right, 1 =
    * purchase/left; event_time carries the watermark tag).
    */
  case class AsofEv(user_id: Long, side: Int, event_id: Long, us: Long,
      event_time: java.sql.Timestamp)
  case class AsofSt(views: Seq[(Long, Long)], pending: Seq[(Long, Long)])
  case class AsofHit(purchase_id: Long, user_id: Long,
      view_id: Option[Long], gap_us: Option[Long])

  /** STREAM-STREAM as-of: purchases and views are BOTH unbounded
    * streams, and each purchase must match the newest view
    * at-or-before it — which is only safe to emit once the watermark
    * proves no earlier view can still arrive. flatMapGroupsWithState
    * per user holds (buffered views, pending purchases):
    *
    *  - a purchase emits when `purchase_ms <= watermark` (any future
    *    arrival has event time beyond the watermark, hence a strictly
    *    later microsecond — ms-floor argument in the emit test);
    *  - pending purchases arm an EVENT-TIME TIMEOUT at the earliest
    *    pending time, so the flush happens on watermark passage even
    *    if the user never produces another event;
    *  - view state PRUNES to "everything after the watermark, plus
    *    the single newest at-or-before it" — every future purchase is
    *    beyond the watermark, so older passed views can never win.
    *    State is O(in-flight window) per user, not O(history).
    *
    * Driven restart-per-file in TIME order (first-half timeline, then
    * second half, then two far-future sentinels), so nothing is ever
    * late and the result must equal the batch as-of — the oracle is
    * the exact q_asof_join SQL. Emission happens across MULTIPLE
    * batches (mid-stream purchases flush on batch 2's watermark, the
    * tail on the sentinels'), so the cross-batch state machinery is
    * actually exercised, not just the single-batch degenerate case.
    */
  def asofStreamStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type").isin("view", "purchase"))
    val usCol = graft.operators.AsofJoin.usFromTs(schema("ts").dataType)
    val maxMs = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(max(graft.operators.Events.msFromTs(schema("ts").dataType)))
      .head.getLong(0)
    // any time split works (semantics don't depend on the boundary);
    // the median just guarantees both batches carry real work
    val midMs = batch.withColumn("us", usCol)
      .agg(expr("CAST(approx_percentile(us DIV 1000, 0.5) AS BIGINT)"))
      .head.getLong(0)
    val dir = graft.TempDirs.scoped("graft_ssasof_in_")
    val outDir = graft.TempDirs.scoped("graft_ssasof_out_")
    val cpDir = graft.TempDirs.scoped("graft_ssasof_cp_")

    def runOnce(): Unit = {
      val evs = spark.readStream
        .schema(schema)
        .parquet(s"$dir/*.parquet")
        .withColumn("us", graft.operators.AsofJoin
          .usFromTs(schema("ts").dataType))
        .withColumn("event_time", timestamp_millis(expr("us DIV 1000")))
        .withWatermark("event_time", "30 minutes")
        .select(col("user_id").cast("long").as("user_id"),
          when(col("event_type") === "purchase", 1).otherwise(0)
            .as("side"),
          col("event_id").cast("long").as("event_id"),
          col("us"), col("event_time"))
        .as[AsofEv]
      val hits = evs.groupByKey(_.user_id)
        .flatMapGroupsWithState[AsofSt, AsofHit](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          case (user, it, state) =>
            val w = state.getCurrentWatermarkMs()
            val arrivals = it.toSeq.filter(_.us / 1000 > w) // late rule
            val st = state.getOption.getOrElse(AsofSt(Nil, Nil))
            // views dedup per us (newest id wins — the operator's
            // documented determinism contract)
            val views = (st.views ++ arrivals.filter(_.side == 0)
              .map(e => (e.us, e.event_id)))
              .groupBy(_._1).map { case (us, vs) => (us, vs.map(_._2).max) }
              .toSeq.sortBy(_._1)
            val pend = (st.pending ++ arrivals.filter(_.side == 1)
              .map(e => (e.us, e.event_id))).sortBy(p => (p._1, p._2))
            val (emit, keep) = pend.partition(_._1 / 1000 <= w)
            val out = emit.map { case (pus, pid) =>
              val m = views.filter(_._1 <= pus).lastOption
              AsofHit(pid, user, m.map(_._2), m.map(v => pus - v._1))
            }
            // prune passed views to the single newest at-or-before W
            val (passed, live) = views.partition(_._1 / 1000 <= w)
            val keptViews = passed.takeRight(1) ++ live
            if (keep.isEmpty && keptViews.isEmpty) state.remove()
            else {
              state.update(AsofSt(keptViews, keep))
              // a previously set timeout is cleared on every
              // invocation; re-arm only while purchases are pending
              if (keep.nonEmpty)
                state.setTimeoutTimestamp(keep.map(_._1 / 1000).min + 1)
            }
            out.iterator
        }
      val q = hits.toDF().writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", cpDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    try {
      val usBatch = batch.withColumn("us", usCol)
      writeEventsFile(usBatch.filter(expr(s"us DIV 1000 <= $midMs"))
        .drop("us"), dir, "e0_first_half.parquet")
      runOnce() // early purchases flush at W = mid − 30 min
      writeEventsFile(usBatch.filter(expr(s"us DIV 1000 > $midMs"))
        .drop("us"), dir, "e1_second_half.parquet")
      runOnce() // mid-stream purchases flush
      writeEventsFile(sentinelDf(spark, schema, maxMs + 30L * 86400000L, 0),
        dir, "e2_sentinel.parquet")
      runOnce()
      writeEventsFile(sentinelDf(spark, schema, maxMs + 31L * 86400000L, 1),
        dir, "e3_sentinel.parquet")
      runOnce() // watermark past every real row: tail flushes
      spark.read.parquet(outDir.toString)
        .filter(col("user_id") >= 0) // sentinels never emit; belt+braces
        .select(col("purchase_id"), col("user_id"),
          col("view_id"), col("gap_us"))
        .orderBy("purchase_id")
        .localCheckpoint() // scratch dirs are deleted on return
    } finally Seq(dir, outDir, cpDir).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
  }

  /** The native AS-OF join inside a streaming query: a purchase
    * stream temporally enriched against the static signup-derived
    * tier dimension through [[graft.operators.AsofJoin.join]] with
    * `broadcastRight = true` — the custom logical node rides the
    * micro-batch planner exactly like a built-in (IncrementalExecution
    * plans with the session's injected strategies), and because
    * [[graft.plans.BroadcastAsofJoinExec]] is STATELESS per batch and
    * the dimension is static, append-mode emission per micro-batch is
    * exact with no state store at all. The fact stream reaches the
    * join with zero exchange — the streaming source's partitioning
    * flows straight through, so this is the shape a 100 TB/day ingest
    * wants for SCD temporal enrichment.
    *
    * The rollup over the enriched pairs runs as a batch aggregate on
    * the sink (a live pipeline would chain a second streaming agg).
    * Oracle = the same DuckDB ASOF LEFT JOIN as the batch twin,
    * rolled up per tier.
    */
  def asofViaStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_stream_asof_${counter.incrementAndGet()}"
    val usCol = graft.operators.AsofJoin.usFromTs(schema("ts").dataType)
    val dim = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "signup")
      .withColumn("us", usCol)
      .groupBy(col("user_id").as("s_user"), col("us").as("s_us"))
      .agg((max("event_id") % 5).as("tier"))
    val fact = spark.readStream
      .schema(schema)
      .parquet(s"$sfDir/events*.parquet")
      .filter(col("event_type") === "purchase")
      .withColumn("us", usCol)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))
    val joined = graft.operators.AsofJoin.join(
      fact, dim, Seq("user_id" -> "s_user"), "us", "s_us",
      None, outer = true, broadcastRight = true)
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.table(name)
      .groupBy(coalesce(col("tier"), lit(-1L)).as("tier"))
      .agg(count(lit(1)).as("n_purchases"),
        coalesce(sum(col("us") - col("s_us")), lit(0L)).as("sum_age_us"))
      .orderBy("tier")
  }
}
