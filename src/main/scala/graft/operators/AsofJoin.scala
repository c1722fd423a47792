package graft.operators

import graft.{QuerySpec, Tables}
import graft.plans.AsofJoinPlan
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SqlBridge

/** AS-OF join: the native time-series join (each left row picks the
  * newest right row at-or-before its own time, per key), as a
  * first-class operator — [[graft.plans.AsofJoinPlan]] logical node,
  * [[graft.plans.AsofJoinStrategy]] planner rule,
  * [[graft.plans.AsofJoinExec]] physical merge.
  *
  * The reference computes last-touch attribution with hand-rolled
  * "latest prior event" scans (the pattern `q_events_attribution`
  * mirrors with window functions over a UNION of both event kinds).
  * That encoding needs both relations in ONE relation first — a
  * union-wide shuffle carrying the superset of both schemas — and a
  * window buffer per user. The native operator shuffles each side
  * once on its own keys, sorts (keys, time) inside the exchange, and
  * merges with one buffered row: the kdb/pandas `merge_asof` shape,
  * on Spark's distribution/ordering contracts (the same ones
  * SortMergeJoinExec declares, so EnsureRequirements co-partitions
  * the sides and AQE still re-plans the exchanges).
  *
  * Determinism: ties on the full (keys, time) on the RIGHT side are
  * resolved by whichever row sorts last in the partition-local sort,
  * which Spark does not define — callers that need a deterministic
  * result (every oracle-gated query here) pre-aggregate the right
  * side to one row per (keys, time).
  */
object AsofJoin {

  /** Left-outer (or inner) as-of join of `left` to `right`.
    *
    * @param keys      (leftCol, rightCol) equi-key pairs
    * @param leftTime  left time column — TIMESTAMP/TIMESTAMP_NTZ/BIGINT
    * @param rightTime right time column, same family
    * @param toleranceMicros max allowed `leftTime - rightTime`
    *                  (time-column units when the columns are BIGINT)
    * @param outer     true = keep unmatched left rows (NULL right cols)
    * @param broadcastRight true = plan the dimension-lookup variant
    *                  ([[graft.plans.BroadcastAsofJoinExec]]): the right
    *                  side broadcasts and the left side keeps its
    *                  partitioning AND ordering — zero fact-side
    *                  exchange. Explicit by design (like every other
    *                  broadcast in this library); only for right sides
    *                  that fit comfortably on every executor.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTime: String, rightTime: String,
      toleranceMicros: Option[Long] = None,
      outer: Boolean = true,
      broadcastRight: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    // Self-registering (idempotent, same pattern as SpatialLayout's
    // morton SQL surface): callers need no session-build ceremony.
    // Goes through the shared synchronized helper — a bare
    // read-modify-write here would race GraftExtensions.register and
    // could lose either side's append.
    graft.GraftExtensions.registerPlanning(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-join hygiene: if any attribute ids collide (both sides
    // carved from the same scan), re-alias the right side so the
    // custom node never holds ambiguous references — the analyzer's
    // relation dedup only knows built-in join nodes.
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    def resolve(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"as-of join: no column `$name` on the $side side " +
            s"(have: ${out.map(_.name).mkString(", ")})"))

    val plan = AsofJoinPlan(
      lPlan, rPlan,
      keys.map(k => resolve(lPlan.output, k._1, "left")),
      keys.map(k => resolve(rPlan.output, k._2, "right")),
      resolve(lPlan.output, leftTime, "left"),
      resolve(rPlan.output, rightTime, "right"),
      toleranceMicros, outer, broadcastRight)
    SqlBridge.ofRows(spark, plan)
  }

  /** Epoch-micros expression for the events `ts` column (same physical-
    * type dispatch as [[Events.msFromTs]], at micro precision).
    */
  private[graft] def usFromTs(
      dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.LongType =>
        expr("CAST(ts DIV 1000 AS BIGINT)")
      case _ => expr("unix_micros(CAST(ts AS TIMESTAMP))")
    }

  private def eventsUs(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.withColumn("us", usFromTs(ev.schema("ts").dataType)).drop("ts")
  }

  // Both engines read the same parquet; DuckDB's epoch_us floors
  // TIMESTAMP/TIMESTAMP_NS to micros exactly like the Spark reader
  // dispatch above (all values non-negative).
  private val OracleUs = "epoch_us(ts)"

  // ---- q_asof_join: purchase -> latest prior view, left-outer ----------
  // The right side pre-aggregates to one row per (user, us) so the
  // as-of pick is deterministic on both engines; unmatched purchases
  // (view never happened or only later) survive with NULL view_id.
  private val qAsofJoin = QuerySpec.of(
    "q_asof_join",
    s"""WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, $OracleUs AS us
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id AS v_user, $OracleUs AS v_us,
      |    max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT purchase_id, user_id, view_id,
      |  CASE WHEN v_us IS NULL THEN NULL ELSE us - v_us END AS gap_us
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.v_user AND p.us >= v.v_us
      |ORDER BY purchase_id""".stripMargin, headline = true) { (s, d) =>
    val ev = eventsUs(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("us").as("v_us"))
      .agg(max("event_id").as("view_id"))
    join(p, v, Seq("user_id" -> "v_user"), "us", "v_us", None, outer = true)
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        (col("us") - col("v_us")).as("gap_us"))
      .orderBy("purchase_id")
  }

  // ---- q_asof_tolerance: same-day click attribution within 15 min ------
  // Composite key (user, epoch-day) + tolerance + INNER, rolled up per
  // user: exercises every remaining operator knob, and is the
  // realistic "session-scoped last-touch within a window" query.
  private val qAsofTolerance = QuerySpec.of(
    "q_asof_tolerance",
    s"""WITH p AS (
      |  SELECT event_id AS purchase_id, user_id,
      |    $OracleUs AS us, $OracleUs // 86400000000 AS day
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id AS c_user, $OracleUs AS c_us,
      |    $OracleUs // 86400000000 AS c_day, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT p.user_id, p.us - c.c_us AS gap_us
      |  FROM p ASOF JOIN c
      |    ON p.user_id = c.c_user AND p.day = c.c_day AND p.us >= c.c_us
      |  WHERE p.us - c.c_us <= 900000000)
      |SELECT user_id, count(*) AS n_attributed,
      |  CAST(COALESCE(sum(gap_us), 0) AS BIGINT) AS sum_gap_us
      |FROM j GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = eventsUs(s, d)
    // integer DIV (both operands non-negative, so Spark's trunc ==
    // DuckDB's floor `//`); double division could round a just-below-
    // boundary quotient across the day edge
    val day = expr("us DIV 86400000000")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us"), day.as("day"))
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("us").as("c_us"),
        day.as("c_day"))
      .agg(max("event_id").as("click_id"))
    join(p, c, Seq("user_id" -> "c_user", "day" -> "c_day"),
      "us", "c_us", Some(900000000L), outer = false)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_attributed"),
        coalesce(sum(col("us") - col("c_us")), lit(0L)).as("sum_gap_us"))
      .orderBy("user_id")
  }

  // ---- q_asof_broadcast: SCD dimension lookup, zero fact exchange ------
  // Signups form the effective-dated dimension (each signup re-tiers
  // its user: tier = event_id % 5); every OTHER event looks up the
  // user's tier as of its own time. The dimension broadcasts, so the
  // fact side reaches the join straight off the scan — the only
  // exchange in the whole plan is the final rollup's (pinned in
  // AsofJoinSpec). Events before a user's first signup fall in tier
  // -1 (the outer-null bucket).
  private val qAsofBroadcast = QuerySpec.of(
    "q_asof_broadcast",
    s"""WITH f AS (
      |  SELECT event_id, user_id, event_type, $OracleUs AS us
      |  FROM events WHERE event_type <> 'signup'),
      |dim AS (
      |  SELECT user_id AS s_user, $OracleUs AS s_us,
      |    max(event_id) % 5 AS tier
      |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT COALESCE(tier, -1) AS tier, event_type,
      |  count(*) AS n_events,
      |  CAST(COALESCE(sum(us - s_us), 0) AS BIGINT) AS sum_age_us
      |FROM f ASOF LEFT JOIN dim
      |  ON f.user_id = dim.s_user AND f.us >= dim.s_us
      |GROUP BY 1, 2
      |ORDER BY tier, event_type""".stripMargin) { (s, d) =>
    val ev = eventsUs(s, d)
    val f = ev.filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("event_type"), col("us"))
    val dim = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user"), col("us").as("s_us"))
      .agg((max("event_id") % 5).as("tier"))
    join(f, dim, Seq("user_id" -> "s_user"), "us", "s_us",
      None, outer = true, broadcastRight = true)
      .groupBy(coalesce(col("tier"), lit(-1L)).as("tier"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        coalesce(sum(col("us") - col("s_us")), lit(0L)).as("sum_age_us"))
      .orderBy("tier", "event_type")
  }

  // ---- q_stream_asof: the native operator inside a streaming query --
  // Purchase STREAM broadcast-asof-enriched against the static tier
  // dimension (see EventsStreaming.asofViaStream) — stateless per
  // micro-batch, zero fact-side exchange, append-mode exact.
  private val qStreamAsof = QuerySpec.of(
    "q_stream_asof",
    s"""WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, $OracleUs AS us
      |  FROM events WHERE event_type = 'purchase'),
      |dim AS (
      |  SELECT user_id AS s_user, $OracleUs AS s_us,
      |    max(event_id) % 5 AS tier
      |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT COALESCE(tier, -1) AS tier, count(*) AS n_purchases,
      |  CAST(COALESCE(sum(us - s_us), 0) AS BIGINT) AS sum_age_us
      |FROM p ASOF LEFT JOIN dim
      |  ON p.user_id = dim.s_user AND p.us >= dim.s_us
      |GROUP BY 1
      |ORDER BY tier""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.asofViaStream(s, d)
  }

  // ---- q_ts_resample: regular-grid resampling via two as-of passes --
  // Per-user cumulative purchase cents, linearly interpolated onto a
  // global 6-hour grid: backward as-of picks the last observation
  // at-or-before each grid point, forward as-of (the classic negated-
  // time trick) the first at-or-after, then exact integer
  // interpolation between the bracketing pair. Composition is the
  // point: the SECOND as-of runs on the FIRST one's output, whose
  // preserved hash(user) partitioning satisfies the merge's
  // distribution — so the whole backward+forward chain costs ONE
  // grid-side exchange plus a partition-local resort (AsofJoinSpec
  // pins the single-exchange reuse property in general form).
  // Before the first observation the value is NULL; after the last
  // it carries forward; all interpolation arithmetic is non-negative
  // integer multiply-then-truncating-divide, identical in DuckDB.
  private val qTsResample = QuerySpec.of(
    "q_ts_resample",
    s"""WITH e AS (
      |  SELECT event_id, user_id, event_type, $OracleUs AS us,
      |    CAST(floor((value * 100) + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
      |u AS (SELECT DISTINCT user_id FROM e),
      |g AS (
      |  SELECT u.user_id, unnest(generate_series(
      |    ((mn + 21599999999) // 21600000000) * 21600000000,
      |    (mx // 21600000000) * 21600000000, 21600000000)) AS t
      |  FROM u, b),
      |p AS (
      |  SELECT user_id, us,
      |    sum(cents) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id) AS cum
      |  FROM e WHERE event_type = 'purchase'),
      |obs AS (SELECT user_id, us, max(cum) AS cum FROM p GROUP BY 1, 2),
      |bk AS (
      |  SELECT g.user_id, g.t, o.us AS tb, o.cum AS vb
      |  FROM g ASOF LEFT JOIN obs o
      |    ON g.user_id = o.user_id AND g.t >= o.us),
      |fob AS (SELECT user_id, -us AS nus, us, cum FROM obs),
      |fw AS (
      |  SELECT bk.user_id, bk.t, bk.tb, bk.vb, o.us AS ta, o.cum AS va
      |  FROM bk ASOF LEFT JOIN fob o
      |    ON bk.user_id = o.user_id AND -bk.t >= o.nus)
      |SELECT user_id, t AS grid_us,
      |  CASE WHEN vb IS NULL THEN NULL
      |    WHEN va IS NULL THEN vb
      |    WHEN ta = tb THEN vb
      |    ELSE vb + (va - vb) * (t - tb) // (ta - tb) END AS cents
      |FROM fw
      |ORDER BY user_id, grid_us""".stripMargin, headline = true) { (s, d) =>
    val step = 21600000000L
    val ev = eventsUs(s, d).withColumn("cents",
      expr("CAST(floor((value * 100) + 0.5) AS BIGINT)"))
    val bounds = ev.agg(min("us").as("mn"), max("us").as("mx"))
    val grid = ev.select("user_id").distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds to every user
      .withColumn("t", explode(expr(
        s"""CASE WHEN ((mn + ${step - 1}L) DIV ${step}L) * ${step}L
           |  <= (mx DIV ${step}L) * ${step}L
           |THEN sequence(((mn + ${step - 1}L) DIV ${step}L) * ${step}L,
           |  (mx DIV ${step}L) * ${step}L, ${step}L)
           |ELSE array() END""".stripMargin)))
      .select(col("user_id"), col("t"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val obs = ev.filter(col("event_type") === "purchase")
      .withColumn("cum", sum("cents").over(w))
      .groupBy(col("user_id").as("o_user"), col("us").as("o_us"))
      .agg(max("cum").as("o_cum"))
    val bk = join(grid, obs, Seq("user_id" -> "o_user"), "t", "o_us",
      None, outer = true)
      .select(col("user_id"), col("t"),
        col("o_us").as("tb"), col("o_cum").as("vb"))
    val fob = obs.select(col("o_user").as("f_user"),
      (-col("o_us")).as("f_nus"), col("o_us").as("f_us"),
      col("o_cum").as("f_cum"))
    val fw = join(bk.withColumn("nt", -col("t")), fob,
      Seq("user_id" -> "f_user"), "nt", "f_nus", None, outer = true)
    fw.select(col("user_id"), col("t").as("grid_us"),
      when(col("vb").isNull, lit(null).cast("long"))
        .when(col("f_cum").isNull, col("vb"))
        .when(col("f_us") === col("tb"), col("vb"))
        .otherwise(col("vb") + expr(
          "(f_cum - vb) * (t - tb) DIV (f_us - tb)"))
        .as("cents"))
      .orderBy("user_id", "grid_us")
  }

  // ---- q_asof_sql: the pure-SQL spelling ----------------------------
  // Same semantics as q_asof_join, but stated entirely in SQL through
  // the registered graft_asof_match marker — AsofJoinRule lifts the
  // LEFT JOIN into the native plan. AsofSqlSpec pins that the lifted
  // plan contains AsofJoinExec and no nested loop; this query gates
  // the lifted SEMANTICS against DuckDB's real ASOF keyword.
  private val qAsofSql = QuerySpec.of(
    "q_asof_sql",
    s"""WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, $OracleUs AS us
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id AS v_user, $OracleUs AS v_us,
      |    max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT purchase_id, user_id, view_id,
      |  CASE WHEN v_us IS NULL THEN NULL ELSE us - v_us END AS gap_us
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.v_user AND p.us >= v.v_us
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    graft.GraftExtensions.register(s)
    eventsUs(s, d).createOrReplaceTempView("graft_asof_events")
    s.sql(
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, us
        |  FROM graft_asof_events WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id AS v_user, us AS v_us, max(event_id) AS view_id
        |  FROM graft_asof_events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT purchase_id, user_id, view_id,
        |  CASE WHEN v_us IS NULL THEN NULL ELSE us - v_us END AS gap_us
        |FROM p LEFT JOIN v
        |  ON p.user_id = v.v_user AND graft_asof_match(p.us, v.v_us)
        |ORDER BY purchase_id""".stripMargin)
  }

  // ---- q_stream_asof_stream: BOTH sides unbounded -------------------
  // The stateful stream-stream as-of (EventsStreaming.asofStreamStream):
  // watermark-gated emission, event-time-timeout flush, O(in-flight)
  // view state per user. Time-ordered restart staging means nothing
  // is late, so the oracle is the exact batch as-of.
  private val qStreamAsofStream = QuerySpec.of(
    "q_stream_asof_stream",
    s"""WITH p AS (
      |  SELECT event_id AS purchase_id, user_id, $OracleUs AS us
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id AS v_user, $OracleUs AS v_us,
      |    max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT purchase_id, user_id, view_id,
      |  CASE WHEN v_us IS NULL THEN NULL ELSE us - v_us END AS gap_us
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.v_user AND p.us >= v.v_us
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.asofStreamStream(s, d)
  }

  val specs: Seq[QuerySpec] =
    Seq(qAsofJoin, qAsofTolerance, qAsofBroadcast, qStreamAsof,
      qTsResample, qAsofSql, qStreamAsofStream)
}
