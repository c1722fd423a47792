package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table: time-bucketed
  * aggregation, gap-based sessionization, funnel analysis, duplicate
  * collapsing, JSON property extraction.
  *
  * The parquet `ts` column has shipped as two physical types across
  * testdata generations — TIMESTAMP(NANOS) (read as raw epoch-nanos
  * long under `spark.sql.legacy.parquet.nanosAsLong`) and
  * timestamp[us] (read as TIMESTAMP_NTZ) — so the reader dispatches on
  * the scanned dtype ([[msFromTs]]) and floors to epoch MILLISECONDS
  * immediately (integer `DIV`, exact — nanos exceed double's 2^53
  * exact-integer range, so no double math). DuckDB's `epoch_ms(ts)`
  * floors the same way, so ms values agree either way.
  *
  * Scale notes: sessionization is one shuffle on user_id (window
  * functions over the user partition); at 100 TB the events table
  * would be date-partitioned and bucketed by user so the window needs
  * no extra exchange.
  */
object Events {

  private val SESSION_GAP_MS = 30 * 60 * 1000L

  /** Epoch-millis expression for a `ts` column of the given scanned
    * dtype. LongType = legacy TIMESTAMP(NANOS) data surfaced as
    * epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong` →
    * integer-floor nanos to ms. Timestamp/TimestampNTZ = current
    * timestamp[us] data → `unix_micros` then integer-floor to ms (the
    * NTZ→TIMESTAMP cast is exact because every session pins
    * `spark.sql.session.timeZone=UTC`, matching the UTC wall-clock the
    * generator wrote).
    */
  private[graft] def msFromTs(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = dt match {
    case org.apache.spark.sql.types.LongType =>
      expr("CAST(ts DIV 1000000 AS BIGINT)")
    case _ =>
      expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000")
  }

  /** events with `ms: Long` (epoch millis) replacing the raw `ts`,
    * whatever physical type `ts` arrived as (see [[msFromTs]]).
    * Session conf is never mutated here — that would be racy under
    * concurrent queries.
    */
  private[operators] def eventsMs(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.withColumn("ms", msFromTs(ev.schema("ts").dataType))
      .drop("ts")
  }

  /** Hour-bucket label from epoch ms, e.g. "2024-01-05 17:00". */
  private def hourLabel(ms: org.apache.spark.sql.Column) =
    date_format(timestamp_millis(ms - ms % 3600000L), "yyyy-MM-dd HH:00")

  // ---- hourly windowed aggregation --------------------------------------
  // `value` is always 2-decimal, so sums run over EXACT integer cents
  // — double summation order differs between Spark's partial
  // aggregation and DuckDB's serial fold, and at sf0.1 an avg landed
  // exactly on a 4-dp rounding boundary and flipped the hash. The avg
  // is then rounded to 4 dp with INTEGER half-up arithmetic on the
  // exact rational cents/n — Spark's round() goes through
  // BigDecimal-of-Double.toString while DuckDB rounds the raw binary
  // double, so even identical input doubles can round apart on a
  // boundary; integer math cannot.
  private[operators] val hourlyOracle =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(floor((value * 100) + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
      |    AS total_value,
      |  CAST((sum(CAST(floor((value * 100) + 0.5) AS BIGINT)) * 200 + count(*))
      |    // (count(*) * 2) AS DOUBLE) / 10000.0 AS avg_value
      |FROM events
      |GROUP BY hour, event_type
      |ORDER BY hour, event_type""".stripMargin

  private[graft] def hourlyAggs: Seq[org.apache.spark.sql.Column] = {
    val cents = "sum(CAST(floor((value * 100) + 0.5) AS BIGINT))"
    Seq(
      count(lit(1)).as("n"),
      expr(s"CAST($cents AS DOUBLE) / 100.0").as("total_value"),
      // integral DIV, not `/` — Spark's long/long division is a double
      expr(s"CAST(($cents * 200 + count(*)) DIV (count(*) * 2) AS DOUBLE)" +
        " / 10000.0").as("avg_value"))
  }

  private val qHourly = QuerySpec.of(
    "q_events_hourly", hourlyOracle, headline = true) { (s, d) =>
    eventsMs(s, d)
      .groupBy(hourLabel(col("ms")).as("hour"), col("event_type"))
      .agg(hourlyAggs.head, hourlyAggs.tail: _*)
      .orderBy("hour", "event_type")
  }

  // ---- gap-based sessionization -----------------------------------------
  private val qSessionize = QuerySpec.of(
    "q_events_sessionize",
    s"""WITH t AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
      |l AS (
      |  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
      |  FROM t),
      |f AS (
      |  SELECT *, CASE WHEN prev IS NULL OR ms - prev > $SESSION_GAP_MS
      |    THEN 1 ELSE 0 END AS brk FROM l),
      |s AS (
      |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ms) AS start_ms, max(ms) - min(ms) AS duration_ms
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin,
    headline = true) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    eventsMs(s, d)
      .select(col("user_id"), col("event_id"), col("ms"))
      .withColumn("prev", lag("ms", 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("ms") - col("prev") > SESSION_GAP_MS, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ms").as("start_ms"),
        (max("ms") - min("ms")).as("duration_ms"))
      .orderBy("user_id", "session_id")
  }

  // ---- signup → purchase funnel -----------------------------------------
  private val qFunnel = QuerySpec.of(
    "q_events_funnel",
    """WITH u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) AS first_signup,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS first_purchase
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users, count(first_signup) AS n_signed_up,
      |  count(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
      |FROM u""".stripMargin) { (s, d) =>
    eventsMs(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ms"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ms"))).as("first_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("first_signup")).as("n_signed_up"),
        count(when(col("first_purchase") > col("first_signup"), 1))
          .as("n_converted"))
  }

  // ---- duplicate collapse (same user/type/minute) -----------------------
  private val qDedup = QuerySpec.of(
    "q_events_dedup",
    """SELECT count(*) AS n_events,
      |  count(DISTINCT (user_id, event_type, epoch_ms(ts) // 60000)) AS n_after_dedup
      |FROM events""".stripMargin) { (s, d) =>
    eventsMs(s, d)
      .select(col("user_id"), col("event_type"),
        expr("CAST(ms DIV 60000 AS BIGINT)").as("minute"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id"), col("event_type"), col("minute"))
          .as("n_after_dedup"))
  }

  // ---- JSON property extraction -----------------------------------------
  private val qJson = QuerySpec.of(
    "q_events_json_props",
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    eventsMs(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")
  }

  // ---- weekly cohort retention ------------------------------------------
  // Classic temporal cohort analysis: users grouped by first-seen week,
  // activity tracked by whole-week offsets from each user's first day,
  // retention reported as exact integer basis points (n·10000 DIV
  // cohort size — no FP division to disagree across engines). Two
  // shuffles (per-user min, cohort rollup); at warehouse scale both
  // key on user_id/cohort — no skew (cohorts are time-bounded).
  private val qRetention = QuerySpec.of(
    "q_events_retention",
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
      |f AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT e.user_id, f.d0 // 7 AS cohort_wk,
      |    (e.day - f.d0) // 7 AS wk
      |  FROM e JOIN f USING (user_id)),
      |r AS (
      |  SELECT cohort_wk, wk, count(*) AS n_users
      |  FROM a GROUP BY cohort_wk, wk),
      |c AS (SELECT cohort_wk, n_users AS cohort_n FROM r WHERE wk = 0)
      |SELECT r.cohort_wk, r.wk, r.n_users, c.cohort_n,
      |  r.n_users * 10000 // c.cohort_n AS retention_bp
      |FROM r JOIN c ON r.cohort_wk = c.cohort_wk
      |ORDER BY r.cohort_wk, wk""".stripMargin) { (s, d) =>
    val e = eventsMs(s, d)
      .select(col("user_id"), expr("CAST(ms DIV 86400000 AS BIGINT)").as("day"))
    val f = e.groupBy("user_id").agg(min("day").as("d0"))
    val a = e.join(f, Seq("user_id"))
      .select(col("user_id"), expr("CAST(d0 DIV 7 AS BIGINT)").as("cohort_wk"),
        expr("CAST((day - d0) DIV 7 AS BIGINT)").as("wk"))
      .distinct()
    val r = a.groupBy("cohort_wk", "wk").agg(count(lit(1)).as("n_users"))
    val c = r.filter(col("wk") === 0)
      .select(col("cohort_wk"), col("n_users").as("cohort_n"))
    r.join(broadcast(c), Seq("cohort_wk"))
      .select(col("cohort_wk"), col("wk"), col("n_users"), col("cohort_n"),
        expr("CAST(n_users * 10000 DIV cohort_n AS BIGINT)")
          .as("retention_bp"))
      .orderBy("cohort_wk", "wk")
  }

  // ---- Structured Streaming variant of the hourly aggregation -----------
  // Same semantics, same oracle: the parquet file drives a streaming
  // query (AvailableNow) into a memory sink in complete mode.
  private val qStreamHourly = QuerySpec.of(
    "q_stream_events_hourly", hourlyOracle) { (s, d) =>
    graft.streaming.EventsStreaming.hourlyViaStream(s, d)
  }

  // ---- stateful streaming sessionization ---------------------------------
  // flatMapGroupsWithState variant of qSessionize — same oracle; the
  // per-user event buffer lives in GroupState (see EventsStreaming).
  private val sessionizeOracle =
    s"""WITH t AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
      |l AS (
      |  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
      |  FROM t),
      |f AS (
      |  SELECT *, CASE WHEN prev IS NULL OR ms - prev > $SESSION_GAP_MS
      |    THEN 1 ELSE 0 END AS brk FROM l),
      |s AS (
      |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ms) AS start_ms, max(ms) - min(ms) AS duration_ms
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  private val qStreamSessions = QuerySpec.of(
    "q_stream_events_sessionize", sessionizeOracle) { (s, d) =>
    graft.streaming.EventsStreaming.sessionizeViaStream(s, d)
  }

  // Declarative twin: native session_window streaming aggregation
  // (gap-merged state-store windows) — same oracle as the stateful
  // sessionizer, proving the two session definitions coincide.
  private val qStreamSessionWindow = QuerySpec.of(
    "q_stream_events_session_window", sessionizeOracle) { (s, d) =>
    graft.streaming.EventsStreaming.sessionWindowViaStream(s, d)
  }

  // ---- streaming duplicate collapse --------------------------------------
  private val qStreamDedup = QuerySpec.of(
    "q_stream_events_dedup",
    """SELECT count(DISTINCT (user_id, event_type, epoch_ms(ts) // 60000))
      |  AS n_after_dedup
      |FROM events""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.dedupViaStream(s, d)
  }

  // ---- as-of join: last-touch attribution --------------------------------
  // For each purchase, the user's most recent PRIOR click — the as-of
  // join (point-in-time lookup) every attribution/feature-store
  // pipeline needs. Spark has no native as-of join; the Spark-first
  // expression is a carry-forward window (`last(..., ignoreNulls)` over
  // rows preceding), which needs ONE shuffle on user_id and one sort —
  // strictly cheaper than the union-merge-scan a generic range join
  // would plan, and the same shape at any scale (per-user history
  // partitions cleanly; no broadcast, no skew beyond the busiest user).
  private val qAttribution = QuerySpec.of(
    "q_events_attribution",
    """WITH t AS (
      |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
      |  FROM events),
      |w AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END
      |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ms END
      |      IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ms
      |  FROM t)
      |SELECT event_id AS purchase_id, user_id, click_id,
      |  ms - click_ms AS gap_ms
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    eventsMs(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ms"))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_ms",
        last(when(col("event_type") === "click", col("ms")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"), (col("ms") - col("click_ms")).as("gap_ms"))
      .orderBy("purchase_id")
  }

  // ---- stream-static enrichment join -------------------------------------
  // Events stream × broadcast customer dim; stateless per-micro-batch
  // hash join, then a per-segment aggregate (see EventsStreaming).
  private val qStreamEnrich = QuerySpec.of(
    "q_stream_events_enrich",
    """SELECT c.c_mktsegment AS segment, e.event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor((e.value * 100) + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 100.0 AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY segment, e.event_type
      |ORDER BY segment, e.event_type""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.enrichViaStream(s, d)
  }

  // ---- rolling engagement: DAU / trailing-7-day WAU / stickiness ---------
  // The classic sliding-distinct problem done the scale-correct way:
  // exact distinct (day, user) pairs FIRST (one shuffle, the only
  // corpus-sized exchange), then a bounded 7-day range join against
  // the tiny day dimension (broadcast — each pair fans out ≤7×), so
  // the rolling distinct never re-scans raw events. Stickiness
  // (DAU/WAU) in exact integer basis points.
  private val qEngagement = QuerySpec.of(
    "q_events_engagement",
    """WITH du AS (
      |  SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
      |wau AS (
      |  SELECT d.day, count(DISTINCT u.user_id) AS wau
      |  FROM days d JOIN du u
      |    ON u.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY d.day)
      |SELECT d.day, dau.dau, wau.wau,
      |  dau.dau * 10000 // wau.wau AS stickiness_bp
      |FROM days d JOIN dau ON d.day = dau.day JOIN wau ON d.day = wau.day
      |ORDER BY d.day""".stripMargin) { (s, d) =>
    val du = eventsMs(s, d)
      .select(expr("CAST(ms DIV 86400000 AS BIGINT)").as("day"),
        col("user_id"))
      .distinct()
      .localCheckpoint() // read 3×: day dim, DAU, WAU range join
    val days = du.select("day").distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = broadcast(days.select(col("day").as("d")))
      .join(du, col("day").between(col("d") - 6, col("d")))
      .groupBy("d")
      .agg(countDistinct("user_id").as("wau"))
      .select(col("d").as("day"), col("wau"))
    days.join(dau, "day").join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("CAST(dau * 10000 DIV wau AS BIGINT)").as("stickiness_bp"))
      .orderBy("day")
  }

  // ---- portable HyperLogLog distinct-user estimate -----------------------
  // The cardinality sketch a 100 TB pipeline actually runs — built
  // PORTABLY so the DuckDB oracle reproduces it bit-for-bit (Spark's
  // approx_count_distinct is engine-private): register = md5-hash64 %
  // m, rank = leading-zero count of the remaining W bits via
  // length(bin(x)) (exact integers in both engines), register maxima
  // are integer maxes, and every 2^-rank term is a DYADIC rational —
  // the register sum is EXACTLY representable in double, so the raw
  // HLL estimate (alpha·m²/S, no small-range correction — that would
  // need ln(), which is not engine-stable) is bit-identical. Reported
  // against the exact distinct with the error in basis points.
  // Shape: one (register) hash-agg of m=64 rows — the whole sketch
  // state is 64 integers at any corpus size.
  private val HllM = 64
  private val HllW = 54 // hash64 is 60-bit; 6 bits pick the register
  private val HllAlpha = 0.709 // alpha_64

  /** Register rank of a 64-bit hash `hv`: position of the first set
    * bit of the W-bit suffix (hv DIV m), W+1 if it is zero. bin() of
    * a positive long never has leading zeros in Spark, but the
    * expression keeps the term so it mirrors the oracle exactly.
    */
  private def hllRank: org.apache.spark.sql.Column = {
    val rest = expr(s"hv DIV $HllM")
    val binr = bin(rest)
    when(rest === 0, lit(HllW + 1))
      .otherwise(lit(HllW) - length(binr)
        + when(substring(binr, 1, 1) === "0",
            length(binr) - length(ltrim(binr, "0"))).otherwise(0)
        + 1)
  }

  /** DuckDB twin of [[hllRank]] over a column expression `x = hv // m`. */
  private def sqlHllRank(x: String): String =
    s"""CASE WHEN $x = 0 THEN ${HllW + 1}
       |  ELSE $HllW - length(bin($x))
       |    + CASE WHEN substr(bin($x), 1, 1) = '0'
       |        THEN length(bin($x)) - length(ltrim(bin($x), '0'))
       |        ELSE 0 END
       |    + 1 END""".stripMargin

  private val qHll = QuerySpec.of(
    "q_events_hll_users", {
      val h = graft.functions.HashFunctions.sqlHash64("user_id")
      s"""WITH h AS (
        |  SELECT DISTINCT $h AS hv FROM events),
        |rr AS (
        |  SELECT hv % $HllM AS reg,
        |    CASE WHEN hv // $HllM = 0 THEN ${HllW + 1}
        |      ELSE $HllW - length(bin(hv // $HllM))
        |        + CASE WHEN substr(bin(hv // $HllM), 1, 1) = '0'
        |            THEN length(bin(hv // $HllM)) -
        |              length(ltrim(bin(hv // $HllM), '0')) ELSE 0 END
        |        + 1 END AS rank
        |  FROM h),
        |mx AS (SELECT reg, max(rank) AS mr FROM rr GROUP BY reg),
        |regs AS (
        |  SELECT r.reg, coalesce(mx.mr, 0) AS mr
        |  FROM (SELECT unnest(range(0, $HllM)) AS reg) r
        |  LEFT JOIN mx ON r.reg = mx.reg),
        |s AS (
        |  SELECT CAST(sum(1.0 / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
        |    AS DOUBLE) AS sm,
        |    CAST(sum(CASE WHEN mr = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS zero_regs
        |  FROM regs),
        |e AS (
        |  SELECT (floor(($HllAlpha * $HllM * $HllM / sm) * 1e6 + 0.5) / 1e6) AS estimate,
        |    zero_regs FROM s),
        |x AS (SELECT count(DISTINCT user_id) AS n_exact FROM events)
        |SELECT x.n_exact, e.estimate, e.zero_regs,
        |  abs(CAST(floor((e.estimate) + 0.5) AS BIGINT) - x.n_exact) * 10000
        |    // x.n_exact AS err_bp
        |FROM e, x""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions.hash64
    val hv = Tables.events(s, d)
      .select(hash64(col("user_id")).as("hv")).distinct()
    val mx = hv.select(pmod(col("hv"), lit(HllM)).as("reg"),
        hllRank.as("rank"))
      .groupBy("reg").agg(max("rank").as("mr"))
    val regs = s.range(0, HllM).select(col("id").as("reg"))
      .join(mx, Seq("reg"), "left")
      .select(coalesce(col("mr"), lit(0)).as("mr"))
    val agg = regs.agg(
      sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT)," +
        " CAST(mr AS INT)) AS DOUBLE)")).as("sm"),
      sum(when(col("mr") === 0, 1L).otherwise(0L)).as("zero_regs"))
    val est = agg.select(
      (floor((lit(HllAlpha) * HllM * HllM / col("sm")) * 1e6 + 0.5) / 1e6).as("estimate"),
      col("zero_regs"))
    val exact = Tables.events(s, d)
      .agg(countDistinct("user_id").as("n_exact"))
    est.crossJoin(exact)
      .select(col("n_exact"), col("estimate"), col("zero_regs"),
        expr("CAST(abs(CAST(floor((estimate) + 0.5) AS BIGINT) - n_exact)" +
          " * 10000 DIV n_exact AS BIGINT)").as("err_bp"))
  }

  // ---- HLL mergeability: per-day sketches vs direct build -----------------
  // The property that makes a sketch a 100 TB tool: per-partition
  // (here per-day) register vectors MERGE by register-wise max into
  // exactly the sketch a direct one-pass build produces. Both paths
  // run end to end — per-day sketches → max-merge → estimate, and the
  // global build → estimate — and the query reports their bit
  // equality as a column, plus the union estimate against the sum of
  // daily exact counts (what naive per-day addition overstates).
  // Sketch state is days × m registers; every rollup is a partial
  // agg.
  private val qHllMerge = QuerySpec.of(
    "q_events_hll_merge", {
      val h = graft.functions.HashFunctions.sqlHash64("user_id")
      s"""WITH b AS (
        |  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d')
        |    AS day, $h AS hv FROM events),
        |rr AS (
        |  SELECT day, hv % $HllM AS reg,
        |    ${sqlHllRank(s"hv // $HllM")} AS rank
        |  FROM b),
        |dm AS (SELECT day, reg, max(rank) AS mr FROM rr
        |       GROUP BY day, reg),
        |merged AS (SELECT reg, max(mr) AS mr FROM dm GROUP BY reg),
        |g AS (SELECT DISTINCT $h AS hv FROM events),
        |gr AS (
        |  SELECT hv % $HllM AS reg,
        |    ${sqlHllRank(s"hv // $HllM")} AS rank
        |  FROM g),
        |direct AS (SELECT reg, max(rank) AS mr FROM gr GROUP BY reg),
        |rm AS (
        |  SELECT r.reg, coalesce(m.mr, 0) AS mm, coalesce(d.mr, 0) AS dm
        |  FROM (SELECT unnest(range(0, $HllM)) AS reg) r
        |  LEFT JOIN merged m ON r.reg = m.reg
        |  LEFT JOIN direct d ON r.reg = d.reg),
        |s AS (
        |  SELECT
        |    CAST(sum(1.0 / CAST((CAST(1 AS BIGINT) << mm) AS DOUBLE))
        |      AS DOUBLE) AS smm,
        |    CAST(sum(1.0 / CAST((CAST(1 AS BIGINT) << dm) AS DOUBLE))
        |      AS DOUBLE) AS smd,
        |    CAST(sum(CASE WHEN mm <> dm THEN 1 ELSE 0 END) AS BIGINT)
        |      AS reg_diffs
        |  FROM rm),
        |x AS (
        |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |    CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT)
        |      AS n_days FROM events),
        |sd AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS sum_daily_exact FROM (
        |    SELECT count(DISTINCT user_id) AS cnt FROM events
        |    GROUP BY date_trunc('day', ts)))
        |SELECT x.n_days, sd.sum_daily_exact, x.n_exact,
        |  (floor(($HllAlpha * $HllM * $HllM / s.smm) * 1e6 + 0.5) / 1e6) AS est_merged,
        |  (floor(($HllAlpha * $HllM * $HllM / s.smd) * 1e6 + 0.5) / 1e6) AS est_direct,
        |  s.reg_diffs,
        |  abs(CAST(floor(($HllAlpha * $HllM * $HllM / s.smm) + 0.5) AS BIGINT)
        |    - x.n_exact) * 10000 // x.n_exact AS err_bp
        |FROM s, x, sd""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions.hash64
    val ev = Tables.events(s, d)
    val b = eventsMs(s, d)
      .select(date_format(timestamp_millis(
          col("ms") - col("ms") % 86400000L), "yyyy-MM-dd").as("day"),
        hash64(col("user_id")).as("hv")).distinct()
    val dm = b.select(col("day"), pmod(col("hv"), lit(HllM)).as("reg"),
        hllRank.as("rank"))
      .groupBy("day", "reg").agg(max("rank").as("mr"))
    val merged = dm.groupBy("reg").agg(max("mr").as("mm"))
    val direct = ev.select(hash64(col("user_id")).as("hv")).distinct()
      .select(pmod(col("hv"), lit(HllM)).as("reg"), hllRank.as("rank"))
      .groupBy("reg").agg(max("rank").as("dm"))
    val rm = s.range(0, HllM).select(col("id").as("reg"))
      .join(merged, Seq("reg"), "left")
      .join(direct, Seq("reg"), "left")
      .select(coalesce(col("mm"), lit(0)).as("mm"),
        coalesce(col("dm"), lit(0)).as("dm"))
    val agg = rm.agg(
      sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT)," +
        " CAST(mm AS INT)) AS DOUBLE)")).as("smm"),
      sum(expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT)," +
        " CAST(dm AS INT)) AS DOUBLE)")).as("smd"),
      sum(when(col("mm") =!= col("dm"), 1L).otherwise(0L))
        .as("reg_diffs"))
    val x = ev.agg(countDistinct("user_id").as("n_exact"))
    val nd = eventsMs(s, d)
      .agg(countDistinct(
        (col("ms") - col("ms") % 86400000L)).as("n_days"))
    val sd = eventsMs(s, d)
      .groupBy((col("ms") - col("ms") % 86400000L).as("dms"))
      .agg(countDistinct("user_id").as("cnt"))
      .agg(sum("cnt").as("sum_daily_exact"))
    agg.crossJoin(x).crossJoin(nd).crossJoin(sd)
      .select(col("n_days"), col("sum_daily_exact"), col("n_exact"),
        (floor((lit(HllAlpha) * HllM * HllM / col("smm")) * 1e6 + 0.5) / 1e6)
          .as("est_merged"),
        (floor((lit(HllAlpha) * HllM * HllM / col("smd")) * 1e6 + 0.5) / 1e6)
          .as("est_direct"),
        col("reg_diffs"),
        expr(s"CAST(abs(CAST(floor(($HllAlpha * $HllM * $HllM / smm) + 0.5)" +
          " AS BIGINT) - n_exact) * 10000 DIV n_exact AS BIGINT)")
          .as("err_bp"))
  }

  // ---- HLL set algebra: audience overlap from mergeable sketches ---------
  // The sketch-algebra capability on top of the portable HLL: per-
  // audience register vectors (viewers / purchasers), their register-
  // wise-max UNION sketch, and the inclusion-exclusion INTERSECTION
  // estimate |V∩P| ≈ est(V) + est(P) − est(V∪P) — the overlap question
  // ("how many purchasers also browsed?") answered from two 64-register
  // sketches that at 100 TB would be maintained incrementally, never
  // re-scanning either audience. Exact counterparts computed alongside
  // price the estimates; err columns are integer basis points of the
  // integer-rounded estimates, so the hash never rides a float
  // boundary.
  private val qHllSetops = QuerySpec.of(
    "q_events_hll_setops", {
      val h = graft.functions.HashFunctions.sqlHash64("user_id")
      def regsOf(tpe: String, alias: String): String =
        s"""$alias AS (
           |  SELECT hv % $HllM AS reg,
           |    max(${sqlHllRank(s"hv // $HllM")}) AS mr
           |  FROM (SELECT DISTINCT $h AS hv FROM events
           |        WHERE event_type = '$tpe')
           |  GROUP BY 1)""".stripMargin
      s"""WITH ${regsOf("view", "rv")},
        |${regsOf("purchase", "rp")},
        |rm AS (
        |  SELECT coalesce(rv.mr, 0) AS mv, coalesce(rp.mr, 0) AS mp,
        |    greatest(coalesce(rv.mr, 0), coalesce(rp.mr, 0)) AS mu
        |  FROM (SELECT unnest(range(0, $HllM)) AS reg) r
        |  LEFT JOIN rv ON r.reg = rv.reg
        |  LEFT JOIN rp ON r.reg = rp.reg),
        |s AS (
        |  SELECT
        |    CAST(sum(1.0 / CAST((CAST(1 AS BIGINT) << mv) AS DOUBLE))
        |      AS DOUBLE) AS sv,
        |    CAST(sum(1.0 / CAST((CAST(1 AS BIGINT) << mp) AS DOUBLE))
        |      AS DOUBLE) AS sp,
        |    CAST(sum(1.0 / CAST((CAST(1 AS BIGINT) << mu) AS DOUBLE))
        |      AS DOUBLE) AS su
        |  FROM rm),
        |e AS (
        |  SELECT
        |    CAST(floor(($HllAlpha * $HllM * $HllM / sv) + 0.5) AS BIGINT) AS ev,
        |    CAST(floor(($HllAlpha * $HllM * $HllM / sp) + 0.5) AS BIGINT) AS ep,
        |    CAST(floor(($HllAlpha * $HllM * $HllM / su) + 0.5) AS BIGINT) AS eu
        |  FROM s),
        |x AS (
        |  SELECT
        |    CAST(count(DISTINCT CASE WHEN event_type = 'view'
        |      THEN user_id END) AS BIGINT) AS nv,
        |    CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
        |      THEN user_id END) AS BIGINT) AS np,
        |    CAST(count(DISTINCT CASE WHEN event_type IN
        |      ('view', 'purchase') THEN user_id END) AS BIGINT) AS nu
        |  FROM events)
        |SELECT x.nv AS n_exact_view, x.np AS n_exact_purchase,
        |  x.nu AS n_exact_union, x.nv + x.np - x.nu AS n_exact_inter,
        |  e.ev AS est_view, e.ep AS est_purchase, e.eu AS est_union,
        |  e.ev + e.ep - e.eu AS est_inter,
        |  abs(e.eu - x.nu) * 10000 // x.nu AS err_union_bp
        |FROM e, x""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions.hash64
    val ev = Tables.events(s, d)
    def regsOf(tpe: String, name: String) = ev
      .filter(col("event_type") === tpe)
      .select(hash64(col("user_id")).as("hv")).distinct()
      .select(pmod(col("hv"), lit(HllM)).as("reg"), hllRank.as("rank"))
      .groupBy("reg").agg(max("rank").as(name))
    val rm = s.range(0, HllM).select(col("id").as("reg"))
      .join(regsOf("view", "mv0"), Seq("reg"), "left")
      .join(regsOf("purchase", "mp0"), Seq("reg"), "left")
      .select(coalesce(col("mv0"), lit(0)).as("mv"),
        coalesce(col("mp0"), lit(0)).as("mp"))
      .withColumn("mu", greatest(col("mv"), col("mp")))
    def invSum(c: String) = sum(expr("1.0 / CAST(shiftleft(" +
      s"CAST(1 AS BIGINT), CAST($c AS INT)) AS DOUBLE)")).as(s"s_$c")
    val agg = rm.agg(invSum("mv"), invSum("mp"), invSum("mu"))
    def estOf(c: String) = expr(
      s"CAST(floor(($HllAlpha * $HllM * $HllM / s_$c) + 0.5) AS BIGINT)")
    val e = agg.select(estOf("mv").as("ev"), estOf("mp").as("ep"),
      estOf("mu").as("eu"))
    val x = ev.agg(
      countDistinct(when(col("event_type") === "view",
        col("user_id"))).as("nv"),
      countDistinct(when(col("event_type") === "purchase",
        col("user_id"))).as("np"),
      countDistinct(when(col("event_type").isin("view", "purchase"),
        col("user_id"))).as("nu"))
    e.crossJoin(x).select(
      col("nv").as("n_exact_view"), col("np").as("n_exact_purchase"),
      col("nu").as("n_exact_union"),
      (col("nv") + col("np") - col("nu")).as("n_exact_inter"),
      col("ev").as("est_view"), col("ep").as("est_purchase"),
      col("eu").as("est_union"),
      (col("ev") + col("ep") - col("eu")).as("est_inter"),
      expr("CAST(abs(eu - nu) * 10000 DIV nu AS BIGINT)")
        .as("err_union_bp"))
  }

  // ---- Poisson bootstrap: deterministic confidence intervals -------------
  // THE at-scale bootstrap: instead of materializing B resamples, each
  // row carries a Poisson(1) count per replicate (the large-n limit of
  // Binomial(n, 1/n) resampling) and every replicate statistic is one
  // weighted aggregate — B=32 replicates cost one 32x row fan-out and
  // one map-side-combinable shuffle, never a per-replicate pass. The
  // Poisson draw is DETERMINISTIC: the row/replicate hash (60-bit)
  // compares against precomputed INTEGER thresholds floor(CDF·2^60)
  // (counts capped at 7, tail mass ~1e-5), so both engines and every
  // rerun draw identical counts — no floats anywhere until nothing.
  // Replicate means are exact scaled-integer rationals; the CI is the
  // (2nd, 31st) order statistics of the 32 replicate means (~2.5/97.5
  // percentile convention, documented not interpolated).
  private val BootB = 32
  private val BootThresholds = Seq(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L,
    1152825534095764625L) // Poisson(1) CDF at k=0..6, scaled 2^60

  // bare integer literals: Spark and DuckDB both parse beyond-int32
  // literals as BIGINT, and DuckDB rejects the `L` suffix
  private def poissonCase(h: String): String =
    BootThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")

  private val qBootstrap = QuerySpec.of(
    "q_events_bootstrap", {
      val h = graft.functions.HashFunctions.sqlHash64(
        "CAST(event_id AS VARCHAR) || ':bs' || CAST(b AS VARCHAR)")
      val pc = poissonCase(s"($h)")
      s"""WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(floor((value * 100) + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, cents, unnest(range(0, $BootB)) AS b,
        |    event_id
        |  FROM e),
        |c AS (SELECT event_type, b, cents, $pc AS cnt FROM r),
        |m AS (
        |  SELECT event_type, b,
        |    CASE WHEN CAST(sum(cnt) AS BIGINT) = 0 THEN 0
        |      ELSE CAST(sum(cnt * cents) AS BIGINT) * 10000
        |        // CAST(sum(cnt) AS BIGINT) END AS mean4
        |  FROM c GROUP BY event_type, b),
        |o AS (
        |  SELECT event_type, mean4,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY mean4, b) AS rn
        |  FROM m),
        |p AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) * 10000 // count(*) AS point4
        |  FROM e GROUP BY event_type)
        |SELECT p.event_type, p.n, p.point4 AS mean_cents_4dp,
        |  max(CASE WHEN o.rn = 2 THEN o.mean4 END) AS ci_lo_4dp,
        |  max(CASE WHEN o.rn = ${BootB - 1} THEN o.mean4 END)
        |    AS ci_hi_4dp
        |FROM p JOIN o ON p.event_type = o.event_type
        |GROUP BY p.event_type, p.n, p.point4
        |ORDER BY p.event_type""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions
    val e = Tables.events(s, d).select(col("event_id"), col("event_type"),
      expr("CAST(floor((value * 100) + 0.5) AS BIGINT)").as("cents"))
    val r = e.withColumn("b", explode(expr(s"sequence(0, ${BootB - 1})")))
    val h = HashFunctions.hash64(concat(col("event_id").cast("string"),
      lit(":bs"), col("b").cast("string")))
    val c = r.select(col("event_type"), col("b"), col("cents"),
        h.as("hv"))
      .withColumn("cnt", expr(poissonCase("hv")))
    val m = c.groupBy("event_type", "b")
      .agg(expr("CASE WHEN sum(cnt) = 0 THEN 0 ELSE" +
        " sum(cnt * cents) * 10000 DIV sum(cnt) END").as("mean4"))
    val o = m.withColumn("rn", row_number().over(
      Window.partitionBy("event_type").orderBy(col("mean4"), col("b"))))
    val p = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("sum(cents) * 10000 DIV count(*)").as("point4"))
    p.join(o, Seq("event_type"))
      .groupBy(col("event_type"), col("n"),
        col("point4").as("mean_cents_4dp"))
      .agg(max(when(col("rn") === 2, col("mean4"))).as("ci_lo_4dp"),
        max(when(col("rn") === BootB - 1, col("mean4"))).as("ci_hi_4dp"))
      .orderBy("event_type")
  }

  // ---- stream-stream interval join: view→purchase conversions ------------
  // Double-watermarked streaming inner join (see EventsStreaming
  // .convertViaStream): purchases match prior views of the same user
  // within 30 minutes; rollup is per-user pair/coverage/lag stats.
  // All-integer output (counts + ms lags) — hash-exact.
  private val qStreamConvert = QuerySpec.of(
    "q_stream_events_convert",
    """WITH v AS (
      |  SELECT user_id, event_id AS view_id, epoch_ms(ts) AS vms
      |  FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS pms
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.user_id, view_id, purchase_id, pms - vms AS lag_ms
      |  FROM p JOIN v ON p.user_id = v.user_id
      |    AND vms <= pms AND pms - vms <= 1800000)
      |SELECT user_id, count(*) AS n_pairs,
      |  count(DISTINCT view_id) AS n_views,
      |  count(DISTINCT purchase_id) AS n_purchases,
      |  min(lag_ms) AS min_lag_ms, max(lag_ms) AS max_lag_ms
      |FROM j GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.convertViaStream(s, d)
  }

  // ---- volume anomaly detection ----------------------------------------
  // Daily event-count outliers per event type: days whose count
  // exceeds mean + 2*stddev of that type's daily series — the basic
  // data-quality monitor over an ingest stream. Determinism: the
  // per-type moments come from EXACT bigint sums (sum, sum of
  // squares) and every double op after that is the same expression
  // tree in both engines (sqrt/divide/multiply — no pow(), no
  // cross-row float accumulation), so the flagged set and z-scores
  // hash-match. Shape: two partial-agg exchanges (day-counts, then
  // per-type moments — ~|types| rows, broadcast back).
  private[graft] val anomalyOracle: String =
    """WITH d AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
      |    AS day, count(*) AS n
      |  FROM events GROUP BY event_type, day),
      |s AS (
      |  SELECT event_type,
      |    CAST(sum(n) AS DOUBLE) / count(*) AS mu,
      |    sqrt(greatest(CAST(sum(n * n) AS DOUBLE) / count(*)
      |      - (CAST(sum(n) AS DOUBLE) / count(*))
      |        * (CAST(sum(n) AS DOUBLE) / count(*)), 0.0)) AS sd
      |  FROM d GROUP BY event_type)
      |SELECT d.event_type, d.day, d.n,
      |  (floor(((CAST(d.n AS DOUBLE) - mu) / sd) * 1e6 + 0.5) / 1e6) AS z
      |FROM d JOIN s USING (event_type)
      |WHERE sd > 0 AND CAST(d.n AS DOUBLE) > mu + 2 * sd
      |ORDER BY event_type, day""".stripMargin

  private val qAnomaly = QuerySpec.of(
    "q_events_anomaly",
    anomalyOracle) { (s, d) =>
    val days = eventsMs(s, d)
      .groupBy(col("event_type"),
        date_format(timestamp_millis(col("ms") - col("ms") % 86400000L),
          "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    anomalyFromDaily(days)
  }

  /** mean+2σ daily-volume outlier flagging over an (event_type, day,
    * n) table — shared by the batch query and the streaming monitor
    * (which produces `days` from the state store instead).
    */
  private[graft] def anomalyFromDaily(days: DataFrame): DataFrame = {
    val mu = col("sn").cast("double") / col("n_days")
    val stats = days.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("n").as("sn"),
        sum(col("n") * col("n")).as("snn"))
      .select(col("event_type"), mu.as("mu"),
        sqrt(greatest(col("snn").cast("double") / col("n_days") - mu * mu,
          lit(0.0))).as("sd"))
    days.join(broadcast(stats), "event_type")
      .filter(col("sd") > 0
        && col("n").cast("double") > col("mu") + lit(2) * col("sd"))
      .select(col("event_type"), col("day"), col("n"),
        (floor(((col("n").cast("double") - col("mu")) / col("sd")) * 1e6 + 0.5) / 1e6).as("z"))
      .orderBy("event_type", "day")
  }

  // ---- streaming per-hour top-k trending types ----------------------------
  // The windowed counts aggregate IN the stream (state-store agg);
  // the rank-within-hour runs as a batch pass over the sink — see
  // EventsStreaming.topkViaStream for why that split is the
  // streaming-native shape.
  private val TrendK = 3
  private val qStreamTopk = QuerySpec.of(
    "q_stream_events_topk",
    s"""WITH h AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY hour, event_type),
      |r AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY hour ORDER BY n DESC, event_type) AS rk FROM h)
      |SELECT hour, event_type, n, rk FROM r WHERE rk <= $TrendK
      |ORDER BY hour, rk""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.topkViaStream(s, d, TrendK)
  }

  // ---- strictly-ordered multi-step funnel ---------------------------------
  // view → click → purchase with first-touch ordering: each step
  // counts only if it happens strictly AFTER the user's first
  // qualifying previous step (the 2-step q_events_funnel ignores
  // ordering beyond the pair). Per-step user counts and step-to-step
  // conversion in exact basis points. Shape: every exchange keys on
  // user_id — a per-user min, a co-partitioned join back, and a
  // second min over the constrained events; no window over the raw
  // corpus.
  private val qFunnelOrdered = QuerySpec.of(
    "q_events_funnel_ordered",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |s1 AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ms END) AS t1
      |  FROM e GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(s1.t1) AS t1,
      |    min(CASE WHEN event_type = 'click' AND ms > s1.t1 THEN ms END)
      |      AS t2
      |  FROM e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE s1.t1 IS NOT NULL GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(s2.t1) AS t1, min(s2.t2) AS t2,
      |    min(CASE WHEN event_type = 'purchase' AND ms > s2.t2 THEN ms END)
      |      AS t3
      |  FROM e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE s2.t2 IS NOT NULL GROUP BY e.user_id),
      |f AS (
      |  SELECT (SELECT count(*) FROM s1) AS n_users,
      |    (SELECT count(t1) FROM s1) AS n_viewed,
      |    (SELECT count(t2) FROM s2) AS n_clicked,
      |    (SELECT count(t3) FROM s3) AS n_purchased)
      |SELECT n_users, n_viewed, n_clicked, n_purchased,
      |  CASE WHEN n_viewed = 0 THEN 0
      |    ELSE n_clicked * 10000 // n_viewed END AS conv12_bp,
      |  CASE WHEN n_clicked = 0 THEN 0
      |    ELSE n_purchased * 10000 // n_clicked END AS conv23_bp
      |FROM f""".stripMargin) { (s, d) =>
    val e = eventsMs(s, d)
      .select(col("user_id"), col("event_type"), col("ms"))
      .localCheckpoint() // three per-step passes re-read the projection
    val s1 = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ms"))).as("t1"))
    val s2 = e.join(s1.filter(col("t1").isNotNull), "user_id")
      .groupBy("user_id")
      .agg(min("t1").as("t1"),
        min(when(col("event_type") === "click" && col("ms") > col("t1"),
          col("ms"))).as("t2"))
    val s3 = e.join(s2.filter(col("t2").isNotNull)
        .select(col("user_id"), col("t2")), "user_id")
      .groupBy("user_id")
      .agg(min("t2").as("t2"),
        min(when(col("event_type") === "purchase" && col("ms") > col("t2"),
          col("ms"))).as("t3"))
    val agg = s1.agg(count(lit(1)).as("n_users"),
        count(col("t1")).as("n_viewed"))
      .crossJoin(s2.agg(count(col("t2")).as("n_clicked")))
      .crossJoin(s3.agg(count(col("t3")).as("n_purchased")))
    agg.select(col("n_users"), col("n_viewed"), col("n_clicked"),
      col("n_purchased"),
      expr("CASE WHEN n_viewed = 0 THEN 0" +
        " ELSE n_clicked * 10000 DIV n_viewed END").as("conv12_bp"),
      expr("CASE WHEN n_clicked = 0 THEN 0" +
        " ELSE n_purchased * 10000 DIV n_clicked END").as("conv23_bp"))
  }

  // ---- A/B experiment analysis --------------------------------------------
  // Deterministic hash bucketing into two variants (the assignment is
  // a pure function of 'experiment:user', so every system — batch,
  // stream, serving — agrees on a user's arm with no assignment
  // table), conversion = any purchase, per-arm rates and the lift in
  // exact signed basis points. One user_id rollup, then a single
  // conditional aggregate — no per-variant self-join.
  private val qAbTest = QuerySpec.of(
    "q_events_ab_test", {
      val h = graft.functions.HashFunctions
        .sqlHash32("'exp1:' || CAST(user_id AS VARCHAR)")
      s"""WITH u AS (
        |  SELECT user_id, ($h) % 2 AS variant,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |v AS (
        |  SELECT
        |    CAST(count(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_a,
        |    CAST(count(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, conv_a * 10000 // n_a AS conv_a_bp,
        |  n_b, conv_b, conv_b * 10000 // n_b AS conv_b_bp,
        |  conv_b * 10000 // n_b - conv_a * 10000 // n_a AS lift_bp
        |FROM v""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions.hash32
    val u = Tables.events(s, d)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("conv"))
      .withColumn("variant",
        pmod(hash32(concat(lit("exp1:"), col("user_id").cast("string"))),
          lit(2)))
    u.agg(
        count(when(col("variant") === 0, 1)).as("n_a"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0))
          .cast("long").as("conv_a"),
        count(when(col("variant") === 1, 1)).as("n_b"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0))
          .cast("long").as("conv_b"))
      .select(col("n_a"), col("conv_a"),
        expr("conv_a * 10000 DIV n_a").as("conv_a_bp"),
        col("n_b"), col("conv_b"),
        expr("conv_b * 10000 DIV n_b").as("conv_b_bp"),
        expr("conv_b * 10000 DIV n_b - conv_a * 10000 DIV n_a")
          .as("lift_bp"))
  }

  // ---- streaming daily-volume anomaly monitor -----------------------------
  // The data-quality monitor run ON the ingest stream: (event_type,
  // day) counts aggregate in the state store; the mean+2σ flagging
  // — which needs each type's full daily series — runs as a batch
  // pass over the sink via the SAME anomalyFromDaily kernel as the
  // batch query, so the two paths provably coincide.
  private val qStreamAnomaly = QuerySpec.of(
    "q_stream_events_anomaly", anomalyOracle) { (s, d) =>
    graft.streaming.EventsStreaming.anomalyViaStream(s, d)
  }

  // ---- session-duration histogram -----------------------------------------
  // Distribution of session lengths on a power-of-two scale: bucket =
  // bit-length of the duration in seconds (the same length(bin(x))
  // device the HLL sketch uses — exact integers in both engines, no
  // log2()). Per bucket: session count, duration bounds, and mean
  // events per session in exact centi-events. Builds on the
  // sessionize shuffle; the histogram itself is a ≤64-group rollup.
  private val qSessionStats = QuerySpec.of(
    "q_events_session_stats",
    s"""WITH t AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
      |l AS (
      |  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
      |  FROM t),
      |f AS (
      |  SELECT *, CASE WHEN prev IS NULL OR ms - prev > $SESSION_GAP_MS
      |    THEN 1 ELSE 0 END AS brk FROM l),
      |s AS (
      |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM f),
      |g AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |    max(ms) - min(ms) AS dur_ms
      |  FROM s GROUP BY user_id, session_id),
      |h AS (
      |  SELECT length(bin(dur_ms // 1000)) AS bucket, n_events, dur_ms
      |  FROM g)
      |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_sessions,
      |  min(dur_ms) AS min_ms, max(dur_ms) AS max_ms,
      |  CAST(sum(n_events) * 100 // count(*) AS BIGINT)
      |    AS mean_events_c
      |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    eventsMs(s, d)
      .select(col("user_id"), col("event_id"), col("ms"))
      .withColumn("prev", lag("ms", 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("ms") - col("prev") > SESSION_GAP_MS, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("ms") - min("ms")).as("dur_ms"))
      .select(length(bin(expr("dur_ms DIV 1000"))).cast("long").as("bucket"),
        col("n_events"), col("dur_ms"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_sessions"),
        min("dur_ms").as("min_ms"), max("dur_ms").as("max_ms"),
        expr("CAST(sum(n_events) * 100 DIV count(*) AS BIGINT)")
          .as("mean_events_c"))
      .orderBy("bucket")
  }

  // ---- event-type transition matrix (first-order Markov chain) -----------
  // Per-user event streams → (prev_type → next_type) transition counts
  // and row-normalized probabilities in exact integer basis points —
  // the behavioral model behind next-action prediction and journey
  // analysis. Shape: ONE shuffle on user_id (the lag window), then a
  // |types|² rollup with map-side combine; the row-total join is a
  // broadcast of ≤|types| rows. Identical shape at 100 TB — per-user
  // histories partition cleanly and the matrix stays tiny.
  private val qMarkov = QuerySpec.of(
    "q_events_markov",
    """WITH t AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
      |  FROM events),
      |l AS (
      |  SELECT event_type AS next_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id)
      |      AS prev_type
      |  FROM t),
      |p AS (
      |  SELECT prev_type, next_type, count(*) AS n
      |  FROM l WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
      |tot AS (
      |  SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
      |  FROM p GROUP BY prev_type)
      |SELECT p.prev_type, p.next_type, p.n, tot.row_total,
      |  CAST(p.n * 10000 // tot.row_total AS BIGINT) AS prob_bp
      |FROM p JOIN tot USING (prev_type)
      |ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val p = eventsMs(s, d)
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // |types|² rows; row totals + output both read
                         // it — without the barrier each consumer
                         // re-runs the corpus scan + window shuffle
    val tot = p.groupBy("prev_type").agg(sum("n").as("row_total"))
    p.join(broadcast(tot), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"), col("row_total"),
        expr("CAST(n * 10000 DIV row_total AS BIGINT)").as("prob_bp"))
      .orderBy("prev_type", "next_type")
  }

  // ---- stream-stream LEFT OUTER interval join: abandoned views -----------
  // Views with no purchase from the same user within 30 minutes —
  // the null-padded outer rows only a watermark can license (see
  // EventsStreaming.abandonViaStream for the eviction mechanics).
  // Oracle: the same classification as a batch left join + EXISTS
  // rollup; all-integer so the compare is hash-exact.
  private val qStreamAbandon = QuerySpec.of(
    "q_stream_events_abandon",
    """WITH v AS (
      |  SELECT user_id, event_id AS view_id, epoch_ms(ts) AS vms
      |  FROM events WHERE event_type = 'view'),
      |p AS (
      |  SELECT user_id, epoch_ms(ts) AS pms
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT v.user_id, v.view_id, count(p.pms) AS nm
      |  FROM v LEFT JOIN p ON p.user_id = v.user_id
      |    AND p.pms >= v.vms AND p.pms <= v.vms + 1800000
      |  GROUP BY 1, 2)
      |SELECT user_id,
      |  count(*) FILTER (nm = 0) AS n_abandoned,
      |  count(*) FILTER (nm > 0) AS n_converted
      |FROM j GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.abandonViaStream(s, d)
  }

  // ---- streaming late-data accounting ------------------------------------
  // Hourly counts when half the corpus arrives a micro-batch late
  // under a 10-minute watermark: odd-id rows whose hour window
  // already closed (window end ≤ max-even-event-time − 10 min) are
  // dropped by the streaming aggregation — the deterministic replay
  // of Spark's late-row rule (see EventsStreaming.lateViaStream for
  // the staging). The oracle recomputes the inclusion predicate
  // directly.
  private val qStreamLate = QuerySpec.of(
    "q_stream_events_late",
    """WITH me AS (
      |  SELECT max(epoch_ms(ts)) - 600000 AS w
      |  FROM events WHERE event_id % 2 = 0),
      |inc AS (
      |  SELECT e.* FROM events e, me
      |  WHERE e.event_id % 2 = 0
      |     OR ((epoch_ms(e.ts) // 3600000) + 1) * 3600000 > me.w)
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
      |  event_type, count(*) AS n
      |FROM inc GROUP BY hour, event_type
      |ORDER BY hour, event_type""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.lateViaStream(s, d)
  }

  // ---- point-in-time SCD interval join ------------------------------------
  // The lookup half of the SCD-2 build: purchases join the tier
  // dimension AS OF their event time. Tier validity intervals come
  // from signup events only (q_events_scd's construction restricted
  // to the dimension-changing type), so the join is a genuine
  // point-in-interval lookup, not a self-lookup; purchases before a
  // user's first signup report tier −1. Join shape: equi-key on
  // user_id with a bounded per-user interval list — the range
  // predicate filters inside the hash match, so there is no
  // range-join blowup at any scale.
  private val qScdJoin = QuerySpec.of(
    "q_events_scd_join",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
      |    CAST(floor((value * 100) + 0.5) AS BIGINT) AS cents,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS k
      |  FROM events),
      |l AS (
      |  SELECT *, lag(k) OVER (PARTITION BY user_id
      |    ORDER BY ms, event_id) AS prev
      |  FROM e WHERE event_type = 'signup'),
      |iv AS (
      |  SELECT user_id, k AS tier, ms AS vfrom,
      |    coalesce(lead(ms) OVER (PARTITION BY user_id
      |      ORDER BY ms, event_id), -1) AS vto
      |  FROM l WHERE prev IS NULL OR k <> prev),
      |p AS (SELECT user_id, ms, cents FROM e
      |      WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.user_id, p.cents, coalesce(iv.tier, -1) AS tier
      |  FROM p LEFT JOIN iv ON p.user_id = iv.user_id
      |    AND p.ms >= iv.vfrom AND (iv.vto = -1 OR p.ms < iv.vto)),
      |a AS (
      |  SELECT tier, count(*) AS n_purchases,
      |    CAST(sum(cents) AS BIGINT) AS revenue_cents
      |  FROM j GROUP BY tier),
      |t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS tot FROM a)
      |SELECT tier, n_purchases, revenue_cents,
      |  CAST(revenue_cents * 10000 // tot AS BIGINT) AS share_bp
      |FROM a, t ORDER BY tier""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val e = eventsMs(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ms"),
        expr("CAST(floor((value * 100) + 0.5) AS BIGINT)").as("cents"),
        (get_json_object(col("props"), "$.k").cast("long") % 4).as("k"))
      .localCheckpoint() // intervals + purchases both read it
    val iv = e.filter(col("event_type") === "signup")
      .withColumn("prev", lag("k", 1).over(byUser))
      .filter(col("prev").isNull || col("k") =!= col("prev"))
      .select(col("user_id"), col("k").as("tier"), col("ms").as("vfrom"),
        col("event_id"))
      .withColumn("vto",
        coalesce(lead("vfrom", 1)
          .over(Window.partitionBy("user_id").orderBy("vfrom", "event_id")),
          lit(-1L)))
      .drop("event_id")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), col("cents"))
    val a = p.join(iv,
        p("user_id") === iv("user_id") && p("ms") >= iv("vfrom")
          && (iv("vto") === -1L || p("ms") < iv("vto")), "left")
      .select(coalesce(col("tier"), lit(-1L)).as("tier"), col("cents"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_purchases"),
        sum("cents").as("revenue_cents"))
      .localCheckpoint() // total + output read it
    val t = a.agg(sum("revenue_cents").as("tot"))
    a.crossJoin(broadcast(t))
      .select(col("tier"), col("n_purchases"), col("revenue_cents"),
        expr("CAST(revenue_cents * 10000 DIV tot AS BIGINT)")
          .as("share_bp"))
      .orderBy("tier")
  }

  // ---- streaming materialized view ----------------------------------------
  // Continuously-maintained per-type totals: foreachBatch merges each
  // micro-batch's partial aggregate into a versioned parquet view
  // with pointer-flip publication and batch-id idempotence (see
  // EventsStreaming.matviewViaStream). The final view must equal the
  // one-shot batch aggregate — exactly this oracle.
  private val qStreamMatview = QuerySpec.of(
    "q_stream_events_matview",
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(floor((value * 100) + 0.5) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.matviewViaStream(s, d)
  }

  // ---- dyadic exponential smoothing forecast ------------------------------
  // One-step-ahead forecasting of the daily volume series with α = ½
  // exponential smoothing computed ENTIRELY in integers: the state
  // recurrence sᵢ = (sᵢ₋₁ + xᵢ) DIV 2 (dyadic halving — the one
  // smoothing constant whose fixpoint math is exact), forecast for
  // day i+1 = sᵢ, scored by integer absolute error. Same
  // calendar-bounded fold shape as q_events_cusum (in-row array
  // aggregate; corpus pays one partial-agg scan); DuckDB replays the
  // recurrence as a RECURSIVE CTE. Output: per-day forecast vs
  // actual with the integer absolute error (−1 marks the unforecast
  // first day).
  private val qSmooth = QuerySpec.of(
    "q_events_smooth",
    """WITH RECURSIVE d AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY day),
      |i AS (SELECT day, n,
      |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |      FROM d),
      |c AS (
      |  SELECT rn, day, n, n AS s, CAST(-1 AS BIGINT) AS forecast
      |  FROM i WHERE rn = 1
      |  UNION ALL
      |  SELECT i.rn, i.day, i.n,
      |    CAST((c.s + i.n) // 2 AS BIGINT), c.s
      |  FROM c, i WHERE i.rn = c.rn + 1)
      |SELECT day, n, forecast,
      |  CASE WHEN forecast < 0 THEN -1 ELSE abs(n - forecast) END
      |    AS abs_err
      |FROM c ORDER BY day""".stripMargin) { (s, d) =>
    eventsMs(s, d)
      .groupBy(date_format(
        timestamp_millis(col("ms") - col("ms") % 86400000L),
        "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("ds"))
      .select(expr(
        """aggregate(ds,
          |  named_struct(
          |    's', CAST(-1 AS BIGINT),
          |    'out', CAST(array() AS
          |      ARRAY<STRUCT<day: STRING, n: BIGINT,
          |                   forecast: BIGINT, abs_err: BIGINT>>)),
          |  (acc, x) -> named_struct(
          |    's', CASE WHEN acc.s < 0 THEN x.n
          |              ELSE (acc.s + x.n) DIV 2 END,
          |    'out', concat(acc.out, array(named_struct(
          |      'day', x.day, 'n', x.n,
          |      'forecast', CASE WHEN acc.s < 0
          |        THEN CAST(-1 AS BIGINT) ELSE acc.s END,
          |      'abs_err', CASE WHEN acc.s < 0 THEN CAST(-1 AS BIGINT)
          |        ELSE abs(x.n - acc.s) END)))),
          |  acc -> acc.out)""".stripMargin).as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.day").as("day"), col("r.n").as("n"),
        col("r.forecast").as("forecast"), col("r.abs_err").as("abs_err"))
      .orderBy("day")
  }

  // ---- weekday × hour traffic heatmap -------------------------------------
  // The operational traffic fingerprint: counts per (day-of-week,
  // hour-of-day) cell with each cell's share of its weekday row in
  // integer bp — one partial-agg scan to a 7×24 rollup.
  private val qDowHour = QuerySpec.of(
    "q_events_dow_hour",
    """WITH c AS (
      |  SELECT CAST(dayofweek(date_trunc('day', ts)) AS BIGINT) AS wd,
      |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hh,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT wd, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY wd)
      |SELECT c.wd, c.hh, c.n,
      |  CAST(c.n * 10000 // r.row_n AS BIGINT) AS row_share_bp
      |FROM c JOIN r USING (wd)
      |ORDER BY c.wd, c.hh""".stripMargin) { (s, d) =>
    // Spark dayofweek is 1..7 (Sun=1); DuckDB 0..6 (Sun=0) — align
    val c = eventsMs(s, d)
      .groupBy(
        (dayofweek(timestamp_millis(col("ms") - col("ms") % 86400000L))
          .cast("long") - 1).as("wd"),
        expr("CAST(ms DIV 3600000 % 24 AS BIGINT)").as("hh"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // row totals + output read it
    val r = c.groupBy("wd").agg(sum("n").as("row_n"))
    c.join(broadcast(r), "wd")
      .select(col("wd"), col("hh"), col("n"),
        expr("CAST(n * 10000 DIV row_n AS BIGINT)").as("row_share_bp"))
      .orderBy("wd", "hh")
  }

  // ---- cohort LTV triangle ------------------------------------------------
  // The lifetime-value triangle: users grouped by first-seen month,
  // purchase revenue accumulated by whole-month age, reported as
  // exact cents plus cumulative per-user value in 10⁻⁴-dollar units
  // (cum_cents·100 DIV cohort_size — one integer division at the
  // end). Month index is pure integer calendar math (year·12+month),
  // so ages are exact; two user-keyed exchanges (first-seen, rollup)
  // and a calendar-bounded cumsum window per cohort.
  private val qCohortLtv = QuerySpec.of(
    "q_events_cohort_ltv",
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(EXTRACT(year FROM ts) * 12 + EXTRACT(month FROM ts) - 1
      |      AS BIGINT) AS midx,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(floor((value * 100) + 0.5) AS BIGINT) ELSE 0 END AS cents
      |  FROM events),
      |f AS (SELECT user_id, min(midx) AS cohort FROM e GROUP BY user_id),
      |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
      |       FROM f GROUP BY cohort),
      |j AS (
      |  SELECT f.cohort, e.midx - f.cohort AS age,
      |    CAST(sum(e.cents) AS BIGINT) AS cents
      |  FROM e JOIN f USING (user_id) GROUP BY 1, 2),
      |c AS (
      |  SELECT cohort, age, cents,
      |    CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |  FROM j)
      |SELECT c.cohort, c.age, cs.cohort_size, c.cents, c.cum_cents,
      |  CAST(c.cum_cents * 100 // cs.cohort_size AS BIGINT)
      |    AS ltv_per_user_e4
      |FROM c JOIN cs USING (cohort)
      |ORDER BY c.cohort, c.age""".stripMargin) { (s, d) =>
    val e = eventsMs(s, d)
      .select(col("user_id"),
        (year(timestamp_millis(col("ms"))) * 12
          + month(timestamp_millis(col("ms"))) - 1).cast("long")
          .as("midx"),
        when(col("event_type") === "purchase",
          expr("CAST(floor((value * 100) + 0.5) AS BIGINT)")).otherwise(0L)
          .as("cents"))
      .localCheckpoint() // first-seen + rollup read it
    val f = e.groupBy("user_id").agg(min("midx").as("cohort"))
    val cs = f.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    val j = e.join(f, "user_id")
      .groupBy(col("cohort"), (col("midx") - col("cohort")).as("age"))
      .agg(sum("cents").as("cents"))
    j.withColumn("cum_cents",
        sum("cents").over(Window.partitionBy("cohort").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(cs), "cohort")
      .select(col("cohort"), col("age"), col("cohort_size"), col("cents"),
        col("cum_cents"),
        expr("CAST(cum_cents * 100 DIV cohort_size AS BIGINT)")
          .as("ltv_per_user_e4"))
      .orderBy("cohort", "age")
  }

  // ---- weekday seasonality profile ----------------------------------------
  // Day-of-week traffic index: each weekday's mean daily volume as
  // integer basis points of the overall mean — the seasonality
  // fingerprint a forecast or anomaly baseline divides out. The bp
  // index is computed as one exact integer expression
  // (wd_total · n_days · 10⁴) DIV (total · wd_days), so no float mean
  // ever materializes. One partial-agg exchange; the weekday rollup
  // is 7 rows.
  private val qWeekday = QuerySpec.of(
    "q_events_weekday_profile",
    """WITH d AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(dayofweek(date_trunc('day', ts)) AS BIGINT) AS wd,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT wd, CAST(count(*) AS BIGINT) AS wd_days,
      |    CAST(sum(n) AS BIGINT) AS wd_total
      |  FROM d GROUP BY wd),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
      |        CAST(sum(n) AS BIGINT) AS total FROM d)
      |SELECT wd, wd_days, wd_total,
      |  CAST(wd_total * n_days * 10000 // (total * wd_days) AS BIGINT)
      |    AS index_bp
      |FROM w, t ORDER BY wd""".stripMargin) { (s, d) =>
    // DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek:
    // 1=Sunday..7 — align by subtracting 1
    val days = eventsMs(s, d)
      .groupBy(
        date_format(timestamp_millis(col("ms") - col("ms") % 86400000L),
          "yyyy-MM-dd").as("day"),
        (dayofweek(timestamp_millis(col("ms") - col("ms") % 86400000L))
          .cast("long") - 1).as("wd"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // weekday rollup + totals read it
    val w = days.groupBy("wd")
      .agg(count(lit(1)).as("wd_days"), sum("n").as("wd_total"))
    val t = days.agg(count(lit(1)).as("n_days"), sum("n").as("total"))
    w.crossJoin(broadcast(t))
      .select(col("wd"), col("wd_days"), col("wd_total"),
        expr("CAST(wd_total * n_days * 10000 DIV (total * wd_days)" +
          " AS BIGINT)").as("index_bp"))
      .orderBy("wd")
  }

  // ---- Theil–Sen robust trend ---------------------------------------------
  // Median-of-pairwise-slopes trend over the daily volume series —
  // the robust regression whose breakdown point (29%) shrugs off the
  // very anomalies q_events_anomaly flags. Slopes are integer
  // micro-units per day ((nⱼ−nᵢ)·10⁶ DIV Δdays), the median is the
  // lower median (the same ⌈n/2⌉ rank rule as the MAD detector), so
  // the result is hash-exact. The day series is calendar-bounded, so
  // the O(days²) pair set is tiny at ANY corpus size — the corpus
  // only pays one partial-agg scan.
  private val qTrend = QuerySpec.of(
    "q_events_trend",
    """WITH d AS (
      |  SELECT CAST(epoch_ms(date_trunc('day', ts)) // 86400000
      |    AS BIGINT) AS dayn, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT (b.n - a.n) * 1000000 // (b.dayn - a.dayn) AS slope_e6
      |  FROM d a JOIN d b ON b.dayn > a.dayn),
      |r AS (
      |  SELECT slope_e6, row_number() OVER (ORDER BY slope_e6) AS rk,
      |    count(*) OVER () AS cnt FROM p)
      |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
      |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pairs,
      |  CAST((SELECT slope_e6 FROM r WHERE rk = (cnt + 1) // 2)
      |    AS BIGINT) AS trend_slope_e6_per_day""".stripMargin) { (s, d) =>
    val days = eventsMs(s, d)
      .groupBy((col("ms") / lit(86400000L)).cast("long").as("dayn"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // both sides of the pair join read it
    val a = days.toDF("da", "na")
    val b = days.toDF("db", "nb")
    // FLOOR division, not DIV: slopes go negative, and Spark's DIV
    // truncates toward zero while DuckDB's // floors. The double
    // detour is exact here: |numerator| < 2^40 and Δdays ≤ the
    // calendar span, so a true-integer quotient is hit exactly and a
    // fractional one can't round across a whole number.
    val slopes = a.join(b, col("db") > col("da"))
      .select(expr("CAST(FLOOR(CAST((nb - na) * 1000000 AS DOUBLE)" +
        " / (db - da)) AS BIGINT)").as("slope_e6"))
    val ranked = slopes
      .withColumn("rk", row_number().over(
        Window.orderBy("slope_e6")))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy()))
    val med = ranked.filter(col("rk") === expr("(cnt + 1) DIV 2"))
      .select(col("slope_e6").as("trend_slope_e6_per_day"))
    val nd = days.agg(count(lit(1)).as("n_days"))
    val np = slopes.agg(count(lit(1)).as("n_pairs"))
    nd.crossJoin(np).crossJoin(med)
      .select("n_days", "n_pairs", "trend_slope_e6_per_day")
  }

  // ---- portable histogram quantiles --------------------------------------
  // The fixed-bin histogram quantile sketch: per event type, `value`
  // lands in 1000-cent-wide bins (50 bins over this corpus's [0,500)
  // range); P50/P90/P99 are reported as the lower edge of the first
  // bin whose cumulative count reaches ⌈q·n⌉, plus the exact
  // per-bin-width error bound the method guarantees. Sketch state is
  // |types|×50 integers at ANY corpus size — the mergeable
  // fixed-memory shape (like the CM/HLL sketches) a 100 TB quantile
  // pass actually uses; everything is integer, so cross-engine
  // hash-exact where a t-digest never could be.
  private val HistBinCents = 1000L

  private val qValueHistogram = QuerySpec.of(
    "q_events_value_histogram",
    s"""WITH b AS (
      |  SELECT event_type,
      |    CAST(floor((value * 100) + 0.5) AS BIGINT) // $HistBinCents AS bin,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, bin, n,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bin
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
      |  FROM b)
      |SELECT event_type, CAST(max(tot) AS BIGINT) AS n,
      |  CAST(min(CASE WHEN cum * 100 >= tot * 50 THEN bin END)
      |    * $HistBinCents AS BIGINT) AS p50_lo_cents,
      |  CAST(min(CASE WHEN cum * 100 >= tot * 90 THEN bin END)
      |    * $HistBinCents AS BIGINT) AS p90_lo_cents,
      |  CAST(min(CASE WHEN cum * 100 >= tot * 99 THEN bin END)
      |    * $HistBinCents AS BIGINT) AS p99_lo_cents,
      |  CAST($HistBinCents AS BIGINT) AS max_err_cents
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
    val b = Tables.events(s, d)
      .select(col("event_type"),
        expr(s"CAST(floor((value * 100) + 0.5) AS BIGINT) DIV $HistBinCents")
          .as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy("event_type")
    def pAt(q: Int) = min(when(
      col("cum") * 100 >= col("tot") * q, col("bin"))) * HistBinCents
    b.withColumn("cum", sum("n").over(wCum))
      .withColumn("tot", sum("n").over(wTot))
      .groupBy("event_type")
      .agg(max("tot").as("n"),
        pAt(50).cast("long").as("p50_lo_cents"),
        pAt(90).cast("long").as("p90_lo_cents"),
        pAt(99).cast("long").as("p99_lo_cents"))
      .withColumn("max_err_cents", lit(HistBinCents))
      .orderBy("event_type")
  }

  // ---- SCD-2 dimension construction --------------------------------------
  // Slowly-changing-dimension type 2 built from the raw event stream:
  // each user's derived tier (props.k mod 4) becomes a validity
  // interval [valid_from_ms, valid_to_ms) opened at the event that
  // changed it and closed by the next change (-1 = still current) —
  // the change-data-capture → dimension-table transform every
  // warehouse ingest runs. One shuffle on user_id feeds both windows
  // (change detection and interval close share the same sort), so
  // the whole build is a single exchange at any scale.
  private val qScd = QuerySpec.of(
    "q_events_scd",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS tier
      |  FROM events),
      |l AS (
      |  SELECT *, lag(tier) OVER (PARTITION BY user_id
      |    ORDER BY ms, event_id) AS prev_tier FROM e),
      |ch AS (
      |  SELECT user_id, event_id, ms, tier FROM l
      |  WHERE prev_tier IS NULL OR tier <> prev_tier),
      |iv AS (
      |  SELECT user_id, tier, ms AS valid_from_ms,
      |    coalesce(lead(ms) OVER (PARTITION BY user_id
      |      ORDER BY ms, event_id), -1) AS valid_to_ms
      |  FROM ch)
      |SELECT user_id, tier, valid_from_ms, valid_to_ms
      |FROM iv ORDER BY user_id, valid_from_ms""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    eventsMs(s, d)
      .select(col("user_id"), col("event_id"), col("ms"),
        (get_json_object(col("props"), "$.k").cast("long") % 4).as("tier"))
      .withColumn("prev_tier", lag("tier", 1).over(byUser))
      .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
      .select(col("user_id"), col("event_id"), col("tier"),
        col("ms").as("valid_from_ms"))
      .withColumn("valid_to_ms",
        coalesce(lead("valid_from_ms", 1)
          .over(Window.partitionBy("user_id")
            .orderBy("valid_from_ms", "event_id")),
          lit(-1L)))
      .select("user_id", "tier", "valid_from_ms", "valid_to_ms")
      .orderBy("user_id", "valid_from_ms")
  }

  // ---- daily pivot matrix -------------------------------------------------
  // Day × event-type count matrix via a true relational PIVOT with an
  // EXPLICIT value list — Spark then plans ONE scan + one partial-agg
  // exchange (an implicit pivot would need a distinct pre-pass over
  // the key space first; at 100 TB that's a full extra scan). The
  // oracle is the equivalent conditional aggregation.
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val qPivot = QuerySpec.of(
    "q_events_pivot", {
      val cols = EventTypes.map(t =>
        s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS n_$t")
        .mkString(",\n      |  ")
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  $cols,
        |  count(*) AS n_total
        |FROM events GROUP BY day ORDER BY day""".stripMargin
    }) { (s, d) =>
    // ONE corpus-sized aggregation to (day, event_type, n) — days ×
    // types rows — then pivot and total over that tiny intermediate.
    // n_total sums EVERY type (not just the explicit pivot list), so
    // it stays equal to the oracle's count(*) even if the corpus
    // gains an event_type outside EventTypes. localCheckpoint pins
    // the intermediate so the two consumers don't re-scan the corpus.
    val perType = eventsMs(s, d)
      .select(date_format(
        timestamp_millis(col("ms") - col("ms") % 86400000L),
        "yyyy-MM-dd").as("day"), col("event_type"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val pivoted = perType
      .groupBy("day")
      .pivot("event_type", EventTypes)
      .agg(sum("n"))
    val totals = perType.groupBy("day").agg(sum("n").as("n_total"))
    EventTypes.foldLeft(pivoted) { (df, t) =>
        df.withColumn(s"n_$t", coalesce(col(t), lit(0L))).drop(t)
      }
      .join(totals, "day")
      .select(Seq(col("day")) ++ EventTypes.map(t => col(s"n_$t")) :+
        col("n_total"): _*)
      .orderBy("day")
  }

  // ---- robust (MAD) daily-volume anomaly ---------------------------------
  // The median/MAD twin of q_events_anomaly: flag days whose count
  // exceeds median + 3·MAD of that type's daily series — robust to
  // the very outliers a mean+σ rule lets poison its own threshold.
  // Median is the LOWER median (rank ⌈n/2⌉ of the ascending sort), so
  // every quantity stays integer and the compare is hash-exact; the
  // day series per type is calendar-bounded, so the rank windows run
  // over tiny partitions after one corpus-sized partial agg.
  private val qMadAnomaly = QuerySpec.of(
    "q_events_robust_anomaly",
    """WITH d AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
      |    AS day, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |      ORDER BY n, day) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS cnt FROM d),
      |med AS (SELECT event_type, n AS med FROM r WHERE rk = (cnt + 1) // 2),
      |ad AS (
      |  SELECT d.event_type, d.day, d.n, med, abs(d.n - med) AS adev
      |  FROM d JOIN med USING (event_type)),
      |r2 AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |      ORDER BY adev, day) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS cnt FROM ad),
      |mad AS (SELECT event_type, adev AS mad FROM r2
      |        WHERE rk = (cnt + 1) // 2)
      |SELECT ad.event_type, ad.day, ad.n, ad.med, mad.mad
      |FROM ad JOIN mad USING (event_type)
      |WHERE ad.n > ad.med + 3 * mad.mad
      |ORDER BY ad.event_type, ad.day""".stripMargin) { (s, d) =>
    val days = eventsMs(s, d)
      .groupBy(col("event_type"),
        date_format(timestamp_millis(col("ms") - col("ms") % 86400000L),
          "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // ranked twice + the final join read it
    def lowerMedian(df: DataFrame, valueCol: String, out: String) = {
      val w = Window.partitionBy("event_type").orderBy(col(valueCol), col("day"))
      val wc = Window.partitionBy("event_type")
      df.withColumn("rk", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(col("rk") === expr("(cnt + 1) DIV 2")) // integer div — / is double
        .select(col("event_type"), col(valueCol).as(out))
    }
    val med = lowerMedian(days, "n", "med")
    val ad = days.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("n") - col("med")))
    val mad = lowerMedian(ad, "adev", "mad")
    ad.join(broadcast(mad), "event_type")
      .filter(col("n") > col("med") + lit(3) * col("mad"))
      .select("event_type", "day", "n", "med", "mad")
      .orderBy("event_type", "day")
  }

  // ---- stateful sessionization with event-time timeout -------------------
  // The cross-batch sessionizer: per-user buffers merge across
  // micro-batches, sessions emit only once the watermark proves them
  // final, idle users flush via GroupState event-time timeout, and
  // arrivals at or behind the watermark drop (the same ≤ rule the
  // aggregation path uses) — see EventsStreaming
  // .sessionTimeoutViaStream. With the even-then-odd staging the
  // surviving set is deterministic, so the oracle is the batch
  // sessionizer over exactly that set.
  private val qStreamSessionTimeout = QuerySpec.of(
    "q_stream_events_session_timeout",
    s"""WITH me AS (
      |  SELECT max(epoch_ms(ts)) - 600000 AS w
      |  FROM events WHERE event_id % 2 = 0),
      |t AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events, me
      |  WHERE event_id % 2 = 0 OR epoch_ms(ts) > me.w),
      |l AS (
      |  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev
      |  FROM t),
      |f AS (
      |  SELECT *, CASE WHEN prev IS NULL OR ms - prev > $SESSION_GAP_MS
      |    THEN 1 ELSE 0 END AS brk FROM l),
      |s AS (
      |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ms) AS start_ms, max(ms) - min(ms) AS duration_ms
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.sessionTimeoutViaStream(s, d)
  }

  // ---- exactly-once resume proof ------------------------------------------
  // The hourly aggregation driven through five restarts against one
  // checkpoint, including two EMPTY restarts (see EventsStreaming
  // .reprocessViaStream): any re-ingestion or re-emission across a
  // resume would double counts, so matching the plain batch aggregate
  // IS the exactly-once evidence.
  private val qStreamReprocess = QuerySpec.of(
    "q_stream_events_reprocess",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
      |  event_type, count(*) AS n
      |FROM events GROUP BY hour, event_type
      |ORDER BY hour, event_type""".stripMargin) { (s, d) =>
    graft.streaming.EventsStreaming.reprocessViaStream(s, d)
  }

  // ---- time-weighted per-user value -------------------------------------
  // Each event's value holds until the user's next event; the user's
  // time-weighted mean is Σ(value·Δt)/Σ(Δt) over consecutive pairs.
  // All arithmetic is exact bigint (cents × ms; the quotient is
  // emitted in value×10⁴ units via integer division — value ≥ 0 in
  // this corpus, so trunc-vs-floor division cannot diverge between
  // engines). One shuffle on user_id for the lead window; same
  // exchange the sessionizer uses.
  private val qTimeWeighted = QuerySpec.of(
    "q_events_time_weighted",
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CAST(floor((value * 100) + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |l AS (
      |  SELECT *, lead(ms) OVER (PARTITION BY user_id
      |    ORDER BY ms, event_id) AS nxt FROM t),
      |w AS (
      |  SELECT user_id, cents * (nxt - ms) AS num, nxt - ms AS dt
      |  FROM l WHERE nxt IS NOT NULL)
      |SELECT user_id,
      |  CAST(sum(dt) AS BIGINT) AS span_ms,
      |  CAST(sum(num) * 100 // sum(dt) AS BIGINT) AS tw_value_e4
      |FROM w GROUP BY user_id HAVING sum(dt) > 0
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    eventsMs(s, d)
      .select(col("user_id"), col("event_id"), col("ms"),
        expr("CAST(floor((value * 100) + 0.5) AS BIGINT)").as("cents"))
      .withColumn("nxt", lead("ms", 1).over(byUser))
      .filter(col("nxt").isNotNull)
      .select(col("user_id"),
        (col("cents") * (col("nxt") - col("ms"))).as("num"),
        (col("nxt") - col("ms")).as("dt"))
      .groupBy("user_id")
      .agg(sum("dt").as("span_ms"),
        expr("CAST(sum(num) * 100 DIV sum(dt) AS BIGINT)").as("tw_value_e4"))
      .filter(col("span_ms") > 0)
      .orderBy("user_id")
  }

  // ---- CUSUM changepoint score over the daily volume series --------------
  // Two-sided cumulative-sum drift detector on daily total event
  // counts: S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − μ), S⁻ mirrored — scaled by
  // n_days so μ = total/n stays integer-exact (units: count·days).
  // The recurrence is inherently sequential, but its input is the
  // DAY-level aggregate — bounded by the calendar, not the data —
  // so the corpus-sized work is one partial-agg shuffle and the fold
  // runs over a ~30-element in-row array (sort_array + aggregate
  // HOF), never a corpus-wide single-partition window. DuckDB
  // replays the same fold as a RECURSIVE CTE.
  private val qCusum = QuerySpec.of(
    "q_events_cusum",
    """WITH RECURSIVE d AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY day),
      |i AS (SELECT day, n,
      |        CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
      |      FROM d),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS nd,
      |        CAST(sum(n) AS BIGINT) AS tot FROM d),
      |c AS (
      |  SELECT i.rn, i.day, i.n,
      |    CAST(greatest(0, s.nd * i.n - s.tot) AS BIGINT) AS cusum_pos,
      |    CAST(greatest(0, s.tot - s.nd * i.n) AS BIGINT) AS cusum_neg
      |  FROM i, s WHERE i.rn = 1
      |  UNION ALL
      |  SELECT i.rn, i.day, i.n,
      |    CAST(greatest(0, c.cusum_pos + s.nd * i.n - s.tot) AS BIGINT),
      |    CAST(greatest(0, c.cusum_neg + s.tot - s.nd * i.n) AS BIGINT)
      |  FROM c, i, s WHERE i.rn = c.rn + 1)
      |SELECT day, n, cusum_pos, cusum_neg FROM c ORDER BY day""".stripMargin) {
    (s, d) =>
    eventsMs(s, d)
      .groupBy(date_format(
        timestamp_millis(col("ms") - col("ms") % 86400000L),
        "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("ds"))
      .select(col("ds"), size(col("ds")).cast("bigint").as("nd"),
        expr("aggregate(ds, CAST(0 AS BIGINT), (a, x) -> a + x.n)").as("tot"))
      .select(expr(
        """aggregate(ds,
          |  named_struct(
          |    'sp', CAST(0 AS BIGINT), 'sn', CAST(0 AS BIGINT),
          |    'out', CAST(array() AS
          |      ARRAY<STRUCT<day: STRING, n: BIGINT,
          |                   cusum_pos: BIGINT, cusum_neg: BIGINT>>)),
          |  (acc, x) -> named_struct(
          |    'sp', greatest(CAST(0 AS BIGINT), acc.sp + nd * x.n - tot),
          |    'sn', greatest(CAST(0 AS BIGINT), acc.sn + tot - nd * x.n),
          |    'out', concat(acc.out, array(named_struct(
          |      'day', x.day, 'n', x.n,
          |      'cusum_pos', greatest(CAST(0 AS BIGINT), acc.sp + nd * x.n - tot),
          |      'cusum_neg', greatest(CAST(0 AS BIGINT), acc.sn + tot - nd * x.n))))),
          |  acc -> acc.out)""".stripMargin).as("rows"))
      .select(explode(col("rows")).as("r"))
      .select(col("r.day").as("day"), col("r.n").as("n"),
        col("r.cusum_pos").as("cusum_pos"), col("r.cusum_neg").as("cusum_neg"))
      .orderBy("day")
  }

  val specs: Seq[QuerySpec] =
    Seq(qHourly, qSessionize, qFunnel, qDedup, qJson, qRetention,
      qAttribution, qAnomaly, qEngagement, qHll, qMarkov, qStreamHourly,
      qStreamSessions, qStreamSessionWindow, qStreamDedup, qStreamEnrich,
      qStreamConvert, qStreamTopk, qSessionStats, qAbTest, qStreamAnomaly,
      qFunnelOrdered, qTimeWeighted, qCusum, qStreamAbandon, qStreamLate,
      qPivot, qMadAnomaly, qScd, qValueHistogram, qStreamSessionTimeout,
      qScdJoin, qWeekday, qTrend, qStreamMatview, qHllMerge, qSmooth,
      qStreamReprocess, qCohortLtv, qDowHour, qHllSetops, qBootstrap)
}
