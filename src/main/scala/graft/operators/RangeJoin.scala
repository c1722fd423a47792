package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Range (interval) joins without an equi-key, planned as binned
  * equi-joins by [[graft.plans.IntervalJoinRule]].
  *
  * `q_events_scd_join` already covers the common interval join that
  * rides a selective equi-key (per-user validity windows); the query
  * here is the other, harder case — GLOBAL windows every event must
  * be tested against, where Spark's only built-in plan is a
  * broadcast-nested-loop over |events| × |windows| predicate
  * evaluations. With the rule, both sides shuffle on a time-bin id
  * and each event meets only the windows overlapping its bin: at 100
  * TB that is the difference between n·m and a partitioned equi-join
  * whose per-bin fan-out the bin width bounds.
  *
  * The whole query is pure SQL through the registered
  * `graft_in_range` function — the declarative surface: a SQL user
  * states the BETWEEN-style predicate and the planner picks the
  * scalable shape (RangeJoinSpec pins the rewritten plan).
  */
object RangeJoin {

  /** 12-hour bins ≈ the window width: each window explodes into 2-3
    * bins.
    */
  private val BinUs = 43200000000L
  private val WindowUs = 43200000000L

  // Global "promo windows" derived from sparse signup events
  // (event_id % 97 == 0): [s_us, s_us + 12 h]. Every event in any
  // window attributes to it; windows overlap freely, so one event may
  // land in several (it is a JOIN, not an as-of pick). Rollup per
  // window: traffic count, distinct users, revenue cents inside.
  private val qRangeJoin = QuerySpec.of(
    "q_range_join",
    s"""WITH w AS (
      |  SELECT event_id AS promo_id, epoch_us(ts) AS lo,
      |    epoch_us(ts) + $WindowUs AS hi
      |  FROM events WHERE event_type = 'signup' AND event_id % 97 = 0),
      |e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us,
      |    CAST(floor((value * 100) + 0.5) AS BIGINT) AS cents,
      |    event_type
      |  FROM events)
      |SELECT w.promo_id, count(*) AS n_events,
      |  count(DISTINCT e.user_id) AS n_users,
      |  CAST(COALESCE(sum(CASE WHEN e.event_type = 'purchase'
      |    THEN e.cents ELSE 0 END), 0) AS BIGINT) AS revenue_cents
      |FROM e JOIN w ON e.us BETWEEN w.lo AND w.hi
      |GROUP BY w.promo_id
      |ORDER BY promo_id""".stripMargin) { (sp, d) =>
    graft.GraftExtensions.register(sp)
    val ev = Tables.events(sp, d)
    ev.withColumn("us", AsofJoin.usFromTs(ev.schema("ts").dataType))
      .createOrReplaceTempView("graft_range_events")
    sp.sql(
      s"""WITH w AS (
        |  SELECT event_id AS promo_id, us AS lo, us + $WindowUs AS hi
        |  FROM graft_range_events
        |  WHERE event_type = 'signup' AND event_id % 97 = 0),
        |e AS (
        |  SELECT event_id, user_id, us,
        |    CAST(floor((value * 100) + 0.5) AS BIGINT) AS cents, event_type
        |  FROM graft_range_events)
        |SELECT w.promo_id, count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users,
        |  coalesce(sum(CASE WHEN e.event_type = 'purchase'
        |    THEN e.cents ELSE 0L END), 0L) AS revenue_cents
        |FROM e JOIN w ON graft_in_range(e.us, w.lo, w.hi, ${BinUs}L)
        |GROUP BY w.promo_id
        |ORDER BY promo_id""".stripMargin)
  }

  val specs: Seq[QuerySpec] = Seq(qRangeJoin)
}
