package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Logical AS-OF join: for every left row, the single newest right row
  * with equal keys and `rightTime <= leftTime` (optionally within
  * `toleranceMicros`).
  *
  * This is the time-series join the reference's attribution-style
  * queries build by hand from window functions over a UNION (see
  * `q_events_attribution`): a whole-operator semantic Spark's built-in
  * joins can't express — an equi-join would explode every
  * (purchase x earlier view) pair and re-aggregate, and the window
  * encoding forces both relations through one union-wide shuffle and
  * carries every column of both sides through the sort. As its own
  * plan node the join shuffles each side once on its own keys and
  * merges with O(1) memory per partition ([[AsofJoinExec]]).
  *
  * Semantics (matching DuckDB's `ASOF JOIN`, which the oracle uses):
  *  - match = the right row with the greatest `rightTime` among those
  *    with equal keys and `rightTime <= leftTime` (ties on the full
  *    (keys, time) are the caller's to break — pre-aggregate the right
  *    side to one row per (keys, time) for a deterministic result);
  *  - `toleranceMicros`: a candidate only matches while
  *    `leftTime - rightTime <= tolerance`;
  *  - NULL keys and NULL times never match (but left rows still emit
  *    under outer semantics);
  *  - `isOuter = true` -> left-outer (unmatched left rows emit with
  *    NULL right columns); false -> inner.
  *
  * Time expressions must be TIMESTAMP / TIMESTAMP_NTZ / BIGINT — all
  * three carry their value as an 8-byte integer (microseconds for the
  * timestamps), which is what the merge compares.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    isOuter: Boolean,
    broadcastRight: Boolean = false)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    s"as-of join needs matching non-empty key lists, " +
      s"got ${leftKeys.length} vs ${rightKeys.length}")
  require(toleranceMicros.forall(_ >= 0L),
    s"as-of tolerance must be >= 0, got $toleranceMicros")

  private def timeTypeOk(e: Expression): Boolean =
    !e.resolved || (e.dataType match {
      case TimestampType | TimestampNTZType | LongType => true
      case _ => false
    })
  require(timeTypeOk(leftTime) && timeTypeOk(rightTime),
    "as-of time expressions must be TIMESTAMP, TIMESTAMP_NTZ or BIGINT")
  // The merge compares RAW 8-byte values and the broadcast index uses
  // byte-equality, so cross-type pairs (micros vs a bare BIGINT in
  // other units, int vs long keys) would produce silently wrong
  // matches — exactly the failure the fail-loud design forbids. Types
  // must agree exactly; callers cast explicitly.
  require(!leftTime.resolved || !rightTime.resolved ||
    leftTime.dataType == rightTime.dataType,
    s"as-of time types must match exactly, got " +
      s"${if (leftTime.resolved) leftTime.dataType.simpleString else "?"}" +
      s" vs " +
      s"${if (rightTime.resolved) rightTime.dataType.simpleString else "?"}")
  require(leftKeys.zip(rightKeys).forall { case (l, r) =>
    !l.resolved || !r.resolved || l.dataType == r.dataType },
    s"as-of key types must match pairwise, got " +
      leftKeys.zip(rightKeys).map { case (l, r) =>
        s"${if (l.resolved) l.dataType.simpleString else "?"}=" +
          s"${if (r.resolved) r.dataType.simpleString else "?"}"
      }.mkString("(", ", ", ")"))

  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]. Injected through
  * [[graft.GraftExtensions]] (both the config-time
  * `injectPlannerStrategy` path and the live-session
  * `experimental.extraStrategies` path); extra strategies run before
  * Spark's built-ins, so the node never falls through to a join
  * strategy that doesn't know it.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tol, outer, bcast) =>
      // Broadcast dispatch is EXPLICIT (API flag), matching the
      // library-wide "every dimension broadcast is deliberate" style —
      // an auto threshold here would silently flip plan shapes the
      // plan-pin specs assert on.
      if (bcast)
        BroadcastAsofJoinExec(lk, rk, lt, rt, tol, outer,
          planLater(l), planLater(r)) :: Nil
      else
        AsofJoinExec(lk, rk, lt, rt, tol, outer,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
