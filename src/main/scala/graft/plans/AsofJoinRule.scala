package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.AsofMatchExpr

/** Lifts `JOIN ... ON <equi-keys> AND graft_asof_match(lt, rt[, tol])`
  * into the native [[AsofJoinPlan]] — the pure-SQL spelling of an
  * AS-OF join (DuckDB's `ASOF JOIN` keyword, minus the keyword):
  *
  * {{{
  *   SELECT ... FROM purchases p
  *   LEFT JOIN views v
  *     ON p.user_id = v.user_id AND graft_asof_match(p.us, v.us)
  * }}}
  *
  * Conditions for the lift — ALL must hold, because the marker is
  * [[org.apache.spark.sql.catalyst.expressions.Unevaluable]] and a
  * join it cannot be lifted from fails at planning (deliberately:
  * evaluated naively the marker would mean "every prior row", a
  * silent cardinality change):
  *
  *  - join type INNER or LEFT OUTER (the probe side must be the
  *    preserved side);
  *  - exactly one marker conjunct, its left time reading only from
  *    the join's left side and its right time only from the right
  *    (INNER additionally accepts the swapped orientation and
  *    re-projects the output order);
  *  - every remaining conjunct an equality with one side per plan
  *    (the as-of keys), at least one;
  *  - tolerance, when present, a foldable non-negative BIGINT.
  *
  * The lifted plan then picks its physical shape through
  * [[AsofJoinStrategy]] exactly like the DataFrame API path.
  */
object AsofJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, Some(cond), _)
        if (jt == Inner || jt == LeftOuter) && j.resolved &&
          cond.exists(_.isInstanceOf[AsofMatchExpr]) =>
      lift(j).getOrElse(j)
  }

  private def lift(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val (markers, rest) = conjuncts.partition(_.isInstanceOf[AsofMatchExpr])
    markers match {
      case Seq(m: AsofMatchExpr) =>
        for {
          tol <- tolOf(m)
          swapped <- orientation(m, j)
          keys <- equiKeys(rest, j)
          if keys.nonEmpty
        } yield {
          val (lks, rks) = keys.unzip
          val asof =
            if (!swapped)
              AsofJoinPlan(j.left, j.right, lks, rks, m.leftTime,
                m.rightTime, tol, isOuter = j.joinType == LeftOuter)
            else // inner only (orientation() guarantees it): probe is
                 // the right plan; re-project to the join's output order
              AsofJoinPlan(j.right, j.left, rks, lks, m.leftTime,
                m.rightTime, tol, isOuter = false)
          Project(j.output, asof)
        }
      case _ => None // several markers: ambiguous, leave (fails loud)
    }
  }

  /** Some(None) = no tolerance; Some(Some(us)) = foldable literal;
    * None = cannot lift.
    */
  private def tolOf(m: AsofMatchExpr): Option[Option[Long]] =
    m.tolerance match {
      case None => Some(None)
      case Some(t) if t.foldable && t.dataType == LongType =>
        t.eval(null) match {
          case v: Long if v >= 0L => Some(Some(v))
          case _ => None
        }
      case _ => None
    }

  /** Some(false) = marker times align with (left, right); Some(true) =
    * swapped (inner only); None = cannot lift.
    */
  private def orientation(m: AsofMatchExpr, j: Join): Option[Boolean] = {
    def from(e: Expression, p: LogicalPlan): Boolean =
      e.deterministic && e.references.nonEmpty &&
        e.references.subsetOf(p.outputSet)
    if (from(m.leftTime, j.left) && from(m.rightTime, j.right))
      Some(false)
    else if (j.joinType == Inner &&
      from(m.leftTime, j.right) && from(m.rightTime, j.left))
      Some(true)
    else None
  }

  /** All residual conjuncts as (leftKey, rightKey) pairs, or None if
    * any conjunct is not a one-side-each equality.
    */
  private def equiKeys(rest: Seq[Expression], j: Join)
      : Option[Seq[(Expression, Expression)]] = {
    def from(e: Expression, p: LogicalPlan): Boolean =
      e.deterministic && e.references.subsetOf(p.outputSet)
    val pairs = rest.map {
      case EqualTo(a, b) if from(a, j.left) && from(b, j.right) &&
        a.references.nonEmpty && b.references.nonEmpty => Some((a, b))
      case EqualTo(a, b) if from(b, j.left) && from(a, j.right) &&
        a.references.nonEmpty && b.references.nonEmpty => Some((b, a))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }
}
