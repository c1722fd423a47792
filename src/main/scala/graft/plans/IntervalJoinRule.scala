package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.InRangeExpr

/** Plans `JOIN ... ON graft_in_range(t, lo, hi, bin)` as a binned
  * equi-join instead of the broadcast-nested-loop plan Spark gives a
  * pure range condition.
  *
  * One-dimensional sibling of [[DistanceJoinRule]] — same
  * explode/equi-join/refine recipe, but over VARIABLE-WIDTH intervals
  * instead of fixed-radius points:
  *
  *  - match: inner/cross join whose condition conjunctively contains
  *    an unrefined [[InRangeExpr]] with a foldable positive bin
  *    width, the point `t` reading from one join side and both
  *    interval bounds from the other (either orientation); LEFT OUTER
  *    additionally lifts when the POINT side is the preserved left
  *    (the fact-LEFT-JOIN-windows shape — sound because the point
  *    side is never exploded, so null padding is unchanged);
  *  - rewrite: the INTERVAL side gains a Generate exploding
  *    `sequence(floorDiv(lo,bin), floorDiv(hi,bin))` (each interval
  *    covers width/bin + 1 bins; a NULL bound yields no rows, exactly
  *    the rows the inner join would drop), the point side projects
  *    its single `floorDiv(t,bin)` bin, and the join becomes bin
  *    equality AND the refined predicate AND the untouched conjuncts,
  *    wrapped in a Project back to the original output.
  *
  * A qualifying pair joins exactly once: the point owns ONE bin, the
  * interval's bin list is duplicate-free, and `lo <= t <= hi` forces
  * `floorDiv(lo) <= floorDiv(t) <= floorDiv(hi)` (floorDiv is
  * monotone) — so no post-dedup, and the refined predicate only
  * FILTERS in-bin misses. An inverted interval (`hi < lo`) can still
  * emit its `hi`-to-`lo` shared bin when both bounds floor together,
  * but the refinement rejects every such row, matching the
  * predicate's plain false. floorDiv is implemented sign-correctly
  * (truncating `div` patched for negative operands), so pre-epoch
  * times bin consistently with positive ones.
  *
  * At scale this turns O(n·m) pair checking into a shuffle on bin id
  * whose per-key width the caller controls through `bin`: bins much
  * wider than the typical interval put unrelated rows in one bin
  * (fat equi-keys), much narrower explode each interval into many
  * rows — pick bin ≈ the median interval width. When the rule cannot
  * apply (non-literal bin, OR context, bounds split across sides)
  * the predicate still evaluates correctly in whatever join Spark
  * picks.
  */
object IntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Per-interval bin-count ceiling. An open-ended validity row
    * (hi = far-future sentinel) with a small bin would otherwise
    * explode into ~Long.MaxValue/bin sequence elements and kill the
    * executor; 2^20 bins is already three orders of magnitude past
    * any sane bin choice, so rows beyond it raise a targeted error
    * telling the caller to widen `bin` (or model the open end
    * explicitly) instead of dying in Sequence's array allocation.
    */
  val MaxBinsPerInterval = 1L << 20

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, Some(cond), _)
        if (jt == Inner || jt == Cross || jt == LeftOuter) && j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.iterator.flatMap {
        case ir: InRangeExpr if !ir.refined => orient(ir, left, right)
        case _ => None
      }.nextOption() match {
        // LEFT OUTER is sound ONLY with the point side preserved: the
        // point side is never exploded, so "no bin+refine match" is
        // exactly the original "no interval matched" and the single
        // null-padded row survives unchanged. With the INTERVAL side
        // preserved the explode would pad once per empty bin —
        // duplicate null rows — so that orientation is left alone
        // (it stays the nested loop, still correct).
        case Some((ir, pointOnLeft))
            if jt != LeftOuter || pointOnLeft =>
          rewrite(j, ir, pointOnLeft, conjuncts.filterNot(_ eq ir))
        case _ => j
      }
  }

  /** Some(marker -> pointOnLeft) when bin folds to a positive literal,
    * `t` reads from exactly one side and both bounds from the other.
    */
  private def orient(ir: InRangeExpr, left: LogicalPlan,
      right: LogicalPlan): Option[(InRangeExpr, Boolean)] = {
    def from(es: Seq[Expression], p: LogicalPlan): Boolean =
      es.forall(e => e.deterministic && e.references.subsetOf(p.outputSet))
    val binOk = ir.bin.foldable && {
      val b = ir.bin.eval(null)
      b != null && b.asInstanceOf[Long] > 0L
    }
    if (!binOk) None
    else if (from(Seq(ir.t), left) && from(Seq(ir.lo, ir.hi), right))
      Some((ir, true))
    else if (from(Seq(ir.t), right) && from(Seq(ir.lo, ir.hi), left))
      Some((ir, false))
    else None
  }

  /** Sign-correct floor division by the positive literal `bin`:
    * truncating `div` agrees with floor for non-negative numerators;
    * negative ones round the magnitude UP before negating.
    */
  private def floorDiv(a: Expression, bin: Expression): Expression =
    If(GreaterThanOrEqual(a, Literal(0L)),
      IntegralDivide(a, bin),
      UnaryMinus(IntegralDivide(
        Add(UnaryMinus(a), Subtract(bin, Literal(1L))), bin)))

  private def rewrite(j: Join, ir: InRangeExpr, pointOnLeft: Boolean,
      others: Seq[Expression]): LogicalPlan = {
    val bin = Literal(ir.bin.eval(null).asInstanceOf[Long])
    val (pointPlan, intervalPlan) =
      if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    val cellLo = floorDiv(ir.lo, bin)
    val cellHi = floorDiv(ir.hi, bin)
    // Sequence is TimeZoneAwareExpression even for integral steps; an
    // inverted (hi < lo) interval would DESCEND and fabricate bins, so
    // guard it to an empty list explicitly
    val seqExpr = new Sequence(cellLo, cellHi, Some(Literal(1L)))
      .withTimeZone(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val emptyCells = Literal.create(Array.empty[Long], ArrayType(LongType))
    // span guard BEFORE the width test: a pathological interval must
    // raise the targeted error, not allocate the sequence
    val guarded = If(
      LessThanOrEqual(Subtract(cellHi, cellLo),
        Literal(MaxBinsPerInterval)),
      seqExpr,
      Cast(new RaiseError(Literal(
        s"graft_in_range: interval spans more than $MaxBinsPerInterval" +
          " bins at the given bin width; widen `bin` or bound the" +
          " open-ended interval")), ArrayType(LongType)))
    val cells = If(LessThanOrEqual(cellLo, cellHi), guarded, emptyCells)
    val iCell = AttributeReference("graft_range_bin", LongType)()
    val iGen = Generate(Explode(cells), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(iCell),
      child = intervalPlan)

    val pAlias = Alias(floorDiv(ir.t, bin), "graft_range_bin_p")()
    val pProj = Project(pointPlan.output :+ pAlias, pointPlan)

    val (newLeft, newRight) =
      if (pointOnLeft) (pProj, iGen) else (iGen, pProj)
    val newCond = (EqualTo(iCell, pAlias.toAttribute) +:
      ir.copy(refined = true) +: others).reduce(And)
    // LeftOuter only reaches here with the point side on the left
    // (see apply); Cross degrades to Inner since a condition exists
    val jt = if (j.joinType == LeftOuter) LeftOuter else Inner
    Project(j.output, Join(newLeft, newRight, jt, Some(newCond), j.hint))
  }
}
