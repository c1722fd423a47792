package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: co-partitioned, sorted, single-pass merge.
  *
  * Scale shape (the reason this is a plan node and not a DataFrame
  * recipe):
  *  - each side declares `ClusteredDistribution` on its own keys, so
  *    EnsureRequirements co-partitions the two children with ONE
  *    exchange per side — the same contract SortMergeJoinExec uses;
  *  - each side declares (keys..., time) ascending child ordering, so
  *    the sorts happen inside the exchange's local sort machinery
  *    (spillable, radix-friendly), not in this operator;
  *  - the merge itself keeps exactly ONE buffered right row (the best
  *    as-of candidate for the current key) — O(1) memory per
  *    partition, no matter how hot a key is. The window-function
  *    encoding of the same semantics buffers whole frames and carries
  *    the union of both schemas through one shuffle; an equi-join +
  *    max-aggregate encoding explodes every qualifying pair first.
  *
  * The left side's (keys, time) ordering is preserved on output, so a
  * downstream window or aggregation over the same keys re-uses both
  * the partitioning and the sort.
  *
  * Single-pass correctness: both inputs arrive sorted by (keys, time);
  * for each left row the right cursor advances while it is behind
  * (key < leftKey, or same key with time <= leftTime), remembering the
  * newest candidate; right rows with NULL in any key or the time are
  * consumed and never match (mirrors SQL join-condition NULL
  * semantics, and DuckDB ASOF). The remembered candidate only applies
  * while its key equals the current left key and (if set) the
  * tolerance is not exceeded.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    isOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def ordering(keys: Seq[Expression], time: Expression)
      : Seq[SortOrder] =
    (keys :+ time).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(ordering(leftKeys, leftTime), ordering(rightKeys, rightTime))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    ordering(leftKeys, leftTime)

  protected override def doExecute(): RDD[InternalRow] = {
    val tol = toleranceMicros
    val outer = isOuter
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      // bind against the output attrs themselves (same exprIds, but
      // with the outer side's nullability applied) — binding against
      // the raw child attrs would inherit nullable=false from a
      // non-null right column and codegen would skip the null check,
      // turning the outer join's NULLs into zeros
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        // newest usable right row seen for some key <= the current
        // left key; `bestKey`/`bestTime` are copies (the child
        // iterator reuses row buffers)
        private var best: InternalRow = _
        private var bestKey: UnsafeRow = _
        private var bestTime: Long = 0L
        private var pending: InternalRow = _

        private def keyHasNull(k: UnsafeRow, width: Int): Boolean = {
          var i = 0
          while (i < width) { if (k.isNullAt(i)) return true; i += 1 }
          false
        }

        private def advanceRightTo(lKey: UnsafeRow, lt: Long): Unit = {
          var done = false
          while (!done && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val rt = rTimeProj(r)
            if (keyHasNull(rk, rKeys.length) || rt.isNullAt(0)) {
              rBuf.next() // unusable row: consume, never matches
            } else {
              val c = keyOrd.compare(rk, lKey)
              if (c < 0) {
                rBuf.next() // behind on key: candidate era is over
              } else if (c == 0 && rt.getLong(0) <= lt) {
                best = rBuf.next().copy()
                bestKey = rk.copy()
                bestTime = rt.getLong(0)
              } else {
                done = true // ahead of this left row; stop
              }
            }
          }
        }

        private def matchFor(l: InternalRow): InternalRow = {
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          if (keyHasNull(lk, lKeys.length) || lt.isNullAt(0)) return null
          val t = lt.getLong(0)
          advanceRightTo(lk, t)
          if (best != null && keyOrd.compare(bestKey, lk) == 0 &&
            tol.forall(t - bestTime <= _)) best
          else null
        }

        private def computeNext(): Unit = {
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val m = matchFor(l)
            if (m != null) pending = resultProj(joined(l, m))
            else if (outer) pending = resultProj(joined(l, nullRight))
          }
        }

        override def hasNext: Boolean = { computeNext(); pending != null }

        override def next(): InternalRow = {
          computeNext()
          val out = pending
          pending = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
