package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Broadcast as-of join: the small-right-side physical strategy.
  *
  * The shuffled merge ([[AsofJoinExec]]) re-distributes BOTH sides on
  * the keys — correct at any size, but when the right side is a
  * dimension (an SCD rates/tier table, a config history), shuffling a
  * 100 TB fact table to look up a few thousand effective-dated rows is
  * the classic avoidable exchange. This exec instead declares
  * `BroadcastDistribution(IdentityBroadcastMode)` on the right:
  * EnsureRequirements inserts the broadcast exchange, every task gets
  * the whole dimension, and the FACT SIDE NEEDS NO EXCHANGE AND NO
  * SORT — its partitioning and ordering pass straight through
  * (`outputPartitioning`/`outputOrdering` = left child's), so an
  * upstream scan feeds the join pipelined.
  *
  * Per task the broadcast rows build a key -> time-sorted-array index
  * (same build-per-task contract as ShuffledHashJoinExec's hashed
  * relation; O(R log R) on a dimension-sized R), and each left row
  * binary-searches the newest right time <= its own — O(log R), no
  * state between rows, so left order is preserved exactly.
  *
  * Match semantics are identical to [[AsofJoinExec]] (newest
  * at-or-before, inclusive tolerance against that newest candidate
  * only, NULLs never match, ties broken by the caller's pre-dedupe);
  * the spec asserts result equality between the two execs on random
  * data.
  */
case class BroadcastAsofJoinExec(
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
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

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
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    // index identity = (broadcast id, this exec's plan id): the same
    // broadcast value could feed two as-of execs with different
    // keys/time columns, so the plan id disambiguates
    val cacheKey = s"bcast=${bcast.id}:exec=$id"
    left.execute().mapPartitions { lIter =>
      val index = BroadcastAsofJoinExec.indexFor(cacheKey) {
        BroadcastAsofJoinExec.buildIndex(bcast.value, rKeys, rTime, rOut)
      }
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // greatest index with times(i) <= t, or -1
      def floorSearch(times: Array[Long], t: Long): Int = {
        var lo = 0; var hi = times.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (times(mid) <= t) { ans = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        ans
      }

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        var nullKey = false
        var i = 0
        while (i < lKeys.length) { if (lk.isNullAt(i)) nullKey = true; i += 1 }
        val m: InternalRow =
          if (nullKey || lt.isNullAt(0)) null
          else {
            val entry = index.get(lk)
            if (entry == null) null
            else {
              val t = lt.getLong(0)
              val pos = floorSearch(entry._1, t)
              if (pos < 0 || !tol.forall(t - entry._1(pos) <= _)) null
              else entry._2(pos)
            }
          }
        if (m != null) Iterator.single(resultProj(joined(l, m)))
        else if (outer) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsofJoinExec {
  /** key -> (times ascending, rows co-sorted); NULL keys/times never
    * indexed (they can't match). Rows are copied out of the broadcast
    * array once per EXECUTOR (see [[indexFor]]). Lives on the
    * companion so task closures capture only serializable expression
    * lists, never the exec node itself.
    */
  private[plans] def buildIndex(rows: Array[InternalRow],
      rKeys: Seq[Expression], rTime: Expression,
      rOut: Seq[Attribute])
      : java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])] = {
    val rKeyProj = UnsafeProjection.create(rKeys, rOut)
    val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
    val grouped = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
    rows.foreach { r =>
      val k = rKeyProj(r)
      val t = rTimeProj(r)
      var nullKey = false
      var i = 0
      while (i < rKeys.length) { if (k.isNullAt(i)) nullKey = true; i += 1 }
      if (!nullKey && !t.isNullAt(0)) {
        var buf = grouped.get(k)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty
          grouped.put(k.copy(), buf)
        }
        buf += ((t.getLong(0), r.copy()))
      }
    }
    val index = new java.util.HashMap[UnsafeRow,
      (Array[Long], Array[InternalRow])]()
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortBy(_._1)
      index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    index
  }

  /** Executor-local index memo: the O(R log R) group-and-sort of the
    * broadcast dimension runs ONCE per executor, not once per task —
    * BroadcastHashJoin gets the same effect by shipping a prebuilt
    * HashedRelation; here the index is rebuilt from the broadcast row
    * array on first use and shared. Values are soft references so a
    * memory-pressured executor can drop and rebuild an index rather
    * than OOM; stale keys (finished queries) are pruned opportunistically
    * when their referent is collected.
    */
  private val indexCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[AnyRef]]()

  private[plans] def indexFor[T <: AnyRef](key: String)(build: => T): T = {
    val cached = indexCache.get(key)
    val hit = if (cached == null) null else cached.get()
    if (hit != null) hit.asInstanceOf[T]
    else {
      // single-flight per executor is not required for correctness
      // (builds are idempotent); losing the race just builds twice
      val built = build
      indexCache.put(key, new java.lang.ref.SoftReference[AnyRef](built))
      // opportunistic prune of collected entries
      val it = indexCache.entrySet().iterator()
      while (it.hasNext) if (it.next().getValue.get() == null) it.remove()
      built
    }
  }
}
