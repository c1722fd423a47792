package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.aggregate.{
  HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}

/** The sorted-stream tile encode (TileStreamEncodeExec) must be
  * indistinguishable from the collect_list aggregate shape: same
  * stats rows, same tile BYTES per tile — the two paths share
  * MvtKernel.LayerStream so this pins the exec's run-boundary logic
  * (tile change, layer change, final flush), its sort contract, and
  * the plan shape (one exchange, zero aggregates).
  */
class MvtStreamEncodeSpec extends SparkSpec {

  private def prep = operators.MvtTiles.prepped(spark, sf)

  test("streamed stats equal the aggregate path's stats") {
    // encodeStatsOfAggregate by name: encodeStatsOf routes to the
    // STREAM shape by default since round 18 flipped it, and this
    // test must stay an agg-vs-stream comparison
    val agg = operators.MvtTiles.encodeStatsOfAggregate(prep).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toMap
    val streamed = operators.MvtTiles.encodeStatsOfStreamed(prep).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toMap
    assert(streamed.nonEmpty)
    assert(streamed === agg)
  }

  test("streamed tile bytes are bit-identical to the aggregate path") {
    val agg = operators.MvtTiles.encodeOf(prep).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) ->
        r.getAs[Array[Byte]]("tile").toSeq).toMap
    val streamed = operators.MvtTiles.encodeOfStreamed(prep).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)) ->
        r.getAs[Array[Byte]]("tile").toSeq).toMap
    assert(streamed.keySet === agg.keySet)
    val bad = agg.keysIterator.filter(k => streamed(k) != agg(k)).toSeq
    assert(bad.isEmpty, s"byte-divergent tiles: ${bad.take(5)}")
  }

  test("streamed plan: one exchange, no aggregate, the exec present") {
    val df = operators.MvtTiles.encodeOfStreamed(prep)
    df.write.format("noop").mode("overwrite").save()
    val nodes = planNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[plans.TileStreamEncodeExec]))
    assert(!nodes.exists(n => n.isInstanceOf[ObjectHashAggregateExec] ||
      n.isInstanceOf[HashAggregateExec] || n.isInstanceOf[SortAggregateExec]))
    // the prep side contributes its own exchanges (cap windows); the
    // encode itself must add exactly ONE (z,tx,ty) exchange directly
    // under the exec (possibly through the AQE stage/sort wrappers)
    def under(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      planNodes(p).exists(_.isInstanceOf[ShuffleExchangeExec])
    val exec = nodes.collectFirst {
      case e: plans.TileStreamEncodeExec => e }.get
    assert(under(exec.child), "expected the encode exchange+sort below the exec")
  }
}
