package graft

import graft.operators.Normalization
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.aggregate.{
  HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec

/** The sorted-stream N2 split (NormalizeSegmentsExec) must be
  * indistinguishable from the window/aggregate composition
  * `ownedSegments(segmented(arcMembers(...)))`: same seg_ids (pins
  * the seg_no counting — including that UNOWNED stretches advance
  * the counter), same members/props/phash, same pts chains. Plus the
  * plan shape: the exec replaces the window and the collect_list
  * aggregation outright.
  */
class NormalizeStreamSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def runsDf(rows: (Long, String, Seq[Seq[Double]])*) =
    rows.toDF("run_id", "props", "coords")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("seg_run"), col("seg_id"), col("members"),
      col("props").cast("string").as("props"), col("phash"), col("pts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList,
        r.getString(3), r.getLong(4), r.getSeq[Long](5).toList))
      .sortBy(t => (t._1, t._2))
      .toList

  private def bothShapes(runs: org.apache.spark.sql.DataFrame,
      merge: Normalization.PropsMerge) = {
    val withM = Normalization.arcMembers(Normalization.edgesOf(runs), merge)
    val agg = canon(Normalization.ownedSegments(
      Normalization.segmented(withM), merge))
    val streamed = canon(
      Normalization.streamedOwnedSegments(withM, merge))
    (agg, streamed)
  }

  test("owned-unowned-owned resumption keeps two segments (StringProps)") {
    // run 2's middle edges are shared with run 1 (lower id owns them):
    // run 2 = solo, shared, solo — the two solo stretches have the
    // SAME membership {2} but must stay SEPARATE segments because an
    // unowned stretch sits between them (seg_no counts ALL changes)
    val p = (i: Int) => Seq(10.0 + i * 0.001, 47.0)
    val runs = runsDf(
      (1L, "a", Seq(p(1), p(2), p(3))),
      (2L, "b", Seq(p(0), p(1), p(2), p(3), p(4))))
    val (agg, streamed) = bothShapes(runs, Normalization.StringProps)
    assert(agg.nonEmpty)
    // run 2 contributes exactly two solo segments with distinct seg_ids
    assert(agg.count(_._1 == 2L) == 2)
    assert(streamed === agg)
  }

  test("multi-run scenario equal across shapes (StringProps)") {
    val p = (i: Int, j: Int) => Seq(10.0 + i * 0.001, 47.0 + j * 0.001)
    val runs = runsDf(
      (1L, "a", Seq(p(0, 0), p(1, 0), p(2, 0), p(3, 0))),
      (2L, "b", Seq(p(1, 0), p(2, 0))), // shared interior arc
      (3L, "a", Seq(p(3, 0), p(4, 0), p(4, 1))), // chains onto run 1
      (4L, "c", Seq(p(9, 9), p(9, 8))), // disjoint singleton
      (5L, "d", Seq(p(0, 5), p(0, 5), p(1, 5)))) // degenerate edge dropped
    val (agg, streamed) = bothShapes(runs, Normalization.StringProps)
    assert(agg.nonEmpty)
    assert(streamed === agg)
  }

  test("lattice props (struct type) equal across shapes") {
    val p = (i: Int) => Seq(10.0 + i * 0.001, 47.0)
    def props(name: String, difficulty: String, oneway: Any) = struct(
      array(lit("downhill")).as("uses"), lit(name).as("name"),
      lit(null).cast("string").as("ref"),
      lit(difficulty).as("difficulty"),
      lit(null).cast("string").as("grooming"),
      lit("operating").as("status"),
      (oneway match {
        case b: Boolean => lit(b)
        case _ => lit(null).cast("boolean")
      }).as("oneway"),
      lit(null).cast("boolean").as("gladed"),
      lit(true).as("patrolled"), lit(null).cast("boolean").as("snowmaking"),
      lit(null).cast("boolean").as("snowfarming"),
      lit(null).cast("boolean").as("tunnel"),
      lit(null).cast("boolean").as("lit"),
      lit(null).cast("string").as("wikidata_id"))
    val base = Seq(
      (1L, Seq(p(0), p(1), p(2), p(3))),
      (2L, Seq(p(1), p(2))),
      (3L, Seq(p(3), p(4)))).toDF("run_id", "coords")
    val runs = base.withColumn("props",
      when(col("run_id") === 1, props("East", "easy", true))
        .when(col("run_id") === 2, props("West", "expert", null))
        .otherwise(props("East", "easy", true)))
      .select("run_id", "props", "coords")
    val (agg, streamed) = bothShapes(runs, Normalization.RunPropsLattice)
    assert(agg.nonEmpty)
    assert(streamed === agg)
  }

  test("full q_ski_normalize equal under both shapes at fixture scale") {
    val fn = SparkEntry.queries("q_ski_normalize")
    def run(shape: String) = {
      spark.conf.set("spark.graft.normalize.streamSegments", shape)
      try fn(spark, sf).collect().map(_.toString).sorted.toList
      finally spark.conf.unset("spark.graft.normalize.streamSegments")
    }
    val agg = run("false")
    val streamed = run("true")
    assert(agg.nonEmpty)
    assert(streamed === agg)
  }

  test("streamed plan: exec present, no window, no aggregate in split") {
    val p = (i: Int) => Seq(10.0 + i * 0.001, 47.0)
    val runs = runsDf(
      (1L, "a", Seq(p(0), p(1), p(2))),
      (2L, "b", Seq(p(1), p(2))))
    val df = Normalization.streamedOwnedSegments(
      Normalization.arcMembers(Normalization.edgesOf(runs)))
    df.write.format("noop").mode("overwrite").save()
    val nodes = planNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[plans.NormalizeSegmentsExec]))
    assert(!nodes.exists(_.isInstanceOf[WindowExec]))
    // the ONLY aggregation left is arcMembers' (lo, hi) groupBy — the
    // split's collect_list re-aggregation must be gone, so exactly
    // the two halves (partial+final) of one aggregate remain
    val aggs = nodes.count(n => n.isInstanceOf[ObjectHashAggregateExec] ||
      n.isInstanceOf[HashAggregateExec] || n.isInstanceOf[SortAggregateExec])
    assert(aggs <= 2, s"expected only arcMembers' aggregate, got $aggs")
  }
}
