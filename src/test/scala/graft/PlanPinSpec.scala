package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan pins for the two hottest pipelines: the physical plans of
  * q_ski_normalize and q_pipeline_e2e must stay free of
  * CartesianProduct / BroadcastNestedLoopJoin and keep their exchange
  * counts bounded — a future change that silently introduces an extra
  * shuffle or degrades a join to a nested loop fails here, not in a
  * bench regression three rounds later.
  *
  * Exchange budgets are asserted as ceilings (measured count at pin
  * time, see each test), not exact equalities, so plan improvements
  * don't trip them while regressions do. localCheckpoint/scaffold
  * boundaries mean the visible plan covers the final-phase DAG — the
  * phases the round-11 audit walked.
  */
class PlanPinSpec extends SparkSpec {

  /** All plan nodes incl. inside AQE wrappers and reused subtrees. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(nodes) ++ p.subqueries.flatMap(nodes)
  }

  private def audit(df: DataFrame): (Int, String) = {
    // force execution so AQE settles on the final plan
    df.count()
    val plan = df.queryExecution.executedPlan
    val all = nodes(plan)
    val s = plan.toString
    assert(!s.contains("CartesianProduct"),
      s"cartesian product leaked into:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join leaked into:\n$s")
    (all.count(_.isInstanceOf[ShuffleExchangeExec]), s)
  }

  test("q_ski_normalize plans lean: no cartesian/BNLJ, bounded exchanges") {
    val df = SparkEntry.queries("q_ski_normalize")(spark, sf)
    val (exchanges, plan) = audit(df)
    // pinned at measured count 6 (one edge exchange + the membership/
    // props/occurrence rollups and the final orderBy range exchange)
    assert(exchanges <= 6,
      s"q_ski_normalize grew to $exchanges exchanges:\n$plan")
  }

  test("q_pipeline_e2e plans lean: no cartesian/BNLJ, bounded exchanges") {
    val df = SparkEntry.queries("q_pipeline_e2e")(spark, sf)
    val (exchanges, plan) = audit(df)
    assert(exchanges <= 10,
      s"q_pipeline_e2e grew to $exchanges exchanges:\n$plan")
  }
}
