package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for unit suites (one per JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf: String = "/root/testdata/sf0.001"

  /** All plan nodes, descending into AQE wrappers, materialized query
    * stages, and reused-exchange subtrees — the ONE shared walker for
    * every plan-pinning spec, so a future AQE wrapper type gets
    * handled once here instead of diverging across suites.
    */
  protected def planNodes(p: SparkPlan): Seq[SparkPlan] = {
    val within = p match {
      case a: AdaptiveSparkPlanExec => planNodes(a.executedPlan)
      case q: QueryStageExec => planNodes(q.plan)
      case r: ReusedExchangeExec => planNodes(r.child)
      case _ => Seq.empty
    }
    Seq(p) ++ within ++ p.children.flatMap(planNodes) ++
      p.subqueries.flatMap(planNodes)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
