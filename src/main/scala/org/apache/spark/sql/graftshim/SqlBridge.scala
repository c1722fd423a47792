package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's `private[sql]` surface:
  * building a DataFrame from an already-constructed logical plan.
  *
  * Custom operators that exist as their own [[LogicalPlan]] nodes (the
  * as-of join) need `Dataset.ofRows` to hand the plan back to the
  * session; Spark keeps that constructor `private[sql]`, so this
  * shim lives under `org.apache.spark.sql` — the standard extension
  * pattern for libraries that add planner-level operators. Nothing
  * else in the library may import from this package.
  */
object SqlBridge {

  /** Wrap an analyzed-or-analyzable logical plan as a DataFrame on
    * `spark`. The plan goes through the full QueryExecution pipeline
    * (analyzer, optimizer, planner), so injected strategies see it.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
