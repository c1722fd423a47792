package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** q_dpp_join must actually prune: the month-partitioned fact
  * scaffold's scan has to carry a real `dynamicpruningexpression`
  * over the partition column and read only the dim-selected subset
  * of partitions. This is the pin that caught the silent
  * trivialization mode: when the dim subtree can't be canonically
  * matched for broadcast reuse, Spark REPLACES the pruning subquery
  * with literal `true` and the query stays correct while scanning
  * every partition — a correctness-invisible 28x scan regression
  * here, arbitrarily worse at warehouse scale.
  */
class DppPlanSpec extends SparkSpec {


  test("q_dpp_join: dynamic pruning fires and reads only 3 partitions") {
    val df = SparkEntry.queries("q_dpp_join")(spark, sf)
    df.queryExecution.toRdd.count() // settle the adaptive plan
    val plan = df.queryExecution.executedPlan
    val factScans = planNodes(plan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("lineitem-month")) => f
    }
    assert(factScans.nonEmpty, s"no fact scaffold scan in:\n$plan")
    val scan = factScans.head
    val pf = scan.partitionFilters.map(_.toString).mkString(";")
    assert(pf.contains("dynamicpruning"),
      s"no dynamic pruning filter on the fact scan: $pf")
    // a trivialized subquery renders as dynamicpruningexpression(true)
    assert(!pf.contains("dynamicpruningexpression(true)"),
      s"pruning subquery trivialized to literal true: $pf")
    val read = scan.metrics.get("numPartitions").map(_.value)
    assert(read.contains(3L),
      s"expected 3 partitions read after pruning, got $read")
  }

  test("q_dpp_join matches the unpartitioned recompute") {
    val got = SparkEntry.queries("q_dpp_join")(spark, sf).collect()
    assert(got.length == 3)
    // independent recompute straight off the raw tables
    import org.apache.spark.sql.functions._
    val top = Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("mon").agg(sum("c").as("oc"))
      .orderBy(col("oc").desc, col("mon")).limit(3)
      .select("mon").collect().map(_.getString(0)).toSet
    val want = Tables.lineitem(spark, sf)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100)" +
          " AS BIGINT)").as("c"))
      .filter(col("m").isInCollection(top))
      .groupBy("m")
      .agg(count(lit(1)).as("n"), sum("c").as("rc"))
      .orderBy("m").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == want.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
