package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** The ten round-13 TPC-H completions (TpchSuite): invariants the
  * DuckDB oracle can't see — plan shape (dims actually broadcast,
  * no quadratic joins) and driver-side recomputes of the correlated
  * semantics.
  */
class TpchSuiteSpec extends SparkSpec {


  private def settled(name: String): Seq[SparkPlan] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.count()
    planNodes(df.queryExecution.executedPlan)
  }

  test("q8_market_share: every dimension joins as broadcast-hash") {
    val all = settled("q8_market_share")
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    // part, supplier+nation, customer+nation+region — at least the
    // three explicit dim sides must be broadcast-hash joins (AQE may
    // add a fourth by converting the orders join at tiny SF).
    val bhj = all.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bhj >= 3, s"expected >=3 broadcast joins, got $bhj")
  }

  test("q13 histogram covers every customer exactly once, zeros included") {
    val hist = SparkEntry.queries("q13_order_distribution")(spark, sf)
      .collect()
    val nCustomers = Tables.customer(spark, sf).count()
    assert(hist.map(_.getLong(1)).sum == nCustomers,
      "histogram buckets must partition the customer set")
    // the LEFT join must keep never-ordered / only-excluded-priority
    // customers as a c_count=0 bucket of exactly the right size
    val zeros = Tables.customer(spark, sf).select("c_custkey")
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderpriority") =!= "5-LOW").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val zeroBucket = hist.find(_.getLong(0) == 0L)
      .map(_.getLong(1)).getOrElse(0L)
    assert(zeroBucket == zeros,
      s"c_count=0 bucket $zeroBucket != $zeros zero-order customers")
  }

  test("q2 rows are the true per-part EUROPE minimum") {
    val got = SparkEntry.queries("q2_min_cost_supplier")(spark, sf)
      .select("p_partkey", "cost_cents").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // independent recompute: min line cents per part over EU suppliers
    val eu = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val best = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey").isInCollection(eu))
      .groupBy("l_partkey")
      .agg(min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (pk, c) =>
      assert(best(pk) == c, s"part $pk: got $c, true min ${best(pk)}")
    }
  }

  test("q20 candidates genuinely moved a majority of a small part") {
    val cand = SparkEntry.queries("q20_promo_suppliers")(spark, sf)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val qty = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.part(spark, sf).filter(col("p_name").like("small%")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("bigint")).as("sq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = qty.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    val expect = qty.filter { case (pk, _, sq) => sq * 2 > byPart(pk) }
      .map(_._2).toSet
    assert(cand == expect,
      s"majority-mover sets differ: extra=${cand -- expect}, missing=${expect -- cand}")
  }
}
