package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The broadcast-threshold cutover the dimension-hint policy promises
  * (TpchSuite scale notes): at test SF every dim broadcasts because
  * it's small, but the plan must NOT be pinned to that accident —
  * when the SF-scaling dims (customer, part — TPC-H's two largest)
  * cross the autoBroadcastJoinThreshold, the same query code has to
  * degrade them to shuffle joins while the schema-bounded dims
  * (nation, region) keep their hinted broadcasts.
  *
  * The scaffold is a generated sf1-SIZE dataset directory (customer
  * 1.5M rows, part 2M — TPC-H's own per-SF ratios; the other tables
  * copied from the small fixture) so the planner sees real parquet
  * file sizes above the threshold, not a faked statistic.
  */
class TpchScaleSpec extends SparkSpec {

  // the scaffold is ~5M generated parquet rows — a meaningful slice of
  // the suite's wall-clock when regenerated per run, so it is cached
  // under target/ keyed by a generator version (bump GenVersion when
  // the recipe below changes) and rebuilt only when the marker is
  // missing; `sbt clean` clears it naturally with everything else
  private val GenVersion = "v1"

  private lazy val scaled: String = {
    val cached = java.nio.file.Paths
      .get("target", "scaffolds", s"tpch_planner_$GenVersion")
    val marker = cached.resolve("_SCAFFOLD_OK")
    if (java.nio.file.Files.exists(marker)) cached.toAbsolutePath.toString
    else generateScaffold(cached, marker)
  }

  private def generateScaffold(cached: java.nio.file.Path,
      marker: java.nio.file.Path): String = {
    java.nio.file.Files.createDirectories(cached)
    val dir = cached.toAbsolutePath.toString
    // sf1-size big dims, same schemas as the driver tables, generated
    // wide enough that the parquet files land well over 10 MB
    spark.range(1, 1500001).toDF("c_custkey")
      .select(col("c_custkey"),
        concat(lit("Customer#"), format_string("%09d", col("c_custkey")))
          .as("c_name"),
        pmod(col("c_custkey"), lit(25)).cast("int").as("c_nationkey"),
        (pmod(col("c_custkey") * 7919, lit(1000000)).cast("double") / 100.0
          - 999.99).as("c_acctbal"),
        element_at(array(lit("AUTOMOBILE"), lit("BUILDING"),
          lit("FURNITURE"), lit("MACHINERY"), lit("HOUSEHOLD")),
          (pmod(col("c_custkey"), lit(5)) + 1).cast("int"))
          .as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.range(1, 2000001).toDF("p_partkey")
      .select(col("p_partkey"),
        concat(lit("part "), format_string("%09d", col("p_partkey")))
          .as("p_name"),
        concat(lit("Brand#"), pmod(col("p_partkey"), lit(25)))
          .as("p_brand"),
        element_at(array(lit("STANDARD"), lit("PROMO"), lit("ECONOMY")),
          (pmod(col("p_partkey"), lit(3)) + 1).cast("int")).as("p_type"),
        (pmod(col("p_partkey"), lit(50)) + 1).cast("int").as("p_size"),
        (pmod(col("p_partkey") * 104729, lit(100000)).cast("double")
          / 100.0).as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // sf1-size facts as well — with a fixture-size fact the planner
    // (correctly) broadcasts the FACT side and the dim cutover never
    // shows; both join sides must be over threshold for the pin to
    // test what it claims. Keys land inside the dim ranges and
    // l_shipdate inside q14's H1-1996 window so the joins carry rows
    // (an all-filtered side would let AQE plan an empty relation).
    spark.range(1, 1500001).toDF("o_orderkey")
      .select(col("o_orderkey"),
        (pmod(col("o_orderkey") * 7, lit(1500000)) + 1).as("o_custkey"),
        lit("F").as("o_orderstatus"),
        (pmod(col("o_orderkey") * 31, lit(100000)).cast("double") / 10.0)
          .as("o_totalprice"),
        expr("timestamp_seconds(820483200 + (o_orderkey % 10000000))")
          .as("o_orderdate"),
        lit("3-MEDIUM").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.range(1, 3000001).toDF("id")
      .select(
        (pmod(col("id"), lit(1500000)) + 1).as("l_orderkey"),
        (pmod(col("id") * 13, lit(2000000)) + 1).as("l_partkey"),
        (pmod(col("id"), lit(10000)) + 1).as("l_suppkey"),
        (pmod(col("id"), lit(7)) + 1).cast("int").as("l_linenumber"),
        (pmod(col("id"), lit(50)) + 1).cast("double").as("l_quantity"),
        (pmod(col("id") * 17, lit(100000)).cast("double") / 10.0)
          .as("l_extendedprice"),
        (pmod(col("id"), lit(10)).cast("double") / 100.0).as("l_discount"),
        lit(0.05).as("l_tax"),
        lit("N").as("l_returnflag"), lit("O").as("l_linestatus"),
        expr("timestamp_seconds(820483200 + (id % 15000000))")
          .as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // bounded dims + unrelated tables stay at fixture size
    Tables.names
      .filterNot(Set("customer", "part", "orders", "lineitem"))
      .foreach { t =>
        Tables.load(spark, sf, t).write.mode("overwrite")
          .parquet(s"$dir/$t.parquet")
      }
    val cSize = new java.io.File(s"$dir/customer.parquet")
      .listFiles().map(_.length).sum
    val pSize = new java.io.File(s"$dir/part.parquet")
      .listFiles().map(_.length).sum
    assert(cSize > 4 * Threshold && pSize > 4 * Threshold,
      s"scaffold dims must sit clearly over the test threshold " +
        s"(customer=$cSize, part=$pSize)")
    java.nio.file.Files.write(marker, Array.emptyByteArray)
    dir
  }

  /** The broadcast cutover under test. Spark estimates the join side
    * AFTER column pruning, so a pruned two-column projection of even
    * an sf1 dim can sit under the default 10 MB — exactly as it
    * should. The pin lowers the threshold to 1 MB for the
    * over-threshold tests, standing in for the next 10-100x of dim
    * growth where no threshold saves a forced broadcast.
    */
  private val Threshold = 1L << 20

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try body finally spark.conf.set(key, prev)
  }

  private def planNodesOf(name: String, d: String): Seq[SparkPlan] = {
    val df = SparkEntry.queries(name)(spark, d)
    df.queryExecution.toRdd.count()
    planNodes(df.queryExecution.executedPlan)
  }

  test("over-threshold customer degrades to a shuffle join; nation/region stay broadcast") {
    // q5 joins lineitem⋈orders⋈customer⋈nation⋈region
    val all = withThreshold(Threshold) {
      planNodesOf("q5_region_revenue", scaled)
    }
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    val shuffled = all.count(p => p.isInstanceOf[SortMergeJoinExec]
      || p.isInstanceOf[ShuffledHashJoinExec])
    assert(shuffled >= 1,
      s"the 1.5M-row customer dim must NOT broadcast: ${all.map(_.nodeName)}")
    // the hinted bounded dims still broadcast
    val bhj = all.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bhj >= 2, s"nation+region hints must hold, got $bhj broadcasts")
  }

  test("over-threshold part degrades to a shuffle join") {
    // q14 joins lineitem⋈part only
    val all = withThreshold(Threshold) {
      planNodesOf("q14_promo_revenue", scaled)
    }
    val shuffled = all.count(p => p.isInstanceOf[SortMergeJoinExec]
      || p.isInstanceOf[ShuffledHashJoinExec])
    assert(shuffled >= 1,
      s"the 2M-row part dim must NOT broadcast: ${all.map(_.nodeName)}")
  }

  test("at fixture SF the same queries still broadcast every dim") {
    // the cutover is size-driven, not a pessimization of small runs
    for (name <- Seq("q5_region_revenue", "q14_promo_revenue")) {
      val all = planNodesOf(name, sf)
      assert(all.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 1
        && !all.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"$name at fixture SF: ${all.map(_.nodeName)}")
    }
  }
}
