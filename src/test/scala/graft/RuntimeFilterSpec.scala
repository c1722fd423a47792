package graft

import org.apache.spark.sql.functions._

/** Runtime row-level join pruning — the row-granularity sibling of the
  * DPP pin (DppPlanSpec prunes PARTITIONS; this prunes ROWS inside
  * them). For a selective dim⋈fact join Spark can inject a Bloom
  * filter built from the dim side into the fact scan's filters at
  * planning time, so at 100 TB the fact table drops non-joining rows
  * at the scan instead of shipping them to the join. The engine's
  * session doesn't need code changes for this — the pin proves the
  * optimizer actually injects the filter under the engine's query
  * shapes and configs, so a Spark upgrade or conf drift that silently
  * disables it fails a test instead of a capacity review.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim join injects a bloom runtime filter into the fact scan") {
    val conf = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // scale the "is the fact side big enough to bother" cutoffs to
      // fixture volume
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // force a shuffle join: the injection targets shuffle-join probe
      // sides (a broadcast join already prunes via the hash relation)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf)
        .select("l_partkey", "l_quantity")
      val dim = Tables.part(spark, sf)
        .filter(col("p_size") === 1) // selective: ~2% of parts
        .select("p_partkey")
      val joined = li.join(dim, col("l_partkey") === col("p_partkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter_agg"),
        s"no bloom runtime filter injected:\n$optimized")
      // and it must not change results: the filter is a superset guard
      val expected = li.join(broadcast(dim),
        col("l_partkey") === col("p_partkey")).count()
      assert(joined.count() === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
