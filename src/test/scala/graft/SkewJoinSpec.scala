package graft

import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Runtime skew handling — the third leg of the engine's skew story
  * (the first two are engineered in: salted top-K windows in the MVT
  * density cap, salted shard grids in LSH dedup). For joins whose key
  * distribution is only known at RUNTIME, the engine leans on AQE's
  * OptimizeSkewedJoin instead of hand-salting every join: this spec
  * pins that a hot-key join under the engine's session settings
  * actually gets its skewed partition SPLIT at runtime (the executed
  * SortMergeJoin reports isSkewJoin and the shuffle read fans the hot
  * partition out), so a 100 TB run with one pathological key degrades
  * to more tasks, not one straggler task.
  */
class SkewJoinSpec extends SparkSpec {

  test("a hot-key join is split by AQE skew handling at runtime") {
    val conf = Map(
      // force the shuffle-join path (a broadcast would hide the skew)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // scale the size cutoffs down to fixture volume: a partition is
      // "skewed" past 64 KB / 2x median, split into ~16 KB chunks
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      // coalescing would merge the splits straight back together
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = conf.keys.map(k =>
      k -> util.Try(spark.conf.get(k)).toOption).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k-row fact where 90% of rows share ONE key; wide payload so
      // the hot partition clearly exceeds the threshold
      val fact = spark.range(0, 200000).toDF("i")
        .select(
          when(pmod(col("i"), lit(10)) < 9, 1L)
            .otherwise(pmod(col("i"), lit(1000))).as("k"),
          concat(lit("payload-"), format_string("%032d", col("i")),
            lit("-"), format_string("%032d", col("i"))).as("v"))
      val other = spark.range(0, 1000).toDF("k")
        .select(col("k"), concat(lit("dim-"), col("k")).as("d"))
      // the join must be terminal: a downstream groupBy("k") would
      // need the join's hash partitioning and AQE (correctly) refuses
      // to split a skewed partition whose layout a consumer depends on
      val joined = fact.join(other, "k")
        .select(col("k"), length(col("v")).as("lv"), col("d"))
      joined.queryExecution.toRdd.count()
      val all = planNodes(joined.queryExecution.executedPlan)
      val smj = all.collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, s"expected a sort-merge join: " +
        s"${all.map(_.nodeName)}")
      assert(smj.exists(_.isSkewJoin),
        "AQE did not mark the hot-key join as skew-handled")
      // the skewed side's shuffle read must fan the hot partition out
      // into more partitions than the shuffle wrote
      val reads = all.collect { case r: AQEShuffleReadExec => r }
      assert(reads.exists(r =>
        r.partitionSpecs.length > r.child.outputPartitioning.numPartitions),
        "no shuffle read expanded the skewed partition")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
