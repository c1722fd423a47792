package graft

import org.apache.spark.sql.functions._

/** Recall proof for the salted LSH hot-bucket path: a bucket far above
  * the MAX_BUCKET shard target (which the pre-round-12 skip path
  * dropped wholesale) must now yield EVERY within-bucket pair, and the
  * pairs must demonstrably cross salt-shard boundaries.
  */
class HotBucketSpec extends SparkSpec {

  private val N = 500 // >> MAX_BUCKET = 200 → m = ceil(500/200) = 3 shards

  /** Synthetic band rows: N docs all hashing into ONE bucket of band 0
    * (the boilerplate-cluster shape), plus a control pair in a second
    * bucket and a singleton that must pair with nothing.
    */
  private def fixture = {
    import spark.implicits._
    val hot = (0L until N).map(i => (i, 0, "hotbucket"))
    val ctrl = Seq((1000L, 0, "ctrl"), (1001L, 0, "ctrl"),
      (2000L, 0, "lonely"))
    (hot ++ ctrl).toDF("doc_id", "b", "bh")
  }

  test("hot bucket keeps full recall: all C(n,2) pairs, none dropped") {
    val pairs = operators.Dedup.bucketAllPairs(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until N; b <- (a + 1) until N
    } yield (a, b)).toSet + ((1000L, 1001L))
    assert(pairs.size === expected.size)
    assert(pairs === expected)
    assert(pairs.size === N * (N - 1) / 2 + 1)
  }

  test("found pairs cross salt-shard boundaries") {
    // recompute each doc's shard exactly as bucketAllPairs does
    val m = math.ceil(N / 200.0).toInt
    val shardOf = fixture.filter(col("bh") === "hotbucket")
      .select(col("doc_id"),
        pmod(graft.functions.HashFunctions.hash32(col("doc_id")), lit(m))
          .as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shardOf.values.toSet.size === m, s"fixture spans all $m shards")
    val pairs = operators.Dedup.bucketAllPairs(fixture)
      .filter(col("doc_a") < N).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val crossShard = pairs.count { case (a, b) => shardOf(a) != shardOf(b) }
    val withinShard = pairs.length - crossShard
    // the skip path found NEITHER; the salted grid must find BOTH kinds
    assert(crossShard > 0 && withinShard > 0,
      s"cross=$crossShard within=$withinShard")
    assert(pairs.length === N * (N - 1) / 2)
  }

  test("incremental probe finds matches inside a hot index bucket") {
    import spark.implicits._
    // index: a hot boilerplate bucket of N docs (>> MAX_BUCKET → 3
    // salt shards) plus a small control bucket; incoming: one doc
    // landing in the hot bucket, one in the control bucket, one in a
    // bucket the index has never seen.
    val idx = ((0L until N).map(i => (i, 0, "hotbucket")) :+
      (1000L, 0, "ctrl")).toDF("doc_id", "b", "bh")
    val inc = Seq((9001L, 0, "hotbucket"), (9002L, 0, "ctrl"),
      (9003L, 0, "fresh")).toDF("doc_id", "b", "bh")
    val got = operators.Dedup.bucketProbePairs(inc, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until N).map(i => (9001L, i)).toSet + ((9002L, 1000L))
    // the pre-round-13 skip path dropped ALL 9001 pairs (hot bucket);
    // the salted probe must return every one, and nothing for 9003
    assert(got === expected)
  }

  test("small buckets ride the same path with no replication blowup") {
    import spark.implicits._
    val df = Seq((1L, 0, "x"), (2L, 0, "x"), (3L, 1, "y"), (4L, 1, "y"),
      (5L, 2, "z")).toDF("doc_id", "b", "bh")
    val got = operators.Dedup.bucketAllPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
  }
}
