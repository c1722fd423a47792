package graft

import graft.operators.Enrichment
import org.apache.spark.sql.functions._

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("cacheAside fetches only missing keys and unions the cache") {
    val requested = Seq("a", "b", "c", "c").toDF("key")
    val cache = Seq(("a", 1.0, 100L), ("z", 9.0, 100L))
      .toDF("key", "value", "ts")
    var fetchedKeys: Seq[String] = Nil
    val (newCache, _) = Enrichment.cacheAside(requested, cache,
      lit(true), missing => {
        fetchedKeys = missing.as[String].collect().toSeq.sorted
        missing.select(col("key"), lit(42.0).as("value"))
      })
    val state = newCache.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // fetch saw only the distinct missing keys
    assert(fetchedKeys == Seq("b", "c"))
    // cached value kept, missing filled, unrelated cache entries kept
    assert(state == Map("a" -> 1.0, "b" -> 42.0, "c" -> 42.0, "z" -> 9.0))
  }

  test("expired cache entries are re-fetched (TTL as a filter)") {
    val requested = Seq("a", "b").toDF("key")
    val cache = Seq(("a", 1.0, 50L), ("b", 2.0, 500L))
      .toDF("key", "value", "ts")
    val (newCache, _) = Enrichment.cacheAside(requested, cache,
      col("ts") >= 100L, // entries older than ts=100 are stale
      missing => missing.select(col("key"), lit(7.0).as("value")))
    val state = newCache.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(state == Map("a" -> 7.0, "b" -> 2.0))
  }

  test("stubElevation is deterministic and in range") {
    val vals = Seq("10_20", "10_20", "11_21").toDF("key")
      .select(Enrichment.stubElevation(col("key"))).collect().map(_.getDouble(0))
    assert(vals(0) == vals(1))
    assert(vals.forall(v => v >= 0 && v < 4000))
  }
}
