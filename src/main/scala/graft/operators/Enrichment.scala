package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cache-aside enrichment framework (SURVEY E1/E2/E3, A3) — the
  * reference's DataLoader-plus-Postgres-cache pattern
  * (`/root/reference/src/transforms/Elevation.ts:40-246`,
  * `src/utils/PostgresCache.ts:15-412`) re-expressed as dataflow:
  *
  *   distinct keys → LEFT ANTI join vs fresh cache → fetch missing
  *   (batched, per-partition) → union back into the cache → equi-join
  *   the enriched values onto the features.
  *
  * The external elevation service is a DETERMINISTIC STUB
  * (`stubElevation`) — zero-egress container — with the same
  * per-geohash-key contract as the real backends; swapping in an HTTP
  * fetch changes only `fetchMissing`'s mapPartitions body.
  *
  * Scale notes: the anti-join deduplicates keys BEFORE any fetch (the
  * reference's request-dedup, distributed); the cache table is keyed
  * by quantized location so reruns touch only new territory; TTL
  * expiry is a filter pushed to the cache scan.
  */
object Enrichment {

  /** Quantized location key (~1e-4 deg ≈ 11 m — the elevation-cache
    * granularity class of the reference's geohash-10).
    */
  def locKey(lon: Column, lat: Column): Column =
    concat_ws("_",
      floor((lon * 10000) + 0.5).cast("long"),
      floor((lat * 10000) + 0.5).cast("long"))

  /** Deterministic stand-in for the elevation backend: meters in
    * [0, 4000) derived from the portable hash of the key.
    */
  def stubElevation(key: Column): Column =
    (pmod(HashFunctions.hash32(key), lit(40000)).cast("double")) / 10.0

  def sqlStubElevation(key: String): String =
    s"(CAST(CAST(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8)) AS BIGINT) % 40000 AS DOUBLE)) / 10.0"

  /** Cache-aside lookup: returns (key, value) covering every requested
    * key, fetching only keys absent from `cache` (or expired per
    * `freshPredicate`), and the new cache state.
    */
  def cacheAside(requestedKeys: DataFrame, cache: DataFrame,
      freshPredicate: Column, fetch: DataFrame => DataFrame)
      : (DataFrame, DataFrame) = {
    val fresh = cache.filter(freshPredicate)
    val distinctKeys = requestedKeys.select("key").distinct()
    val missing = distinctKeys.join(fresh.select("key"), Seq("key"),
      "left_anti")
    val fetched = fetch(missing)
    val newCache = fresh.select("key", "value").unionByName(fetched)
    (newCache, newCache)
  }

  // ---- query: elevation enrichment of run geometries ---------------------
  // Empty initial cache → enrichment reduces to the deterministic
  // backend function, which the oracle computes directly; the
  // anti-join/union mechanics are exercised on the Spark side and
  // unit-tested with a warm cache in EnrichmentSpec.
  private val qElevation = QuerySpec.of(
    "q_ski_elevation_enrich", {
      import SkiFeatures.sql._
      val keyFor = (lon: String, lat: String) =>
        s"(CAST(floor(($lon * 10000) + 0.5) AS BIGINT) || '_' || CAST(floor(($lat * 10000) + 0.5) AS BIGINT))"
      val e0 = sqlStubElevation(keyFor("lon0", "lat0"))
      val e1 = sqlStubElevation(keyFor("(lon0 + dx)", "(lat0 + dy)"))
      val e2 = sqlStubElevation(keyFor("(lon0 + dx * 2)", "(lat0 + dy)"))
      s"""WITH f AS (
        |  SELECT $wayId AS way_id,
        |    $lon0 AS lon0, $lat0 AS lat0, $dx AS dx, $dy AS dy
        |  FROM lineitem),
        |k AS (SELECT way_id, $e0 AS e0, $e1 AS e1, $e2 AS e2 FROM f),
        |w AS (SELECT way_id,
        |      CAST(floor((min(least(e0, e1, e2)) * 10) + 0.5) AS BIGINT) AS dmin,
        |      CAST(floor((max(greatest(e0, e1, e2)) * 10) + 0.5) AS BIGINT) AS dmax
        |      FROM k GROUP BY way_id)
        |SELECT CAST(way_id % 16 AS BIGINT) AS bucket, count(*) AS n_runs,
        |  CAST((sum(dmax - dmin) * 2000 + count(*)) // (count(*) * 2)
        |    AS DOUBLE) / 10000.0 AS avg_relief,
        |  CAST(min(dmin) AS DOUBLE) / 10.0 AS min_elev,
        |  CAST(max(dmax) AS DOUBLE) / 10.0 AS max_elev
        |FROM w GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (s, d) =>
    val pts = SkiFeatures.synthesize(s, d)
      .select(col("way_id"), posexplode(col("coords")))
      .select(col("way_id"), col("pos"),
        locKey(element_at(col("col"), 1), element_at(col("col"), 2)).as("key"))
    val cacheSchema = "key string, value double"
    val emptyCache = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(cacheSchema))
    val (newCache, _) = cacheAside(pts, emptyCache, lit(true),
      missing => missing.select(col("key"), stubElevation(col("key")).as("value")))
    val enriched = pts.join(newCache, Seq("key"))
    // elevations are exact deci-meters (stub = k/10): aggregate in
    // integer deci units with integer half-up rounding for the 4-dp
    // average — see the QuerySpec determinism contract
    enriched.groupBy("way_id")
      .agg(floor((max("value") * 10) + 0.5).cast("long").as("dmax"),
        floor((min("value") * 10) + 0.5).cast("long").as("dmin"))
      .select(pmod(col("way_id"), lit(16)).cast("long").as("bucket"),
        (col("dmax") - col("dmin")).as("drelief"),
        col("dmin"), col("dmax"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_runs"),
        expr("CAST((sum(drelief) * 2000 + count(*)) DIV (count(*) * 2)"
          + " AS DOUBLE) / 10000.0").as("avg_relief"),
        (min("dmin").cast("double") / 10.0).as("min_elev"),
        (max("dmax").cast("double") / 10.0).as("max_elev"))
      .orderBy("bucket")
  }

  val specs: Seq[QuerySpec] = Seq(qElevation)
}
