package graft.operators

import graft.QuerySpec
import graft.functions.{GeoFunctions, HashFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reverse geocoding (SURVEY E3,
  * `/root/reference/src/transforms/Geocoder.ts:62-389` +
  * `src/transforms/PlaceUtils.ts:7-69`): geometry points are keyed by
  * GEOHASH-6 cells (the reference's `geocodePrecision = 6`), looked up
  * through the cache-aside kernel (distinct keys → anti-join vs cache
  * → batched fetch → join back), resolved to places, then per feature
  * DEDUPLICATED by (locality, region, country) and SORTED locality →
  * region → country with nulls LAST (PlaceUtils.sortPlaces/
  * uniquePlaces).
  *
  * The geocoding BACKEND (photon HTTP) is a deterministic stub
  * (zero-egress container): the hash of the geohash key picks which
  * country/region the "response" names. The RESOLUTION is real —
  * the picked row resolves through the vendored public ISO-3166
  * table ([[Iso3166]]), yielding the reference's `iso3166_1Alpha2`
  * and `iso3166_2 = country + "-" + region` codes
  * (`Geocoder.ts:268-333`); the locality stays a stub (photon city),
  * and nulls are injected (no-state responses, country-only rows) to
  * exercise the nulls-last sort. A place renders as
  * "locality/iso3166_2/country" with '~' for null — '~' sorts after
  * alphanumerics, so one string serves as both sort key and display
  * (the oracle uses the identical encoding over the same vendored
  * rows).
  *
  * Scale notes: geohash keying collapses nearby points into one cache
  * key BEFORE the fetch (the reference's request dedup, distributed);
  * the per-feature aggregation is one groupBy on way_id.
  */
object Geocoding {

  private val SampleMod = 13

  /** Deterministic place stub from a geohash key. */
  private[operators] def stubPlaceFor(key: Column): Column = stubPlace(key)

  private[operators] def sqlStubPlaceFor(key: String): String =
    sqlStubPlace(key)

  private def stubPlace(key: Column): Column = {
    val n = Iso3166.size
    val iso2Arr = Iso3166.entries.map(_.iso2.getOrElse(""))
    val ccArr = Iso3166.entries.map(_.cc)
    val h = HashFunctions.hash32(key)
    val idx = pmod(h, lit(n))
    // ISO resolution: the picked row's codes, looked up in the
    // vendored table (a literal-array broadcast — Iso3166.table is
    // the DataFrame form for whole-table joins)
    val iso2 = element_at(typedLit(iso2Arr), (idx + 1).cast("int"))
    val cc = element_at(typedLit(ccArr), (idx + 1).cast("int"))
    // no-state response (h % 7 == 0) or a country-only row → no
    // iso3166_2, exactly the reference's `region === null` branch
    val reg = when(pmod(h, lit(7)) === 0 || iso2 === "", lit("~"))
      .otherwise(iso2)
    val loc = when(pmod(h, lit(3)) === 0, lit("~"))
      .otherwise(concat(lit("L"), pmod(h, lit(900))))
    concat(loc, lit("/"), reg, lit("/"), cc)
  }

  private def sqlStubPlace(key: String): String = {
    val n = Iso3166.size
    val h = HashFunctions.sqlHash32(key)
    val i = s"(CAST($h % $n AS INT) + 1)"
    s"""(CASE WHEN $h % 3 = 0 THEN '~' ELSE 'L' || CAST($h % 900 AS VARCHAR) END)
       | || '/' ||
       |(CASE WHEN $h % 7 = 0 OR (${Iso3166.sqlIso2List})[$i] = '' THEN '~'
       |  ELSE (${Iso3166.sqlIso2List})[$i] END)
       | || '/' || ((${Iso3166.sqlCcList})[$i])""".stripMargin
      .replaceAll("\n", " ")
  }

  private val qGeocode = QuerySpec.of(
    "q_ski_geocode", {
      val (lonN, latN, iv, gh) = GeoFunctions.sqlGeohash6("(p).lon", "(p).lat")
      s"""WITH ${SkiQueries.oraclePrelude},
        |pts AS (
        |  SELECT way_id, p FROM kept,
        |    unnest([{'lon': lon0, 'lat': lat0},
        |            {'lon': lon0 + dx, 'lat': lat0 + dy},
        |            {'lon': lon0 + dx * 2, 'lat': lat0 + dy}]) AS u(p)
        |  WHERE way_id % $SampleMod = 0),
        |g1 AS (SELECT way_id, $lonN AS lonN, $latN AS latN FROM pts),
        |g2 AS (SELECT way_id, $iv AS iv FROM g1),
        |g3 AS (SELECT way_id, $gh AS key FROM g2),
        |resolved AS (
        |  SELECT way_id, ${sqlStubPlace("key")} AS place FROM g3)
        |SELECT way_id,
        |  CAST(len(list_sort(list_distinct(list(place)))) AS BIGINT) AS n_places,
        |  array_to_string(list_sort(list_distinct(list(place))), '; ') AS places
        |FROM resolved GROUP BY way_id ORDER BY way_id""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    val pts = SkiQueries.formatted(s, d).filter(col("kept"))
      .filter(pmod(col("way_id"), lit(SampleMod)) === 0)
      .select(col("way_id"), explode(col("coords")).as("p"))
      .select(col("way_id"),
        GeoFunctions.geohash6(element_at(col("p"), 1),
          element_at(col("p"), 2)).as("key"))
    // cache-aside through the shared kernel (empty initial cache — the
    // distinct-key anti-join + batched stub fetch mechanics are real)
    val cache0 = Seq.empty[(String, String)].toDF("key", "value")
    val (lookup, _) = Enrichment.cacheAside(
      pts.select("key"), cache0, lit(true),
      missing => missing.withColumn("value", stubPlace(col("key"))))
    pts.join(lookup, "key")
      .groupBy("way_id")
      .agg(
        size(array_sort(array_distinct(collect_list(col("value")))))
          .cast("long").as("n_places"),
        array_join(array_sort(array_distinct(collect_list(col("value")))),
          "; ").as("places"))
      .orderBy("way_id")
  }

  val specs: Seq[QuerySpec] = Seq(qGeocode)
}
