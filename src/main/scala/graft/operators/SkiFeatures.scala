package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic OSM-like feature synthesis from the driver-provided
  * tables (TESTDATA.md forbids bringing our own inputs), so the ski
  * formatter/geometry/clustering operators run against real
  * DataFrames at every scale factor and stay oracle-checkable: the
  * DuckDB oracle re-derives the same features from the flat columns
  * with plain CASE SQL, independent of the tag-map machinery here.
  *
  * One lineitem row → one candidate run feature:
  *  - `way_id`   = l_orderkey·10 + l_linenumber
  *  - `tags`     = OSM tag map exercising the lifecycle cascade (P7),
  *                 uses list parsing (P1), difficulty/grooming rules,
  *                 name collection (P9) and ref selection (P8)
  *  - `coords`   = 3-point LineString near a deterministic per-order
  *                 anchor (lat clamped to ±60 so the 0.01° grid join's
  *                 3×3 neighborhood always covers a 500 m radius),
  *                 with z from the part/quantity columns
  */
object SkiFeatures {

  val ValidUses: Seq[String] = Seq("downhill", "nordic", "skitour",
    "snow_park", "connection", "hike", "sled", "fatbike", "other")

  val ValidDifficulties: Seq[String] = Seq("novice", "easy", "intermediate",
    "advanced", "expert", "freeride", "extreme")

  val ValidGrooming: Seq[String] = Seq("classic", "skating",
    "classic+skating", "mogul", "scooter", "backcountry")

  private val memo =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()

  /** way_id, tags (map), coords — memoized + checkpointed (see the
    * trailing comment in [[build]]).
    */
  def synthesize(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate((s, d), build(s, d))

  private def build(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val part = Tables.part(s, d).select("p_partkey", "p_name", "p_brand")
    val wayId = (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
    val usesRaw =
      when(col("l_returnflag") === "R", "downhill")
        .when(col("l_returnflag") === "A", "Downhill;Nordic")
        .otherwise("nordic;junk")
    val lifecycle = pmod(col("l_linenumber"), lit(7))
    val diffIdx = pmod(floor(col("l_quantity")).cast("long"), lit(9))
    val difficultyRaw = (ValidDifficulties.zipWithIndex.foldRight(
      when(diffIdx === 7, "bogus")) { case ((v, i), acc) =>
      when(diffIdx === i, v).otherwise(acc)
    }) // idx 8 → null (absent)
    val groomIdx = pmod(floor(col("l_discount") * 100).cast("long"), lit(5))
    val groomingRaw =
      when(groomIdx === 0, "classic").when(groomIdx === 1, "skating")
        .when(groomIdx === 2, "mogul").when(groomIdx === 3, "no")
    // idx 4 → absent
    val taxPct = floor(col("l_tax") * 100).cast("long")
    val gladedTag = when(taxPct >= 5 && taxPct < 7, "yes")
      .when(taxPct >= 7 && taxPct < 8, "no")
    val natural = when(taxPct >= 8, "wood")
    val onewayTag = when(pmod(col("l_suppkey"), lit(3)) === 0, "yes")
      .when(pmod(col("l_suppkey"), lit(3)) === 1, "no")
    val ref = concat(lit("R"), pmod(col("l_partkey"), lit(50)).cast("string"))

    // lifecycle variants place the uses value under different keys
    val baseVal = when(lifecycle === 1 || lifecycle === 3,
      lit(null).cast("string"))
      .when(lifecycle === 2, lit("disused"))
      .otherwise(usesRaw)
    // plain CreateMap (codegen'd) with null values for absent tags —
    // element_at treats a null value and a missing key identically, so
    // no interpreted map_filter (CodegenFallback) is needed here.
    val tags = map(
        lit("piste:type"), baseVal,
        lit("piste:abandoned"), when(lifecycle === 0, "yes"),
        lit("proposed:piste:type"), when(lifecycle === 1, usesRaw),
        lit("disused"), when(lifecycle === 2, usesRaw),
        lit("demolished:piste:type"), when(lifecycle === 3, usesRaw),
        lit("piste:difficulty"), difficultyRaw,
        lit("piste:grooming"), groomingRaw,
        lit("gladed"), gladedTag,
        lit("natural"), natural,
        lit("oneway"), onewayTag,
        lit("name"), col("p_name"),
        lit("name:xx"), col("p_brand"),
        lit("piste:ref"), ref)

    val lon0 = (pmod(col("l_orderkey") * 7919, lit(360000)).cast("double")
      / 1000.0 - 180.0) + col("l_linenumber") * 0.001
    val lat0 = pmod(col("l_orderkey") * 104729, lit(120000)).cast("double") / 1000.0 - 60.0
    val dx = (pmod(wayId, lit(5)) + 1).cast("double") * 0.001
    val dy = (pmod(wayId, lit(3)) + 1).cast("double") * 0.0005
    val z0 = pmod(wayId, lit(3000)).cast("double")
    val coords = array(
      array(lon0, lat0, z0),
      array(lon0 + dx, lat0 + dy, z0 + col("l_quantity")),
      array(lon0 + dx * 2, lat0 + dy, z0 + col("l_quantity") * 2))

    // repartition: the source is one small parquet file (single input
    // split) and the tag-map build is interpreted (higher-order
    // functions don't codegen) — fan out before the heavy projection.
    // localCheckpoint: a repartition alone is NOT an optimizer barrier
    // (ColumnPruning pushes projections straight through Repartition,
    // re-inlining the map construction into every downstream consumer,
    // join conditions included); checkpointing materializes the built
    // map once. Memoized per (session, sfDir) so every ski query
    // shares one materialization.
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(wayId.as("way_id"), tags.as("tags"), coords.as("coords"))
      .localCheckpoint()
  }

  /** DuckDB twin of the synthesis geometry (lon/lat/z expressions over
    * a joined lineitem×part row), for oracle SQL composition.
    */
  object sql {
    val wayId = "(l_orderkey * 10 + l_linenumber)"
    val lon0 =
      s"(CAST((l_orderkey * 7919) % 360000 AS DOUBLE) / 1000.0 - 180.0 + l_linenumber * 0.001)"
    val lat0 =
      s"(CAST((l_orderkey * 104729) % 120000 AS DOUBLE) / 1000.0 - 60.0)"
    val dx = s"(CAST($wayId % 5 + 1 AS DOUBLE) * 0.001)"
    val dy = s"(CAST($wayId % 3 + 1 AS DOUBLE) * 0.0005)"
    val z0 = s"CAST($wayId % 3000 AS DOUBLE)"
    val usesRaw = "(CASE l_returnflag WHEN 'R' THEN 'downhill' " +
      "WHEN 'A' THEN 'Downhill;Nordic' ELSE 'nordic;junk' END)"
    val lifecycle = "(l_linenumber % 7)"
    val diffIdx = "(CAST(floor(l_quantity) AS BIGINT) % 9)"
    val groomIdx = "(CAST(floor(l_discount * 100) AS BIGINT) % 5)"
    val taxPct = "CAST(floor(l_tax * 100) AS BIGINT)"
  }
}
