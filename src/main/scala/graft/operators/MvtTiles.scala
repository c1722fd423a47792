package graft.operators

import graft.QuerySpec
import graft.functions.MvtPrepExpr
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine Mapbox Vector Tile generation (SURVEY S8 depth) — the
  * reference shells out to tippecanoe with per-layer zoom ranges
  * (`/root/reference/src/transforms/TilesGenerator.ts:15-97`: ski
  * areas Z0-15 `-B 0`, lifts Z5-15, runs Z9-15, spots Z9-15 `-B 10`,
  * all with `--drop-densest-as-needed`, the line layers with
  * `--simplify-only-low-zooms`) and merges the per-layer tilesets
  * with tile-join. Here the whole path is Spark DataFrame algebra
  * plus three byte/geometry kernels:
  *
  *  1. tile assignment — per feature and zoom, the slippy tiles its
  *     lon/lat bbox intersects EXPANDED BY THE LAYER BUFFER
  *     (Web-Mercator, the TerrainTiles operation order, so both
  *     engines compute identical doubles; tile indices clamped to
  *     [0, 2^z-1], no antimeridian wrap). `explode(sequence(...))`
  *     keeps the fan-out itself narrow. Two small shuffles precede
  *     it: the `Tables.fanout` repartition and the runs layer's
  *     groupBy(way_id) dedup in `features()` — both over un-exploded
  *     feature rows, tiny relative to the post-explosion volume;
  *  2. density cap — the deterministic `--drop-densest-as-needed`
  *     analog: per (z, tx, ty, layer) only the K(z) features with the
  *     smallest stable hash rank survive (64 at z0-4, 512 at z5-8,
  *     uncapped at z9+ where tiles shard the world geographically).
  *     Implemented as a salted two-level top-K (row_number within 64
  *     hash salts, then within the tile) so even the z0 "every ski
  *     area on earth" group never serializes one task on raw volume;
  *  3. geometry prep — tile-local quantization at the 4096 extent,
  *     then [[graft.functions.MvtPrepKernel]]: Douglas-Peucker
  *     simplification at low zooms (`--simplify-only-low-zooms` for
  *     lines/spots = below MaxZoom; ski areas at every zoom, matching
  *     their flagless tippecanoe invocation) with the tiny-polygon
  *     placeholder square, and clipping to the buffered tile square
  *     (Liang-Barsky segments with multi-part merge, 4-pass
  *     Sutherland-Hodgman rings; features interior to the buffered
  *     square skip the clippers — identity fast path). ONE fused
  *     kernel walk per row emits the feature's final packed geometry
  *     command bytes AND its stats (n_parts, n_points, checksum), so
  *     per-point data never crosses an exchange as nested arrays;
  *  4. encoding — [[graft.functions.MvtKernel]] frames the pre-encoded
  *     feature bytes into each layer's protobuf frame after a per-tile
  *     collect; a tile is the concatenation of its layer frames — no
  *     per-point work after the shuffle, no driver round-trip, no
  *     external binary.
  *
  * Scale shape: steps 1-3 are per-row expressions over the feature
  * tables; the only wide exchanges are the two bounded cap windows
  * over the z≤8 slice and one shuffle on (z, tx, ty, layer) — the
  * partition key a tile server wants, so a 1000-executor run writes
  * tiles straight out of the agg, and the cap guarantees every
  * low-zoom group is bounded by K(z) before any collect happens.
  *
  * Correctness: `q_tiles_mvt` is the DuckDB-oracled stats row
  * (per-tile/zoom/layer feature/part/point counts + an order-weighted
  * integer checksum over the final prepared coordinates — the oracle
  * CTEs replay assignment, cap, quantization, DP closure, placeholder
  * and both clippers arithmetic-identically); `q_tiles_mvt_bytes`
  * decodes the engine's own protobuf tiles back to those SAME stats
  * columns, against the SAME oracle SQL — so the byte encoding
  * round-trips per tile under the driver's hash gate, with
  * MvtTilesSpec's structural protobuf checks on top.
  */
object MvtTiles {

  val Extent = 4096
  val MaxZoom = 15

  /** DP tolerance in extent px — tippecanoe's `-S` default scale. */
  val SimplifyTol = 1L

  /** Per-layer clip buffer in extent units: tippecanoe's `-B` is in
    * 256-px screen tiles, ×16 at the 4096 extent (default 5 → 80;
    * spots `-B 10` → 160; ski areas `-B 0` → 0).
    */
  private def bufferOf(layer: Column): Column =
    when(layer === "skiareas", 0).when(layer === "spots", 160).otherwise(80)

  /** Density-cap K at low zooms; z9+ uncapped (geographic sharding
    * bounds groups there — one tile is 1/4^9 of the world).
    */
  private val CapLowZ = 64L // z0-4
  private val CapMidZ = 512L // z5-8

  // --- Web-Mercator world-pixel columns (TerrainTiles operation order,
  //     extent units; exact SQL twins below) -------------------------------
  private def xWorld(lon: Column): Column =
    lit(4096.0) * (lit(0.5) + lon / 360.0)

  private def yWorld(lat: Column): Column = {
    val siny = least(greatest(sin(lat * math.Pi / 180.0), lit(-0.9999)),
      lit(0.9999))
    lit(4096.0) * (lit(0.5) -
      log((lit(1.0) + siny) / (lit(1.0) - siny)) / (4.0 * math.Pi))
  }

  private def sqlXw(lon: String): String =
    s"4096.0 * (0.5 + ($lon) / 360.0)"

  private def sqlYw(lat: String): String = {
    val siny = s"LEAST(GREATEST(sin(($lat) * pi() / 180.0), -0.9999), 0.9999)"
    s"4096.0 * (0.5 - ln((1.0 + $siny) / (1.0 - $siny)) / (4.0 * pi()))"
  }

  // --- layer feature synthesis --------------------------------------------
  // Geometry sources: runs carry real formatted coords; ski areas the
  // hexagon rings the clustering fixtures use; lift lines and spot
  // points synthesize deterministically from orders/events keys (the
  // driver tables carry no lift geometry), with the formulas mirrored
  // verbatim in the oracle CTEs.

  /** (layer, fid, gtype, minz, pts array<struct<lon,lat>>, pk, pv).
    * Shared with the GeoPackage BLOB encoder (same four layers, same
    * oracle CTEs).
    */
  private[operators] def features(s: SparkSession, d: String): DataFrame = {
    val pt = (lonC: Column, latC: Column) =>
      struct(lonC.as("lon"), latC.as("lat"))

    // way_id is NOT unique in the synthesized lineitem (duplicate
    // (orderkey, linenumber) pairs exist); the 2D geometry is a pure
    // function of way_id, so duplicates collapse to one feature per
    // way_id (first of the identical point arrays, min of the
    // varying props — mirrored as min() in the oracle CTE).
    val runs = SkiQueries.formatted(s, d).filter(col("kept"))
      .select(col("way_id"), col("name"), col("difficulty"),
        transform(col("coords"), c =>
          struct(element_at(c, 1).as("lon"), element_at(c, 2).as("lat")))
          .as("pts2d"))
      .groupBy("way_id")
      .agg(first("pts2d").as("pts"), min("name").as("name"),
        min("difficulty").as("difficulty"))
      .select(lit("runs").as("layer"), col("way_id").as("fid"),
        lit(2).as("gtype"), lit(9).as("minz"), col("pts"),
        array(lit("name"), lit("difficulty")).as("pk"),
        array(col("name"), col("difficulty")).as("pv"))

    val o = graft.Tables.orders(s, d)
    val lifts = o.filter(pmod(col("o_orderkey"), lit(23)) === 0)
      .select(col("o_orderkey").as("fid"),
        (pmod(col("o_orderkey") * 104729, lit(360000)).cast("double")
          / 1000.0 - 180.0).as("llon"),
        (pmod(col("o_orderkey") * 7919, lit(120000)).cast("double")
          / 1000.0 - 60.0).as("llat"),
        ((pmod(col("o_orderkey"), lit(4)) + 1).cast("double") * 0.002)
          .as("dlx"),
        ((pmod(col("o_orderkey"), lit(2)) + 1).cast("double") * 0.001)
          .as("dly"))
      .select(lit("lifts").as("layer"), col("fid"), lit(2).as("gtype"),
        lit(5).as("minz"),
        array(pt(col("llon"), col("llat")),
          pt(col("llon") + col("dlx"), col("llat") + col("dly"))).as("pts"),
        array(lit("kind"), lit("ref")).as("pk"),
        array(lit("lift"),
          concat(lit("L"), pmod(col("fid"), lit(30)))).as("pv"))

    // hexagon ring, ClusterPipeline's fixture formulas verbatim
    val sqrt32 = sqrt(lit(3.0)) / 2
    val cosK = Seq(lit(1.0), lit(0.5), lit(-0.5), lit(-1.0), lit(-0.5),
      lit(0.5))
    val sinK = Seq(lit(0.0), sqrt32, sqrt32, lit(0.0), -sqrt32, -sqrt32)
    val areas = o.filter(pmod(col("o_orderkey"), lit(37)) === 0)
      .select(col("o_orderkey").as("fid"),
        (pmod(col("o_orderkey") * 7919, lit(360000)).cast("double")
          / 1000.0 - 180.0).as("alon"),
        (pmod(col("o_orderkey") * 104729, lit(120000)).cast("double")
          / 1000.0 - 60.0).as("alat"))
      .select(lit("skiareas").as("layer"), col("fid"), lit(3).as("gtype"),
        lit(0).as("minz"),
        array((0 until 6).map { k =>
          val r = lit(0.004) * (lit(1.0)
            + pmod(col("fid") + k, lit(3)).cast("double") * lit(0.3))
          pt(col("alon") + r * cosK(k), col("alat") + r * sinK(k))
        }: _*).as("pts"),
        array(lit("kind")).as("pk"), array(lit("skiarea")).as("pv"))

    runs.unionByName(lifts).unionByName(areas)
      .unionByName(spotFeatures(graft.Tables.events(s, d)))
  }

  /** Spot features from any events-schema frame — shared by the batch
    * build above and the streaming tile-refresh's micro-batches (the
    * formulas must stay identical or the incremental store would
    * diverge from the batch oracle).
    */
  private[graft] def spotFeatures(events: DataFrame): DataFrame =
    events
      .select(lit("spots").as("layer"), col("event_id").as("fid"),
        lit(1).as("gtype"), lit(9).as("minz"),
        array(struct(
          (pmod(col("event_id") * 7919, lit(360000)).cast("double")
            / 1000.0 - 180.0).as("lon"),
          (pmod(col("event_id") * 104729, lit(120000)).cast("double")
            / 1000.0 - 60.0).as("lat"))).as("pts"),
        array(lit("kind")).as("pk"), array(lit("spot")).as("pv"))

  // one row per (layer, fid, pidx, lon, lat) + per-feature meta;
  // shared with the GeoPackage BLOB oracle
  private[operators] val oracleFeatPtsCtes: String = {
    s"""runs_dd AS (
      |  SELECT way_id, min(lon0) AS lon0, min(lat0) AS lat0,
      |    min(dx) AS dx, min(dy) AS dy
      |  FROM kept GROUP BY way_id),
      |feat_pts AS (
      |  SELECT 'runs' AS layer, way_id AS fid, 2 AS gtype, 9 AS minz,
      |    k AS pidx, lon0 + dx * CAST(k AS DOUBLE) AS lon,
      |    CASE WHEN k = 0 THEN lat0 ELSE lat0 + dy END AS lat
      |  FROM runs_dd, unnest([0, 1, 2]) AS uk(k)
      |  UNION ALL
      |  SELECT 'lifts', o_orderkey, 2, 5, k,
      |    (CAST((o_orderkey * 104729) % 360000 AS DOUBLE) / 1000.0 - 180.0)
      |      + CAST(k AS DOUBLE)
      |        * (CAST(o_orderkey % 4 + 1 AS DOUBLE) * 0.002),
      |    (CAST((o_orderkey * 7919) % 120000 AS DOUBLE) / 1000.0 - 60.0)
      |      + CAST(k AS DOUBLE)
      |        * (CAST(o_orderkey % 2 + 1 AS DOUBLE) * 0.001)
      |  FROM orders, unnest([0, 1]) AS uk(k)
      |  WHERE o_orderkey % 23 = 0
      |  UNION ALL
      |  SELECT 'skiareas', o_orderkey, 3, 0, k,
      |    (CAST((o_orderkey * 7919) % 360000 AS DOUBLE) / 1000.0 - 180.0)
      |      + (CAST(0.004 AS DOUBLE) * (CAST(1 AS DOUBLE)
      |        + CAST((o_orderkey + k) % 3 AS DOUBLE) * CAST(0.3 AS DOUBLE)))
      |      * (CASE k WHEN 0 THEN CAST(1 AS DOUBLE)
      |         WHEN 1 THEN CAST(0.5 AS DOUBLE)
      |         WHEN 2 THEN CAST(-0.5 AS DOUBLE) WHEN 3 THEN CAST(-1 AS DOUBLE)
      |         WHEN 4 THEN CAST(-0.5 AS DOUBLE)
      |         ELSE CAST(0.5 AS DOUBLE) END),
      |    (CAST((o_orderkey * 104729) % 120000 AS DOUBLE) / 1000.0 - 60.0)
      |      + (CAST(0.004 AS DOUBLE) * (CAST(1 AS DOUBLE)
      |        + CAST((o_orderkey + k) % 3 AS DOUBLE) * CAST(0.3 AS DOUBLE)))
      |      * (CASE k WHEN 0 THEN CAST(0 AS DOUBLE)
      |         WHEN 1 THEN sqrt(CAST(3 AS DOUBLE)) / 2
      |         WHEN 2 THEN sqrt(CAST(3 AS DOUBLE)) / 2
      |         WHEN 3 THEN CAST(0 AS DOUBLE)
      |         WHEN 4 THEN -(sqrt(CAST(3 AS DOUBLE)) / 2)
      |         ELSE -(sqrt(CAST(3 AS DOUBLE)) / 2) END)
      |  FROM orders, unnest([0, 1, 2, 3, 4, 5]) AS uk(k)
      |  WHERE o_orderkey % 37 = 0
      |  UNION ALL
      |  SELECT 'spots', event_id, 1, 9, 0,
      |    CAST((event_id * 7919) % 360000 AS DOUBLE) / 1000.0 - 180.0,
      |    CAST((event_id * 104729) % 120000 AS DOUBLE) / 1000.0 - 60.0
      |  FROM events)""".stripMargin
  }

  // ======================= oracle CTE generation ==========================
  // The relational replay of assignment→cap→quantize→simplify→clip,
  // arithmetic-identical to the Spark pipeline. Generated from Scala
  // templates so the DP closure steps and the four Sutherland-Hodgman
  // passes stay mechanically in sync with MvtPrepKernel.

  private val Tol2 = SimplifyTol * SimplifyTol

  /** One Douglas-Peucker closure step over sorted keep-list column
    * `kept` and quantized point list `q` (1-indexed lists, 0-based
    * point indices): for every adjacent kept pair, add the argmax-
    * distance interior vertex when it exceeds tolerance. Unrolled 4×
    * (features here have ≤ 6 vertices → ≤ 4 interior adds) this
    * reaches the DP fixpoint, which equals the recursive DP kept set.
    */
  private def sqlDpStep(kept: String, q: String): String = {
    val a = s"$kept[jj]"
    val b = s"$kept[jj + 1]"
    val ax = s"$q[$a + 1].x"; val ay = s"$q[$a + 1].y"
    val bx = s"$q[$b + 1].x"; val by = s"$q[$b + 1].y"
    val len2 = s"(($bx - $ax) * ($bx - $ax) + ($by - $ay) * ($by - $ay))"
    val cross = s"(($bx - $ax) * ($q[k + 1].y - $ay)" +
      s" - ($by - $ay) * ($q[k + 1].x - $ax))"
    val pd2 = s"(($q[k + 1].x - $ax) * ($q[k + 1].x - $ax)" +
      s" + ($q[k + 1].y - $ay) * ($q[k + 1].y - $ay))"
    val mvals = s"list_transform(range($a + 1, $b), k -> " +
      s"CASE WHEN $len2 = 0 THEN $pd2 ELSE $cross * $cross END)"
    val mmax = s"list_aggregate($mvals, 'max')"
    s"""list_sort(list_distinct($kept || flatten(
      |list_transform(range(1, len($kept)), jj ->
      |  CASE WHEN $b - $a < 2 THEN []
      |       WHEN (CASE WHEN $len2 = 0 THEN $mmax > $Tol2
      |             ELSE $mmax > $Tol2 * $len2 END)
      |       THEN [$a + list_position($mvals, $mmax)]
      |       ELSE [] END))))""".stripMargin
  }

  /** One Sutherland-Hodgman half-plane pass over double-point list
    * column `r`: keep side is `coord >= bound` when `keepGe` else
    * `<= bound`; intersections stay doubles, formula order matches
    * MvtPrepKernel.shPass.
    */
  private def sqlShPass(r: String, axisX: Boolean, keepGe: Boolean,
      bound: String): String = {
    val c = if (axisX) "x" else "y"
    val cur = s"$r[i]"
    val prev = s"$r[CASE WHEN i = 1 THEN len($r) ELSE i - 1 END]"
    def in(p: String) =
      if (keepGe) s"$p.$c >= $bound" else s"$p.$c <= $bound"
    val t = s"(($bound) - $prev.$c) / ($cur.$c - $prev.$c)"
    val inter =
      if (axisX)
        s"struct_pack(x := CAST($bound AS DOUBLE), " +
          s"y := $prev.y + $t * ($cur.y - $prev.y))"
      else
        s"struct_pack(x := $prev.x + $t * ($cur.x - $prev.x), " +
          s"y := CAST($bound AS DOUBLE))"
    s"""flatten(list_transform(range(1, len($r) + 1), i ->
      |  CASE WHEN (${in(prev)}) AND (${in(cur)}) THEN [$cur]
      |       WHEN (${in(prev)}) AND NOT (${in(cur)}) THEN [$inter]
      |       WHEN NOT (${in(prev)}) AND (${in(cur)}) THEN [$inter, $cur]
      |       ELSE [] END))""".stripMargin
  }

  /** Full oracle chain from `feat_pts` to `tile_stats` — the relational
    * twin of tileRange→capped→prepped→stats.
    */
  private[operators] val oraclePrepCtes: String = {
    val lo = "CAST(-buf AS DOUBLE)"
    val hi = "CAST(4096 + buf AS DOUBLE)"
    s"""feat_geom AS (
      |  SELECT layer, fid, gtype, minz,
      |    min(lon) AS lonmin, max(lon) AS lonmax,
      |    min(lat) AS latmin, max(lat) AS latmax,
      |    list(struct_pack(lon := lon, lat := lat) ORDER BY pidx) AS pts
      |  FROM feat_pts GROUP BY 1, 2, 3, 4),
      |feat_z AS (
      |  SELECT g.*, z, CAST(1::BIGINT << z AS DOUBLE) AS s2z,
      |    (1::BIGINT << z) * 4096 - 1 AS wmax,
      |    CASE WHEN layer = 'skiareas' THEN 0
      |         WHEN layer = 'spots' THEN 160 ELSE 80 END AS buf,
      |    CASE WHEN layer = 'skiareas' THEN TRUE
      |         ELSE z < $MaxZoom END AS simp
      |  FROM feat_geom g, unnest(generate_series(g.minz, $MaxZoom)) AS uz(z)),
      |feat_rng AS (
      |  SELECT *,
      |    GREATEST(CAST(floor((${sqlXw("lonmin")}) * s2z) AS BIGINT)
      |      - buf, 0) // 4096 AS txlo,
      |    LEAST(CAST(floor((${sqlXw("lonmax")}) * s2z) AS BIGINT)
      |      + buf, wmax) // 4096 AS txhi,
      |    GREATEST(CAST(floor((${sqlYw("latmax")}) * s2z) AS BIGINT)
      |      - buf, 0) // 4096 AS tylo,
      |    LEAST(CAST(floor((${sqlYw("latmin")}) * s2z) AS BIGINT)
      |      + buf, wmax) // 4096 AS tyhi
      |  FROM feat_z),
      |feat_tiles AS MATERIALIZED (
      |  SELECT r.*, tx, ty
      |  FROM feat_rng r,
      |    unnest(generate_series(r.txlo, r.txhi)) AS ux(tx),
      |    unnest(generate_series(r.tylo, r.tyhi)) AS uy(ty)),
      |capped AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT t.*,
      |      CASE WHEN z <= 4 THEN $CapLowZ
      |           WHEN z <= 8 THEN $CapMidZ ELSE NULL END AS kcap,
      |      row_number() OVER (PARTITION BY z, tx, ty, layer
      |        ORDER BY ((fid % 1000000007) * 2654435761) % 1000000007,
      |          fid) AS rnk
      |    FROM feat_tiles t)
      |  WHERE kcap IS NULL OR rnk <= kcap),
      |quant AS MATERIALIZED (
      |  SELECT layer, fid, gtype, z, tx, ty, buf, simp,
      |    list_transform(pts, p -> struct_pack(
      |      x := CAST(floor((${sqlXw("p.lon")}) * s2z) AS BIGINT)
      |        - tx * 4096,
      |      y := CAST(floor((${sqlYw("p.lat")}) * s2z) AS BIGINT)
      |        - ty * 4096)) AS q
      |  FROM capped),
      |dp0 AS MATERIALIZED (
      |  SELECT *, CASE WHEN simp AND gtype >= 2
      |    AND list_aggregate(list_transform(q,
      |      p -> GREATEST(abs(p.x), abs(p.y))), 'max') <= 16384
      |    THEN [0, len(q) - 1] ELSE NULL END AS kept FROM quant),
      |dp1 AS MATERIALIZED (SELECT * REPLACE (CASE WHEN kept IS NULL THEN NULL
      |  ELSE ${sqlDpStep("kept", "q")} END AS kept) FROM dp0),
      |dp2 AS MATERIALIZED (SELECT * REPLACE (CASE WHEN kept IS NULL THEN NULL
      |  ELSE ${sqlDpStep("kept", "q")} END AS kept) FROM dp1),
      |dp3 AS MATERIALIZED (SELECT * REPLACE (CASE WHEN kept IS NULL THEN NULL
      |  ELSE ${sqlDpStep("kept", "q")} END AS kept) FROM dp2),
      |dp4 AS MATERIALIZED (SELECT * REPLACE (CASE WHEN kept IS NULL THEN NULL
      |  ELSE ${sqlDpStep("kept", "q")} END AS kept) FROM dp3),
      |simplified AS MATERIALIZED (
      |  SELECT layer, fid, gtype, z, tx, ty, buf,
      |    CASE
      |      WHEN kept IS NULL THEN q
      |      WHEN gtype = 3 AND len(kept) < 3 THEN [
      |        struct_pack(x := xmn, y := ymn),
      |        struct_pack(x := GREATEST(xmx, xmn + 1), y := ymn),
      |        struct_pack(x := GREATEST(xmx, xmn + 1),
      |                    y := GREATEST(ymx, ymn + 1)),
      |        struct_pack(x := xmn, y := GREATEST(ymx, ymn + 1))]
      |      ELSE list_transform(kept, i -> q[i + 1])
      |    END AS sq
      |  FROM (SELECT *,
      |    list_aggregate(list_transform(q, p -> p.x), 'min') AS xmn,
      |    list_aggregate(list_transform(q, p -> p.x), 'max') AS xmx,
      |    list_aggregate(list_transform(q, p -> p.y), 'min') AS ymn,
      |    list_aggregate(list_transform(q, p -> p.y), 'max') AS ymx
      |   FROM dp4)),
      |pts_point AS (
      |  SELECT layer, fid, z, tx, ty, 1 AS part_id, 1 AS ord,
      |    sq[1].x AS px, sq[1].y AS py
      |  FROM simplified
      |  WHERE gtype = 1 AND sq[1].x >= -buf AND sq[1].x <= 4096 + buf
      |    AND sq[1].y >= -buf AND sq[1].y <= 4096 + buf),
      |segs AS MATERIALIZED (
      |  SELECT layer, fid, z, tx, ty, buf, si,
      |    sq[si].x AS x1, sq[si].y AS y1,
      |    sq[si + 1].x AS x2, sq[si + 1].y AS y2,
      |    CAST(sq[si + 1].x - sq[si].x AS DOUBLE) AS dx,
      |    CAST(sq[si + 1].y - sq[si].y AS DOUBLE) AS dy
      |  FROM simplified, unnest(range(1, len(sq))) AS us(si)
      |  WHERE gtype = 2),
      |segt AS MATERIALIZED (
      |  SELECT *,
      |    GREATEST(0.0,
      |      CASE WHEN dx > 0 THEN ($lo - x1) / dx
      |           WHEN dx < 0 THEN ($hi - x1) / dx ELSE 0.0 END,
      |      CASE WHEN dy > 0 THEN ($lo - y1) / dy
      |           WHEN dy < 0 THEN ($hi - y1) / dy ELSE 0.0 END) AS t0,
      |    LEAST(1.0,
      |      CASE WHEN dx > 0 THEN ($hi - x1) / dx
      |           WHEN dx < 0 THEN ($lo - x1) / dx ELSE 1.0 END,
      |      CASE WHEN dy > 0 THEN ($hi - y1) / dy
      |           WHEN dy < 0 THEN ($lo - y1) / dy ELSE 1.0 END) AS t1
      |  FROM segs
      |  WHERE NOT (dx = 0 AND (x1 < $lo OR x1 > $hi))
      |    AND NOT (dy = 0 AND (y1 < $lo OR y1 > $hi))),
      |segkeep AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT *,
      |      CAST(floor(x1 + t0 * dx + 0.5) AS BIGINT) AS axp,
      |      CAST(floor(y1 + t0 * dy + 0.5) AS BIGINT) AS ayp,
      |      CAST(floor(x1 + t1 * dx + 0.5) AS BIGINT) AS bxp,
      |      CAST(floor(y1 + t1 * dy + 0.5) AS BIGINT) AS byp
      |    FROM segt WHERE t0 <= t1)
      |  WHERE NOT (axp = bxp AND ayp = byp)),
      |segparts AS MATERIALIZED (
      |  SELECT *, sum(newpart) OVER (PARTITION BY layer, fid, z, tx, ty
      |      ORDER BY si ROWS UNBOUNDED PRECEDING) AS part_id
      |  FROM (
      |    SELECT *, CASE WHEN lag(si) OVER w IS NULL THEN 1
      |      WHEN si != lag(si) OVER w + 1 THEN 1
      |      WHEN NOT (lag(t1) OVER w = 1.0 AND t0 = 0.0) THEN 1
      |      ELSE 0 END AS newpart,
      |      CASE WHEN lag(si) OVER w IS NULL THEN 1
      |        WHEN si != lag(si) OVER w + 1 THEN 1
      |        WHEN NOT (lag(t1) OVER w = 1.0 AND t0 = 0.0) THEN 1
      |        ELSE 0 END AS is_first
      |    FROM segkeep
      |    WINDOW w AS (PARTITION BY layer, fid, z, tx, ty ORDER BY si))),
      |pts_line AS (
      |  SELECT layer, fid, z, tx, ty, part_id, si * 2 + pi AS ord,
      |    CASE WHEN pi = 0 THEN axp ELSE bxp END AS px,
      |    CASE WHEN pi = 0 THEN ayp ELSE byp END AS py
      |  FROM segparts, unnest([0, 1]) AS up(pi)
      |  WHERE pi = 1 OR is_first = 1),
      |ring0 AS MATERIALIZED (
      |  SELECT layer, fid, z, tx, ty, buf,
      |    list_transform(sq, p -> struct_pack(
      |      x := CAST(p.x AS DOUBLE), y := CAST(p.y AS DOUBLE))) AS r
      |  FROM simplified WHERE gtype = 3),
      |ring1 AS MATERIALIZED (SELECT * REPLACE (
      |  ${sqlShPass("r", axisX = true, keepGe = true, "$$LO$$")} AS r)
      |  FROM ring0),
      |ring2 AS MATERIALIZED (SELECT * REPLACE (
      |  ${sqlShPass("r", axisX = true, keepGe = false, "$$HI$$")} AS r)
      |  FROM ring1),
      |ring3 AS MATERIALIZED (SELECT * REPLACE (
      |  ${sqlShPass("r", axisX = false, keepGe = true, "$$LO$$")} AS r)
      |  FROM ring2),
      |ring4 AS MATERIALIZED (SELECT * REPLACE (
      |  ${sqlShPass("r", axisX = false, keepGe = false, "$$HI$$")} AS r)
      |  FROM ring3),
      |ringdd AS MATERIALIZED (
      |  SELECT layer, fid, z, tx, ty,
      |    CASE WHEN len(dd) > 1 AND dd[1] = dd[len(dd)]
      |      THEN list_slice(dd, 1, len(dd) - 1) ELSE dd END AS ring
      |  FROM (
      |    SELECT *, list_filter(
      |      list_transform(range(1, len(rr) + 1), i ->
      |        CASE WHEN i = 1 OR rr[i] != rr[i - 1]
      |          THEN rr[i] ELSE NULL END),
      |      p -> p IS NOT NULL) AS dd
      |    FROM (SELECT *, list_transform(r, p -> struct_pack(
      |        x := CAST(floor(p.x + 0.5) AS BIGINT),
      |        y := CAST(floor(p.y + 0.5) AS BIGINT))) AS rr
      |      FROM ring4))),
      |ringr AS MATERIALIZED (
      |  SELECT layer, fid, z, tx, ty,
      |    CASE WHEN area2 < 0 THEN list_reverse(ring) ELSE ring END AS ring
      |  FROM (
      |    SELECT *, list_sum(list_transform(range(1, len(ring) + 1), i ->
      |      ring[i].x
      |        * ring[CASE WHEN i = len(ring) THEN 1 ELSE i + 1 END].y
      |      - ring[CASE WHEN i = len(ring) THEN 1 ELSE i + 1 END].x
      |        * ring[i].y)) AS area2
      |    FROM ringdd)),
      |pts_ring AS (
      |  SELECT layer, fid, z, tx, ty, 1 AS part_id, i AS ord,
      |    ring[i].x AS px, ring[i].y AS py
      |  FROM ringr, unnest(range(1, len(ring) + 1)) AS ui(i)
      |  WHERE len(ring) >= 3),
      |final_pts AS MATERIALIZED (
      |  SELECT * FROM pts_point
      |  UNION ALL SELECT * FROM pts_line
      |  UNION ALL SELECT * FROM pts_ring),
      |per_feat AS (
      |  SELECT layer, fid, z, tx, ty,
      |    CAST(max(part_id) AS BIGINT) AS n_parts,
      |    count(*) AS n_pts,
      |    sum(rn * (px * 8191 + py)) AS chk
      |  FROM (SELECT *, CAST(row_number()
      |      OVER (PARTITION BY layer, fid, z, tx, ty
      |            ORDER BY part_id, ord) AS BIGINT) AS rn
      |    FROM final_pts)
      |  GROUP BY 1, 2, 3, 4, 5),
      |tile_stats AS (
      |  SELECT CAST(z AS INT) AS zoom, tx AS tile_x, ty AS tile_y, layer,
      |    CAST(count(*) AS BIGINT) AS n_features,
      |    CAST(sum(n_parts) AS BIGINT) AS n_parts,
      |    CAST(sum(n_pts) AS BIGINT) AS n_points,
      |    CAST(sum(chk) AS BIGINT) AS coord_checksum
      |  FROM per_feat GROUP BY 1, 2, 3, 4)"""
      .stripMargin
      .replace("$$LO$$", "CAST(-buf AS DOUBLE)")
      .replace("$$HI$$", "CAST(4096 + buf AS DOUBLE)")
  }

  private val oracleStatsSelect: String =
    """SELECT zoom, tile_x, tile_y, layer, n_features, n_parts,
      |  n_points, coord_checksum
      |FROM tile_stats
      |ORDER BY zoom, tile_x, tile_y, layer""".stripMargin

  // ========================= Spark pipeline ===============================

  /** 2^MaxZoom — the world-pixel scale every zoom derives from. */
  private val S15 = (1L << MaxZoom).toDouble

  /** World-pixel augmentation: (…, wpts, bxlo, bxhi, bylo, byhi, buf)
    * where `wpts` are world-pixel coordinates at MaxZoom.
    *
    * The Web-Mercator trig (sin/ln per coordinate) is hoisted ABOVE
    * the zoom × tile explosion: world pixels are computed ONCE per
    * point at z = MaxZoom, and every other zoom derives by arithmetic
    * shift. This is bit-exact with the oracle's per-zoom
    * `floor(w * 2^z)` because (a) scaling a double by a power of two
    * only changes the exponent — `w * 2^15` and `w * 2^z` are the
    * same real number scaled exactly — and (b) for any real y and
    * integer k ≥ 0, `floor(floor(y) / 2^k) = floor(y / 2^k)`, and an
    * arithmetic right shift IS floor division by 2^k (including for
    * the slightly-negative world pixels of features overshooting
    * lon ±180). So `shiftright(floor(w·2^15), 15-z) = floor(w·2^z)`
    * exactly, and the DuckDB oracle keeps its direct per-zoom formula.
    */
  private def withWorldCols(feats: DataFrame): DataFrame = {
    def w15(c: Column, isX: Boolean): Column =
      floor((if (isX) xWorld(c) else yWorld(c)) * S15).cast("long")
    feats
      .withColumn("wpts", transform(col("pts"), p => struct(
        w15(p("lon"), isX = true).as("wx"),
        w15(p("lat"), isX = false).as("wy"))))
      // bbox world pixels at MaxZoom, from the raw lon/lat extremes
      // (exactly the oracle's feat_rng arguments, hoisted pre-explode)
      .withColumn("bxlo",
        w15(array_min(transform(col("pts"), _("lon"))), isX = true))
      .withColumn("bxhi",
        w15(array_max(transform(col("pts"), _("lon"))), isX = true))
      // mercator y grows southward: ty range comes from latmax..latmin
      .withColumn("bylo",
        w15(array_max(transform(col("pts"), _("lat"))), isX = false))
      .withColumn("byhi",
        w15(array_min(transform(col("pts"), _("lat"))), isX = false))
      .drop("pts")
      .withColumn("buf", bufferOf(col("layer")))
  }

  /** World-augmented, fanned-out, checkpointed features — the shared
    * base both zoom branches explode from.
    *
    * Lazy checkpoint: the cap splits the pipeline into a z<=8 and a
    * z>=9 branch, and without a barrier each branch would recompute
    * the feature synthesis (runs dedup shuffle + fanout repartition)
    * AND the per-point trig. Feature rows are small (one per feature,
    * pre-explosion), so materializing them once — world pixels
    * included — is far cheaper than twice the lineage.
    * Known tradeoff (same as the engine's other localCheckpoint
    * barriers): blocks are executor-local and unreplicated, so on a
    * real cluster an executor loss fails the job instead of
    * recomputing — acceptable for a rerunnable batch tile build. For
    * SLA-bound runs set `spark.graft.tiles.reliableCheckpoint=true`:
    * the barrier then writes to the fault-tolerant checkpoint
    * directory (spark.sparkContext.setCheckpointDir — HDFS/object
    * store on a cluster; a temp dir is provisioned when unset so the
    * flag works out of the box locally) and survives executor loss
    * at the cost of one distributed write of the feature rows.
    */
  private def worldFeatures(s: SparkSession, d: String): DataFrame = {
    val fw = graft.Tables.fanout(withWorldCols(features(s, d)))
    if (s.conf.get(ReliableCheckpointKey, "false").toBoolean) {
      if (s.sparkContext.getCheckpointDir.isEmpty)
        s.sparkContext.setCheckpointDir(
          graft.TempDirs.scoped("graft_tiles_ckpt_").toString)
      fw.checkpoint(false)
    } else fw.localCheckpoint(false)
  }

  /** Opt-in fault-tolerant barrier for the tile build (see
    * [[worldFeatures]]).
    */
  val ReliableCheckpointKey = "spark.graft.tiles.reliableCheckpoint"

  /** Opt-in gzip of `tile_data` in the .mbtiles container — what
    * tippecanoe emits by default and tile servers pass through as
    * `Content-Encoding: gzip`. Compression runs distributed (a
    * per-tile column transform) before the single-file sink's
    * collect; readers sniff the 1f 8b member magic, per ecosystem
    * convention (the MBTiles spec carries no compression flag).
    */
  val GzipKey = "spark.graft.tiles.gzip"

  /** Tile fan-out from any features-shaped frame (layer, fid, gtype,
    * minz, pts, pk, pv) — the streaming tile-refresh's entry point
    * (single-layer micro-batch slices, full zoom range).
    */
  private[graft] def tilesOf(feats: DataFrame): DataFrame =
    tileRange(withWorldCols(feats), 0, MaxZoom)

  /** The zoom × tile explosion over [zlo, zhi] only — the cap's two
    * branches each explode JUST their own zoom slice from the shared
    * checkpointed base instead of exploding the full range twice and
    * filtering (the z9+ slice is ~98% of the fan-out; walking it a
    * second time for the low-zoom branch doubled the explosion cost).
    * Pure narrow expressions — explodes, no shuffle.
    */
  private def tileRange(fw: DataFrame, zlo: Int, zhi: Int): DataFrame = {
    val wmaxSql = "shiftleft(CAST(1 AS BIGINT), z) * 4096 - 1"
    fw
      .filter(col("minz") <= zhi)
      .withColumn("z",
        explode(sequence(greatest(col("minz"), lit(zlo)), lit(zhi))))
      .withColumn("txlo",
        expr(s"GREATEST(shiftright(bxlo, $MaxZoom - z) - buf," +
          " CAST(0 AS BIGINT)) DIV 4096"))
      .withColumn("txhi",
        expr(s"LEAST(shiftright(bxhi, $MaxZoom - z) + buf, $wmaxSql)" +
          " DIV 4096"))
      .withColumn("tylo",
        expr(s"GREATEST(shiftright(bylo, $MaxZoom - z) - buf," +
          " CAST(0 AS BIGINT)) DIV 4096"))
      .withColumn("tyhi",
        expr(s"LEAST(shiftright(byhi, $MaxZoom - z) + buf, $wmaxSql)" +
          " DIV 4096"))
      // a feature entirely beyond the clamped world (lon past ±180 —
      // synthesized runs can overshoot by a few millidegrees) inverts
      // its range; Spark's sequence() would walk it DESCENDING and
      // fabricate an out-of-world tile, where DuckDB's generate_series
      // is empty — filter explicitly so both engines drop it (the
      // documented no-antimeridian-wrap divergence)
      .filter(col("txlo") <= col("txhi") && col("tylo") <= col("tyhi"))
      .withColumn("tx", explode(sequence(col("txlo"), col("txhi"))))
      .withColumn("ty", explode(sequence(col("tylo"), col("tyhi"))))
      .select(col("layer"), col("fid"), col("gtype"), col("z"),
        col("tx"), col("ty"), col("buf"), col("wpts"), col("pk"), col("pv"))
  }

  /** Deterministic drop-densest cap: per (z, tx, ty, layer) keep the
    * K(z) features with the smallest stable hash rank. Two-level
    * top-K — row_number within 64 hash salts first, then within the
    * tile — so the selection is identical to a single global top-K
    * (each salt keeps a superset of its global-survivor slice) while
    * the first window bounds any single task at K·64 rows. Applies
    * only to the z≤8 slice; z9+ passes through untouched (geographic
    * sharding bounds those groups).
    */
  private def capped(s: SparkSession, d: String): DataFrame = {
    val fw = worldFeatures(s, d)
    val kcap = when(col("z") <= 4, lit(CapLowZ)).otherwise(lit(CapMidZ))
    val rh = pmod(pmod(col("fid"), lit(1000000007L)) * 2654435761L,
      lit(1000000007L))
    val low = tileRange(fw, 0, 8)
      .withColumn("rh", rh)
      .withColumn("salt",
        pmod(graft.functions.HashFunctions.hash32(col("fid")), lit(64)))
      .withColumn("r1", row_number().over(
        Window.partitionBy("z", "tx", "ty", "layer", "salt")
          .orderBy("rh", "fid")))
      .filter(col("r1") <= kcap)
      .withColumn("r2", row_number().over(
        Window.partitionBy("z", "tx", "ty", "layer").orderBy("rh", "fid")))
      .filter(col("r2") <= kcap)
      .drop("rh", "salt", "r1", "r2")
    low.unionByName(tileRange(fw, 9, MaxZoom))
  }

  /** Profiler hook: the capped fan-out without the prep kernel. */
  private[operators] def cappedForProfile(s: SparkSession,
      d: String): DataFrame = capped(s, d)

  /** Tile-assigned, capped, quantized, simplified, clipped features:
    * (layer, fid, gtype, z, tx, ty, geom, n_parts, n_points, chk,
    * pk, pv) where `geom` is the feature's FINAL packed MVT geometry
    * command bytes and (n_parts, n_points, chk) its pre-computed
    * stats — one fused kernel walk per row (MvtPrepKernel.prepEncoded)
    * feeds both the stats rollup and the byte path, and the
    * per-point data never crosses an exchange as nested arrays.
    */
  private[graft] def prepped(s: SparkSession, d: String): DataFrame =
    prepOf(capped(s, d))

  /** Quantize + simplify + clip + encode any tile-fan-out-shaped
    * frame (shared with the streaming tile-refresh).
    *
    * The kernel is consumed through `explode` of its 0-or-1-element
    * array output, NOT a `.filter(enc.n_parts > 0)`: a predicate on a
    * projected struct field gets pushed back through the Project and
    * Catalyst inlines the whole kernel a second time beside it (the
    * round-14 plan evaluated `mvtprepexpr` in BOTH the Filter and the
    * Project of the same stage — a 2× walk of every surviving
    * feature). A `Generate` evaluates its generator exactly once per
    * input row, the empty array IS the dropped-feature row drop, and
    * the downstream field extraction reads the Generate's output
    * attribute, so exactly one kernel walk survives in the settled
    * plan (pinned by PlanPinSpec).
    */
  private[graft] def prepOf(tiles: DataFrame): DataFrame = {
    // quantization (shift from the MaxZoom world pixels — bit-exact
    // with the oracle's floor(w * 2^z); see tilesOf) happens INSIDE
    // the fused kernel walk: wpts pass through untouched and no
    // interpreted transform materializes a per-row qpts array
    val simp = when(col("layer") === "skiareas", lit(true))
      .otherwise(col("z") < MaxZoom)
    tiles
      .select(col("layer"), col("fid"), col("gtype"), col("z"),
        col("tx"), col("ty"), col("pk"), col("pv"),
        explode(MvtPrepExpr.mvtPrep(col("gtype"), col("wpts"), simp,
          struct(col("buf"),
            (lit(MaxZoom) - col("z")).cast("int").as("shift"),
            col("tx"), col("ty")), SimplifyTol)).as("enc"))
      .select(col("layer"), col("fid"), col("gtype"), col("z"),
        col("tx"), col("ty"), col("enc.geom").as("geom"),
        col("enc.n_parts").as("n_parts"),
        col("enc.n_points").as("n_points"), col("enc.chk").as("chk"),
        col("pk"), col("pv"))
  }

  // ---- per-tile/zoom/layer stats (the DuckDB-oracled row) ----------------
  // Per-feature stats (n_parts, n_points, order-weighted checksum)
  // arrive pre-computed from the fused prep kernel, so the only work
  // left is the (z, tx, ty, layer) rollup — map-side combinable,
  // BIGINT, hash-exact across engines.
  private val qStats = QuerySpec.of(
    "q_tiles_mvt", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatPtsCtes,
        |$oraclePrepCtes
        |$oracleStatsSelect""".stripMargin
    }) { (s, d) =>
    statsOf(prepped(s, d))
  }

  /** (zoom, tile_x, tile_y, layer, n_features, n_parts, n_points,
    * coord_checksum) rollup from the prepped frame's fused columns.
    */
  private def statsOf(prep: DataFrame): DataFrame =
    prep
      .groupBy(col("z").cast("int").as("zoom"), col("tx").as("tile_x"),
        col("ty").as("tile_y"), col("layer"))
      .agg(count(lit(1)).as("n_features"),
        sum("n_parts").as("n_parts"),
        sum("n_points").as("n_points"),
        sum("chk").as("coord_checksum"))
      .orderBy("zoom", "tile_x", "tile_y", "layer")

  // ---- encoded tile blobs -------------------------------------------------
  // The full MVT surface: ONE wide exchange on (z, tx, ty) collects a
  // tile's features across all layers, sorted by (layer, fid) so the
  // bytes are shuffle-order independent, and the kernel emits the
  // whole multi-layer tile in a single call — no second shuffle of
  // per-layer frames. Group sizes are bounded by the density cap at
  // low zooms and geographic sharding at z9+.
  def tileBytes(s: SparkSession, d: String): DataFrame =
    if (streamEncode(s)) encodeOfStreamed(prepped(s, d))
    else encodeOf(prepped(s, d))

  /** Per-tile collect + whole-tile protobuf encode of any prepped
    * frame (shared with the streaming tile-refresh). With
    * `keepStats` the collected struct carries the prep kernel's
    * per-feature stats as three trailing bigints (the encoder sums
    * them inside its walk — see MvtTileEncodeExpr's shape
    * measurements) and the projection keeps the per-tile stat sums
    * instead of the tile bytes; the default keeps the bytes (the
    * blob / decode-gate shape, 6-field struct). Either way the
    * encoder runs exactly once per tile.
    */
  private[graft] def encodeOf(prep: DataFrame,
      keepStats: Boolean = false): DataFrame = {
    val featFields =
      Seq(col("layer"), col("fid"), col("gtype"), col("geom"),
        col("pk").as("pkeys"), col("pv").as("pvals")) ++
        (if (keepStats)
          Seq(col("n_parts"), col("n_points"), col("chk"))
        else Nil)
    val enc = prep
      .select(col("z"), col("tx"), col("ty"),
        struct(featFields: _*).as("feat"))
      .groupBy("z", "tx", "ty")
      .agg(sort_array(collect_list(col("feat"))).as("feats"))
      .select(col("z").cast("int").as("zoom"), col("tx").as("tile_x"),
        col("ty").as("tile_y"),
        graft.functions.MvtTileEncodeExpr.mvtTile(col("feats")).as("enc"))
    if (keepStats)
      enc.select(col("zoom"), col("tile_x"), col("tile_y"),
        col("enc.n_layers").as("n_layers"),
        col("enc.n_features").as("n_features"),
        col("enc.n_parts").as("n_parts"),
        col("enc.n_points").as("n_points"),
        col("enc.chk").as("coord_checksum"))
    else
      enc.select(col("zoom"), col("tile_x"), col("tile_y"),
        col("enc.n_layers").as("n_layers"), col("enc.tile").as("tile"))
  }

  /** Sorted-stream variant of [[encodeOf]]: same prep input, same
    * output columns, bytes identical by construction (the exec frames
    * features through the SAME MvtKernel.LayerStream the aggregate
    * path uses) — but the per-tile collect_list aggregation is
    * replaced by one hash exchange on (z, tx, ty) + a spillable local
    * sort + a streaming walk ([[graft.plans.TileStreamEncodeExec]]).
    * Memory per task is O(one tile's bytes) instead of O(densest
    * tile's collected array). Built for the round-18 A/B against the
    * aggregate shape (VERDICT r17 #5); whichever measures faster at
    * sf1 owns the serving-path headline.
    */
  private[graft] def encodeOfStreamed(prep: DataFrame,
      keepStats: Boolean = false): DataFrame = {
    val spark = prep.sparkSession
    graft.GraftExtensions.registerPlanning(spark)
    val flat = prep.select(
      col("z").cast("long").as("z"), col("tx"), col("ty"), col("layer"),
      col("fid"), col("gtype"), col("geom"), col("pk"), col("pv"),
      col("n_parts"), col("n_points"), col("chk"))
    val analyzed = flat.queryExecution.analyzed
    val enc = org.apache.spark.sql.graftshim.SqlBridge.ofRows(spark,
      graft.plans.TileStreamEncodePlan(analyzed, analyzed.output))
    if (keepStats)
      enc.select(col("zoom"), col("tile_x"), col("tile_y"),
        col("n_layers"), col("n_features"),
        col("n_parts"), col("n_points"), col("chk").as("coord_checksum"))
    else
      enc.select(col("zoom"), col("tile_x"), col("tile_y"),
        col("n_layers"), col("tile"))
  }

  /** [[encodeStatsOf]]'s projection over the streamed shape — the A/B
    * counterpart of the serving-path headline query.
    */
  private[graft] def encodeStatsOfStreamed(prep: DataFrame): DataFrame =
    encodeOfStreamed(prep, keepStats = true)
      .select(col("zoom"), col("tile_x"), col("tile_y"),
        col("n_layers").cast("long").as("n_layers"),
        col("n_features").cast("long").as("n_features"),
        col("n_parts"), col("n_points"), col("coord_checksum"))
      .orderBy("zoom", "tile_x", "tile_y")

  /** Decode tile blobs (zoom, tile_x, tile_y, tile) back to the
    * oracled per-layer stats columns (shared by `q_tiles_mvt_bytes`
    * and the streaming tile-refresh's final readout).
    */
  private[graft] def decodedStats(tiles: DataFrame): DataFrame = {
    tiles
      .select(col("zoom"), col("tile_x"), col("tile_y"),
        explode(graft.functions.MvtDecodeExpr.mvtDecode(col("tile")))
          .as("lstat"))
      .select(col("zoom"), col("tile_x"), col("tile_y"),
        col("lstat.layer").as("layer"),
        col("lstat.n_features").as("n_features"),
        col("lstat.n_parts").as("n_parts"),
        col("lstat.n_points").as("n_points"),
        col("lstat.coord_checksum").as("coord_checksum"))
      .orderBy("zoom", "tile_x", "tile_y", "layer")
  }

  // The decode-round-trip gate: the engine's own protobuf tile bytes,
  // decoded back to per-layer stats by MvtDecodeExpr, must hash-match
  // the SAME relational oracle as q_tiles_mvt — so the byte encoding
  // itself sits under the driver's DuckDB gate, not only under
  // MvtTilesSpec's structural checks. No longer the bench headline
  // (q_tiles_mvt_encode is — the decode here is gate-only cost);
  // still a first-class correctness query.
  private val qBytes = QuerySpec.of(
    "q_tiles_mvt_bytes", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatPtsCtes,
        |$oraclePrepCtes
        |$oracleStatsSelect""".stripMargin
    }) { (s, d) =>
    decodedStats(tileBytes(s, d))
  }

  // The SERVING-PATH figure (VERDICT r16 #3): same prep → cap → clip →
  // collect → whole-tile protobuf encode as q_tiles_mvt_bytes, but
  // WITHOUT the decode round-trip — MvtDecodeExpr re-decoding the
  // engine's own bytes is pure correctness-gate cost (~⅓ of the sf1
  // MVT solo figure, SCALING.md) that production tile serving never
  // pays. The encode stays load-bearing under the oracle through
  // `n_layers`, which only the encoder's layer-run walk produces; the
  // per-tile feature/part/point/checksum stats ride the SAME
  // aggregation that collects the features, so nothing is computed
  // twice. This is the bench headline; q_tiles_mvt_bytes (decode
  // round-trip, hash-equal to the same oracle) stays the gate.
  private val qEncode = QuerySpec.of(
    "q_tiles_mvt_encode", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatPtsCtes,
        |$oraclePrepCtes
        |SELECT zoom, tile_x, tile_y,
        |  CAST(count(*) AS BIGINT) AS n_layers,
        |  CAST(sum(n_features) AS BIGINT) AS n_features,
        |  CAST(sum(n_parts) AS BIGINT) AS n_parts,
        |  CAST(sum(n_points) AS BIGINT) AS n_points,
        |  CAST(sum(coord_checksum) AS BIGINT) AS coord_checksum
        |FROM tile_stats GROUP BY zoom, tile_x, tile_y
        |ORDER BY zoom, tile_x, tile_y""".stripMargin
    },
    headline = true) { (s, d) =>
    encodeStatsOf(prepped(s, d))
  }

  /** Per-tile encode + stats in ONE exchange with a collect-only
    * aggregation — the blob path's aggregation shape plus three
    * trailing bigints on the collected struct, which the encoder sums
    * inside the walk it already does. The fastest of three measured
    * shapes at sf1 (see MvtTileEncodeExpr): stat sums as agg
    * functions riding the ObjectHashAggregate cost ~5 s/run, a
    * varint re-walk of the packed geom inside the kernel ~3 s, the
    * trailing-bigint carry ~2 s. The trailing fields can't disturb
    * byte determinism: sort_array order is already decided by the
    * leading (layer, fid). The tile bytes are dropped by the final
    * projection instead of being re-decoded — byte-groundedness is
    * the decode GATE's job (q_tiles_mvt_bytes hash-matches the same
    * oracle through a full protobuf re-parse); this query is the
    * serving-path figure.
    */
  private[graft] def encodeStatsOf(prep: DataFrame): DataFrame =
    if (streamEncode(prep.sparkSession)) encodeStatsOfStreamed(prep)
    else encodeStatsOfAggregate(prep)

  /** The collect_list-aggregate serving-path shape, exposed by name so
    * the A/B specs can pin agg-vs-stream equality regardless of which
    * shape owns the default (round 18 flipped it to the stream exec).
    * Still production-load-bearing: the streaming tile-refresh and the
    * scale probes call [[encodeOf]] directly.
    */
  private[graft] def encodeStatsOfAggregate(prep: DataFrame): DataFrame =
    encodeOf(prep, keepStats = true)
      .select(col("zoom"), col("tile_x"), col("tile_y"),
        col("n_layers").cast("long").as("n_layers"),
        col("n_features").cast("long").as("n_features"),
        col("n_parts"), col("n_points"), col("coord_checksum"))
      .orderBy("zoom", "tile_x", "tile_y")

  /** A/B switch for the serving-path encode shape (VERDICT r17 #5):
    * `spark.graft.tiles.streamEncode` (or env
    * SPARK_GRAFT_TILE_ENCODE=stream|agg) flips the headline query
    * between the collect_list aggregate shape and the sorted-stream
    * exec. The two are bit-identical (MvtStreamEncodeSpec). The
    * DEFAULT is the sorted-stream exec — the round-18 matched
    * fresh-JVM solos at sf1 read stream 16.8-20.1 s (median 17.7)
    * against aggregate 19.7-64.1 s (quiet-band medians 21.7-31.2,
    * with 2-3× GC/spill outlier samples at zero external load); the
    * stream shape is both faster and far lower-variance because no
    * per-tile array ever materializes — see SCALING.md round-18.
    */
  private def streamEncode(s: SparkSession): Boolean =
    s.conf.get("spark.graft.tiles.streamEncode",
      if (sys.env.get("SPARK_GRAFT_TILE_ENCODE").contains("agg")) "false"
      else "true").toBoolean

  // Incremental maintenance gate: the streaming tile-refresh
  // (graft.streaming.TilesStreaming) must equal the batch rebuild of
  // the spots layer bit-for-bit, so its oracle is the SAME relational
  // tile-stats replay filtered to that layer.
  private val qStreamRefresh = QuerySpec.of(
    "q_stream_tiles_refresh", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatPtsCtes,
        |$oraclePrepCtes
        |SELECT zoom, tile_x, tile_y, layer, n_features, n_parts,
        |  n_points, coord_checksum
        |FROM tile_stats WHERE layer = 'spots'
        |ORDER BY zoom, tile_x, tile_y, layer""".stripMargin
    }) { (s, d) =>
    graft.streaming.TilesStreaming.refreshViaStream(s, d)
  }

  // ---- the .mbtiles FILE itself (from-scratch SQLite container) ----------
  // tippecanoe's output artifact, now emitted in-engine end to end:
  // protobuf tiles (above) packed into the standard MBTiles SQLite
  // layout — `tiles(zoom_level, tile_column, tile_row, tile_data)`
  // with TMS row flipping, plus the `metadata` name/value table.
  // Validated by Python's stdlib sqlite3 in MbtilesSpec.
  def writeMbtilesFile(s: SparkSession, d: String,
      path: java.nio.file.Path): Seq[(String, Int, Long)] =
    writeMbtilesOf(s, tileBytes(s, d), path)

  /** Container write of any encoded-tiles frame (zoom, tile_x, tile_y,
    * …, tile) — the soak probe feeds a generated decade-up workload
    * through the same streaming sink the production path uses.
    * `barrier = false` skips the checkpoint when the caller already
    * materialized the frame (the soak probe, to isolate the SINK's
    * heap footprint from the build's).
    */
  private[graft] def writeMbtilesOf(s: SparkSession,
      built: org.apache.spark.sql.DataFrame,
      path: java.nio.file.Path,
      barrier: Boolean = true): Seq[(String, Int, Long)] = {
    import graft.sources.SqliteFile
    val encoded =
      if (s.conf.get(GzipKey, "false").toBoolean)
        built.withColumn("tile",
          graft.functions.GzipExpr.gzip(col("tile")))
      else built
    // same barrier policy as the tile build: local blocks by default,
    // the reliable checkpoint dir under the opt-in flag
    val tiles =
      if (!barrier) encoded
      else if (s.conf.get(ReliableCheckpointKey, "false").toBoolean) {
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(
            graft.TempDirs.scoped("graft_tiles_ckpt_").toString)
        encoded.checkpoint(false)
      } else encoded.localCheckpoint(false)
    // metadata needs the zoom extremes — a tiny pre-aggregate, not a
    // scan of collected rows
    val zrow = tiles.agg(min("zoom"), max("zoom")).head()
    val (zmin, zmax) =
      if (zrow.isNullAt(0)) (0, 0) else (zrow.getInt(0), zrow.getInt(1))
    val meta = SqliteFile.Table(
      "metadata", "CREATE TABLE metadata (name TEXT, value TEXT)",
      Iterator(
        Seq("name", "graft"),
        Seq("format", "pbf"),
        Seq("minzoom", zmin.toString),
        Seq("maxzoom", zmax.toString),
        Seq("bounds", "-180.0,-85.0511,180.0,85.0511")))
    // toLocalIterator streams one partition at a time into the
    // single-file sink — the driver never holds the tile set (a
    // planet-scale .mbtiles is 50-100 GB); same pattern as the
    // GeoJSON FeatureCollection sink (sources/GeoJson.scala)
    val sorted = tiles
      .orderBy("zoom", "tile_x", "tile_y")
      .select(col("zoom"), col("tile_x"), col("tile_y"), col("tile"))
      .toLocalIterator()
    val tbl = SqliteFile.Table(
      "tiles",
      "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, " +
        "tile_row INTEGER, tile_data BLOB)",
      new Iterator[Seq[Any]] {
        override def hasNext: Boolean = sorted.hasNext
        override def next(): Seq[Any] = {
          val r = sorted.next()
          val z = r.getInt(0)
          Seq(z.toLong, r.getLong(1),
            (1L << z) - 1L - r.getLong(2), // TMS row flip
            r.getAs[Array[Byte]](3))
        }
      })
    SqliteFile.write(path, Seq(meta, tbl), applicationId = 0x4d504258)
  }

  // Driver gate: per-zoom rollup of the tile GRID that went into the
  // container (tile count, column sum, TMS row sum) — recomputed
  // relationally from the distinct tile keys of the same oracle CTEs.
  // File validity + blob round-trip are proved by MbtilesSpec's
  // independent reader.
  private val qMbtiles = QuerySpec.of(
    "q_mbtiles_file", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatPtsCtes,
        |$oraclePrepCtes,
        |tkeys AS (SELECT DISTINCT zoom, tile_x, tile_y FROM tile_stats)
        |SELECT zoom, CAST(count(*) AS BIGINT) AS n_tiles,
        |  CAST(sum(tile_x) AS BIGINT) AS col_sum,
        |  CAST(sum((1::BIGINT << zoom) - 1 - tile_y) AS BIGINT) AS row_sum
        |FROM tkeys GROUP BY zoom ORDER BY zoom""".stripMargin
    }) { (s, d) =>
    val dir = graft.TempDirs.scoped("graft_mbtiles_")
    val path = dir.resolve("out.mbtiles")
    writeMbtilesFile(s, d, path)
    // roll up from the CONTAINER BYTES read back with the from-scratch
    // reader — the driver hash gate then covers the page/record
    // encoding of the tiles table, not just the tile pipeline
    val db = graft.sources.SqliteReader.open(path)
    val agg = scala.collection.mutable.SortedMap[Int, (Long, Long, Long)]()
    db.table("tiles").foreach { case (_, vs) =>
      val z = vs(0).asInstanceOf[Long].toInt
      val (n, cs, rs) = agg.getOrElse(z, (0L, 0L, 0L))
      agg(z) = (n + 1, cs + vs(1).asInstanceOf[Long],
        rs + vs(2).asInstanceOf[Long])
    }
    import s.implicits._
    agg.toSeq.map { case (z, (n, cs, rs)) => (z, n, cs, rs) }
      .toDF("zoom", "n_tiles", "col_sum", "row_sum")
      .orderBy("zoom")
  }

  // ---- tile-DIRECTORY extraction (extract_tiles.ts parity) ---------------

  /** `tile-join --output-to-directory` parity (ref
    * `/root/reference/src/scripts/extract_tiles.ts:11-16`): unpack an
    * .mbtiles into the static `{z}/{x}/{y}.pbf` file layout a tile CDN
    * serves, XYZ scheme (the container's TMS rows un-flipped back).
    * Distributed, no driver materialization: the tiles b-tree splits
    * at its root's child pages and each executor task walks ONE
    * subtree of the memory-mapped container (faulting in only its own
    * pages — see SqliteReader.openMapped), writing its slice of files
    * straight to the shared filesystem. Returns the tile-file count.
    */
  /** Name of the completion marker [[extractTiles]] writes; its content
    * is the decimal tile count, so a consumer can both distinguish a
    * finished extraction from the partial directory a failed job leaves
    * behind AND verify the file count it sees.
    */
  val ExtractSuccessMarker = "_SUCCESS"

  def extractTiles(s: SparkSession, mbtiles: java.nio.file.Path,
      outDir: java.nio.file.Path): Long = {
    import graft.sources.SqliteReader
    val splits = SqliteReader.openMapped(mbtiles).subtreeRoots("tiles")
    val mb = mbtiles.toAbsolutePath.toString
    val out = outDir.toAbsolutePath.toString
    val n = s.sparkContext.parallelize(splits, splits.size).map { root =>
      val db = SqliteReader.openMapped(java.nio.file.Paths.get(mb))
      var n = 0L
      db.walk(root).foreach { case (_, vs) =>
        val z = vs(0).asInstanceOf[Long].toInt
        val x = vs(1).asInstanceOf[Long]
        val y = (1L << z) - 1L - vs(2).asInstanceOf[Long] // TMS -> XYZ
        val dir = java.nio.file.Paths.get(out, z.toString, x.toString)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"$y.pbf"),
          vs(3).asInstanceOf[Array[Byte]])
        n += 1
      }
      n
    }.fold(0L)(_ + _)
    // tasks write via java.nio, which is correct in local mode or on a
    // shared POSIX filesystem (task retries rewrite identical bytes to
    // identical paths — idempotent); a FAILED job, though, leaves a
    // partial directory indistinguishable from a finished one. The
    // marker is written only after every task completed, and carries
    // the count (ADVICE r15).
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, ExtractSuccessMarker),
      n.toString.getBytes("UTF-8"))
    n
  }

  /** The extracted directory read back DISTRIBUTEDLY — binaryFile
    * source over the `z/x/y.pbf` layout, keys parsed from the path —
    * shaped for [[decodedStats]] so the extracted bytes sit under the
    * same DuckDB stats gate as the in-engine tiles.
    */
  private[graft] def readTileDir(s: SparkSession,
      dir: java.nio.file.Path): DataFrame = {
    // refuse to read the partial directory a failed extraction leaves
    // behind: the marker is written only after every task completed
    require(java.nio.file.Files.exists(dir.resolve(ExtractSuccessMarker)),
      s"$dir has no $ExtractSuccessMarker marker — extraction did not " +
        "complete; re-run extractTiles")
    val re = "^.*/([0-9]+)/([0-9]+)/([0-9]+)\\.pbf$"
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.pbf")
      .option("recursiveFileLookup", "true")
      .load(dir.toString)
      .select(
        regexp_extract(col("path"), re, 1).cast("int").as("zoom"),
        regexp_extract(col("path"), re, 2).cast("long").as("tile_x"),
        regexp_extract(col("path"), re, 3).cast("long").as("tile_y"),
        col("content").as("tile"))
  }

  // Driver gate: container write → distributed directory extraction →
  // distributed file read-back → protobuf decode must reproduce the
  // SAME relational tile stats as the direct pipeline — so the
  // filename scheme (XYZ un-flip included), the per-file bytes, and
  // the directory layout all sit under the DuckDB hash, and a tile
  // written to the wrong z/x/y path hash-mismatches instead of only
  // failing a structural spec.
  private val qExtract = QuerySpec.of(
    "q_tiles_extract", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatPtsCtes,
        |$oraclePrepCtes
        |$oracleStatsSelect""".stripMargin
    }) { (s, d) =>
    val dir = graft.TempDirs.scoped("graft_extract_")
    val mb = dir.resolve("in.mbtiles")
    writeMbtilesFile(s, d, mb)
    val outDir = dir.resolve("tiles")
    extractTiles(s, mb, outDir)
    decodedStats(readTileDir(s, outDir))
  }

  // Gzip-chain gate: the tippecanoe-default gzipped container written,
  // extracted, and read back — gzip member bytes through the mmap
  // subtree walk to z/x/y.pbf files, gunzipped and decoded to the SAME
  // relational stats oracle, so the compressed artifact format sits
  // under the DuckDB hash (the compressed bytes themselves are
  // JVM-zlib-specific and never hashed; gunzip∘gzip plus python's own
  // gzip reader in MbtilesSpec cover the member format).
  private val qExtractGzip = QuerySpec.of(
    "q_tiles_extract_gzip", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatPtsCtes,
        |$oraclePrepCtes
        |$oracleStatsSelect""".stripMargin
    }) { (s, d) =>
    val dir = graft.TempDirs.scoped("graft_extract_gz_")
    val mb = dir.resolve("in.mbtiles")
    val prev = s.conf.getOption(GzipKey)
    s.conf.set(GzipKey, "true")
    try writeMbtilesFile(s, d, mb)
    finally prev match {
      case Some(v) => s.conf.set(GzipKey, v)
      case None => s.conf.unset(GzipKey)
    }
    val outDir = dir.resolve("tiles")
    extractTiles(s, mb, outDir)
    decodedStats(readTileDir(s, outDir).withColumn("tile",
      graft.functions.GzipExpr.gunzip(col("tile"))))
  }

  val specs: Seq[QuerySpec] =
    Seq(qStats, qBytes, qEncode, qStreamRefresh, qMbtiles, qExtract,
      qExtractGzip)
}
