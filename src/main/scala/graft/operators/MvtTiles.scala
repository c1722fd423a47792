package graft.operators

import graft.QuerySpec
import graft.functions.MvtLayerEncodeExpr
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine Mapbox Vector Tile generation (SURVEY S8 depth) — the
  * reference shells out to tippecanoe with per-layer zoom ranges
  * (`/root/reference/src/transforms/TilesGenerator.ts:15-97`: ski
  * areas Z0-15, lifts Z5-15, runs Z9-15, spots Z9-15) and merges the
  * per-layer tilesets with tile-join. Here the whole path is Spark
  * DataFrame algebra plus one byte kernel:
  *
  *  1. tile assignment — per feature and zoom, the slippy tiles its
  *     lon/lat bbox intersects (Web-Mercator, the TerrainTiles
  *     operation order, so both engines compute identical doubles);
  *     `explode(sequence(...))` keeps the fan-out itself narrow.
  *     Two small shuffles precede it: the `Tables.fanout` repartition
  *     that spreads the feature tables, and the runs layer's
  *     groupBy(way_id) dedup in `features()` — both over the
  *     un-exploded feature rows, so they are tiny relative to the
  *     post-explosion volume;
  *  2. tile-local quantization — world integer pixel at a 4096
  *     extent, minus tile origin; coordinates of a multi-tile feature
  *     may leave [0,4096) (valid MVT — renderers clip; buffer=0,
  *     unclipped, and unwrapped at the antimeridian, documented
  *     divergences from tippecanoe's defaults);
  *  3. encoding — [[graft.functions.MvtKernel]] builds each layer's
  *     protobuf frame after a per-(tile,layer) collect; a tile is the
  *     concatenation of its layer frames, so assembly is plain
  *     `concat` — no driver round-trip, no external binary.
  *
  * Scale shape: steps 1-2 are per-row expressions over the feature
  * tables (runs/lifts/areas/spots), step 3 shuffles once on
  * (z, tx, ty, layer) — exactly the key the output is partitioned by,
  * so a 1000-executor run writes tiles straight out of the agg. The
  * per-tile group is bounded by tippecanoe-style zoom gating (low
  * zooms hold many features per tile but there are few such tiles;
  * high zooms shard the world).
  *
  * Correctness: `q_tiles_mvt` is the DuckDB-oracled stats row
  * (per-tile/zoom/layer feature counts + an order-weighted integer
  * checksum over the quantized coordinates); `q_tiles_mvt_bytes` is
  * the encoded-tile surface (rows-only driver check; MvtTilesSpec
  * decodes the protobuf back and round-trips geometry and tags).
  */
object MvtTiles {

  val Extent = 4096
  val MaxZoom = 15

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

    val spots = graft.Tables.events(s, d)
      .select(lit("spots").as("layer"), col("event_id").as("fid"),
        lit(1).as("gtype"), lit(9).as("minz"),
        array(pt(
          pmod(col("event_id") * 7919, lit(360000)).cast("double")
            / 1000.0 - 180.0,
          pmod(col("event_id") * 104729, lit(120000)).cast("double")
            / 1000.0 - 60.0)).as("pts"),
        array(lit("kind")).as("pk"), array(lit("spot")).as("pv"))

    runs.unionByName(lifts).unionByName(areas).unionByName(spots)
  }

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

  private val oracleFeatureCtes: String = {
    s"""$oracleFeatPtsCtes,
      |feat_bbox AS (
      |  SELECT layer, fid, gtype, minz,
      |    min(lon) AS lonmin, max(lon) AS lonmax,
      |    min(lat) AS latmin, max(lat) AS latmax
      |  FROM feat_pts GROUP BY 1, 2, 3, 4),
      |feat_z AS (
      |  SELECT b.*, z, CAST(1::BIGINT << z AS DOUBLE) AS s2z
      |  FROM feat_bbox b, unnest(generate_series(b.minz, $MaxZoom)) AS uz(z)),
      |feat_rng AS (
      |  SELECT layer, fid, gtype, z, s2z,
      |    CAST(floor((${sqlXw("lonmin")}) * s2z) AS BIGINT) // 4096 AS txlo,
      |    CAST(floor((${sqlXw("lonmax")}) * s2z) AS BIGINT) // 4096 AS txhi,
      |    CAST(floor((${sqlYw("latmax")}) * s2z) AS BIGINT) // 4096 AS tylo,
      |    CAST(floor((${sqlYw("latmin")}) * s2z) AS BIGINT) // 4096 AS tyhi
      |  FROM feat_z),
      |feat_tiles AS (
      |  SELECT r.layer, r.fid, r.gtype, r.z, r.s2z, tx, ty
      |  FROM feat_rng r,
      |    unnest(generate_series(r.txlo, r.txhi)) AS ux(tx),
      |    unnest(generate_series(r.tylo, r.tyhi)) AS uy(ty)),
      |assigned AS (
      |  SELECT t.layer, t.fid, t.gtype, t.z, t.tx, t.ty, p.pidx,
      |    CAST(floor((${sqlXw("p.lon")}) * t.s2z) AS BIGINT)
      |      - t.tx * 4096 AS px,
      |    CAST(floor((${sqlYw("p.lat")}) * t.s2z) AS BIGINT)
      |      - t.ty * 4096 AS py
      |  FROM feat_tiles t JOIN feat_pts p
      |    ON p.layer = t.layer AND p.fid = t.fid)""".stripMargin
  }

  /** Tile-assigned quantized points:
    * (layer, fid, gtype, z, tx, ty, pidx, px, py, pk, pv).
    * Pure narrow expressions — explodes, no shuffle.
    */
  private[operators] def assigned(s: SparkSession, d: String): DataFrame = {
    val s2z = expr("CAST(shiftleft(CAST(1 AS BIGINT), z) AS DOUBLE)")
    def pxw(c: Column): Column = floor(xWorld(c) * s2z).cast("long")
    def pyw(c: Column): Column = floor(yWorld(c) * s2z).cast("long")
    graft.Tables.fanout(features(s, d))
      .withColumn("lonmin", array_min(transform(col("pts"), _("lon"))))
      .withColumn("lonmax", array_max(transform(col("pts"), _("lon"))))
      .withColumn("latmin", array_min(transform(col("pts"), _("lat"))))
      .withColumn("latmax", array_max(transform(col("pts"), _("lat"))))
      .withColumn("z", explode(sequence(col("minz"), lit(MaxZoom))))
      // mercator y grows southward: ty range comes from latmax..latmin
      .withColumn("tx",
        explode(sequence(expr(s"${dv("lonmin", true)} DIV 4096"),
          expr(s"${dv("lonmax", true)} DIV 4096"))))
      .withColumn("ty",
        explode(sequence(expr(s"${dv("latmax", false)} DIV 4096"),
          expr(s"${dv("latmin", false)} DIV 4096"))))
      .select(col("layer"), col("fid"), col("gtype"), col("z"),
        col("tx"), col("ty"), col("pk"), col("pv"),
        posexplode(col("pts")).as(Seq("pidx", "p")))
      .select(col("layer"), col("fid"), col("gtype"), col("z"),
        col("tx"), col("ty"), col("pidx"), col("pk"), col("pv"),
        (pxw(col("p")("lon")) - col("tx") * 4096).as("px"),
        (pyw(col("p")("lat")) - col("ty") * 4096).as("py"))
  }

  /** World-pixel SQL fragment for the Spark side (expr text so the
    * shift-by-column works; the Scala `shiftleft` wrapper only takes a
    * literal shift).
    */
  private def dv(c: String, isX: Boolean): String = {
    val w = if (isX) sqlXw(c)
      else sqlYw(c)
    s"CAST(floor(($w) * CAST(shiftleft(CAST(1 AS BIGINT), z) AS DOUBLE)) AS BIGINT)"
  }

  // ---- per-tile/zoom/layer stats (the DuckDB-oracled row) ----------------
  // Two-stage aggregation: per-feature point count + order-weighted
  // integer checksum (map-side combinable), then the per-tile rollup.
  // The checksum weights each point by (pidx+1) so vertex order
  // matters, and sums across features so the total is shuffle-order
  // independent — all BIGINT, hash-exact across engines.
  private val qStats = QuerySpec.of(
    "q_tiles_mvt", {
      s"""WITH ${SkiQueries.oraclePrelude},
        |$oracleFeatureCtes,
        |per_feat AS (
        |  SELECT layer, fid, z, tx, ty,
        |    count(*) AS n_pts,
        |    sum(CAST(pidx + 1 AS BIGINT) * (px * 8191 + py)) AS chk
        |  FROM assigned GROUP BY 1, 2, 3, 4, 5)
        |SELECT CAST(z AS INT) AS zoom, tx AS tile_x, ty AS tile_y, layer,
        |  CAST(count(*) AS BIGINT) AS n_features,
        |  CAST(sum(n_pts) AS BIGINT) AS n_points,
        |  CAST(sum(chk) AS BIGINT) AS coord_checksum
        |FROM per_feat GROUP BY 1, 2, 3, 4
        |ORDER BY zoom, tile_x, tile_y, layer""".stripMargin
    }) { (s, d) =>
    assigned(s, d)
      .groupBy("layer", "fid", "z", "tx", "ty")
      .agg(count(lit(1)).as("n_pts"),
        sum((col("pidx") + 1).cast("long")
          * (col("px") * 8191 + col("py"))).as("chk"))
      .groupBy(col("z").cast("int").as("zoom"), col("tx").as("tile_x"),
        col("ty").as("tile_y"), col("layer"))
      .agg(count(lit(1)).as("n_features"),
        sum("n_pts").as("n_points"),
        sum("chk").as("coord_checksum"))
      .orderBy("zoom", "tile_x", "tile_y", "layer")
  }

  // ---- encoded tile blobs -------------------------------------------------
  // The full MVT surface: per-(tile,layer) feature collect (sorted by
  // fid so the bytes are shuffle-order independent), the protobuf
  // layer frame from the byte kernel, then tiles as concatenated layer
  // frames in layer-name order. Rows-only driver check — the protobuf
  // wire format isn't SQL-expressible — with the decode round-trip in
  // MvtTilesSpec standing in as the strong check.
  def tileBytes(s: SparkSession, d: String): DataFrame = {
    val featRows = assigned(s, d)
      .groupBy("z", "tx", "ty", "layer", "fid", "gtype")
      .agg(
        sort_array(collect_list(struct(col("pidx"), col("px"), col("py"))))
          .as("pts0"),
        first("pk").as("pkeys"), first("pv").as("pvals"))
      .select(col("z"), col("tx"), col("ty"), col("layer"),
        struct(col("fid"), col("gtype"), col("pts0").as("pts"),
          col("pkeys"), col("pvals")).as("feat"))
    val layerRows = featRows
      .groupBy("z", "tx", "ty", "layer")
      .agg(sort_array(collect_list(col("feat"))).as("feats"))
      .select(col("z"), col("tx"), col("ty"), col("layer"),
        MvtLayerEncodeExpr.mvtLayer(col("layer"), col("feats"))
          .as("layer_bytes"))
    layerRows
      .groupBy("z", "tx", "ty")
      .agg(sort_array(collect_list(struct(col("layer"),
        col("layer_bytes")))).as("ls"))
      .select(col("z").cast("int").as("zoom"), col("tx").as("tile_x"),
        col("ty").as("tile_y"), size(col("ls")).as("n_layers"),
        aggregate(col("ls"), lit(Array.empty[Byte]),
          (acc, x) => concat(acc, x("layer_bytes"))).as("tile"))
  }

  private val qBytes = QuerySpec.noOracle("q_tiles_mvt_bytes") { (s, d) =>
    tileBytes(s, d)
      .select(col("zoom"), col("tile_x"), col("tile_y"), col("n_layers"),
        length(col("tile")).cast("long").as("tile_len"),
        crc32(col("tile")).as("tile_crc"))
      .orderBy("zoom", "tile_x", "tile_y")
  }

  val specs: Seq[QuerySpec] = Seq(qStats, qBytes)
}
