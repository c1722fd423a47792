package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Terrain-tile elevation sampling (SURVEY E1's real backend math) —
  * the reference's slippy-tile elevation source re-expressed as a
  * declarative, join-based dataflow:
  *
  *   - RGB elevation decode: mapbox `-10000 + (r*65536+g*256+b)*0.1`,
  *     terrarium `r*256 + g + b/256 - 32768`
  *     (`/root/reference/src/transforms/elevation/ElevationDecoder.ts:7-21`);
  *   - Web-Mercator lon/lat → (tileX, tileY, fractional pixel) at a
  *     zoom, with the reference's ±0.9999 siny clamp
  *     (`TileCoordinates.ts:30-55`);
  *   - the 4-corner bilinear interpolation setup with cross-tile pixel
  *     wrap (x wraps around the world, y falls off it)
  *     (`TileCoordinates.ts:63-126`);
  *   - bilinear blend with the fx=fy=0 short-circuit and per-point
  *     zoom fallback: a point that cannot resolve at zooms(0) (missing
  *     tile or world edge) retries the next zoom, else stays null
  *     (`TerrainTileElevationSource.ts:60-216`).
  *
  * Architecture: the tile raster is a DataFrame `(z, x, y, width,
  * data binary)` — raw RGB bytes, the same buffer shape sharp hands
  * the reference after WebP decode. The byte fetch is
  * `conv(hex(substr(data, off, 3)), 16, 10)`, i.e. the 24-bit pixel
  * value read with BUILT-IN codegen'd expressions — no UDF, no custom
  * Expression needed, the whole per-point pipeline (mercator math, 8
  * broadcast joins, decode, blend) is one WholeStageCodegen stage with
  * ZERO shuffles. At 100 TB of points the tile side stays the small
  * broadcast dimension (a z12 world pyramid over ski terrain is a few
  * GB and prunes by z; a full-world raster would switch these to
  * shuffle equi-joins on (z,x,y) with the same plan shape).
  */
object TerrainTiles {

  private val FourPi = 4.0 * math.Pi

  /** 24-bit big-endian pixel value (r*65536 + g*256 + b) at integer
    * pixel (x, y) of a raw 3-channel RGB buffer — the reference's
    * `elevationAtPixel` offset math (`ElevationDecoder.ts:26-44`)
    * with the RGB recombination folded into one hex read.
    */
  def rgb24At(data: Column, x: Column, y: Column, width: Column): Column =
    conv(hex(substr(data, ((y * width + x) * 3 + 1).cast("int"), lit(3))),
      16, 10).cast("long")

  /** Decoded elevation (meters) at integer pixel (x, y).
    * mapbox: -10000 + v*0.1; terrarium: v/256 - 32768 (exact: v/256 is
    * a dyadic scale, so it equals r*256 + g + b/256 bit-for-bit).
    */
  def elevationAt(data: Column, x: Column, y: Column, width: Column,
      encoding: String): Column = {
    val v = rgb24At(data, x, y, width).cast("double")
    encoding match {
      case "mapbox"    => lit(-10000.0) + v * 0.1
      case "terrarium" => v / 256.0 - 32768.0
      case other => throw new IllegalArgumentException(
        s"unknown tile encoding: $other")
    }
  }

  /** Bilinear blend of the 4 corner elevations
    * (`ElevationDecoder.ts:50-61`): e00 top-left, e10 top-right,
    * e01 bottom-left, e11 bottom-right.
    */
  def bilinear(e00: Column, e10: Column, e01: Column, e11: Column,
      fx: Column, fy: Column): Column = {
    val top = e00 * (lit(1.0) - fx) + e10 * fx
    val bottom = e01 * (lit(1.0) - fx) + e11 * fx
    top * (lit(1.0) - fy) + bottom * fy
  }

  final case class TilePixelCols(tileX: Column, tileY: Column,
      pixelX: Column, pixelY: Column)

  /** Web-Mercator (lon, lat) → tile + fractional pixel at `zoom`
    * (`TileCoordinates.ts:30-55`). Operation order mirrors the
    * reference exactly so both sides of the oracle compare compute
    * identical IEEE doubles.
    */
  def lonLatToTilePixel(lon: Column, lat: Column, zoom: Int,
      tileSize: Int): TilePixelCols = {
    val ts = lit(tileSize.toDouble)
    // (lat * π) / 180 spelled out — builtin radians() associates the
    // constant differently and can differ in the last ulp
    val siny = least(greatest(sin(lat * math.Pi / 180.0), lit(-0.9999)),
      lit(0.9999))
    val xw = ts * (lit(0.5) + lon / 360.0)
    val yw = ts * (lit(0.5) -
      log((lit(1.0) + siny) / (lit(1.0) - siny)) / FourPi)
    val scale = lit((1L << zoom).toDouble)
    val tx = floor(xw * scale / ts)
    val ty = floor(yw * scale / ts)
    TilePixelCols(tx, ty,
      xw * scale - tx.cast("double") * ts,
      yw * scale - ty.cast("double") * ts)
  }

  final case class CornerCols(tileX: Column, tileY: Column,
      px: Column, py: Column, inWorld: Column)

  /** The 4 interpolation corners with cross-tile wrap
    * (`TileCoordinates.ts:63-126`): x wraps modulo the world width,
    * y going out of [0, numTiles) marks the corner out-of-world.
    * Returns (corners, fx, fy).
    */
  def interpolationCorners(tp: TilePixelCols, zoom: Int, tileSize: Int)
      : (Seq[CornerCols], Column, Column) = {
    val x0 = floor(tp.pixelX)
    val y0 = floor(tp.pixelY)
    val fx = tp.pixelX - x0.cast("double")
    val fy = tp.pixelY - y0.cast("double")
    val n = 1L << zoom
    val corners = Seq((0, 0), (1, 0), (0, 1), (1, 1)).map { case (dx, dy) =>
      val rawX = x0 + dx
      val rawY = y0 + dy
      val cx = when(rawX >= tileSize, pmod(tp.tileX + 1, lit(n)))
        .when(rawX < 0, pmod(tp.tileX - 1 + n, lit(n)))
        .otherwise(tp.tileX)
      val lx = when(rawX >= tileSize, lit(0L))
        .when(rawX < 0, lit(tileSize - 1L))
        .otherwise(rawX)
      val cy = when(rawY >= tileSize, tp.tileY + 1)
        .when(rawY < 0, tp.tileY - 1)
        .otherwise(tp.tileY)
      val ly = when(rawY >= tileSize, lit(0L))
        .when(rawY < 0, lit(tileSize - 1L))
        .otherwise(rawY)
      CornerCols(cx, cy, lx, ly, cy >= 0 && cy < n)
    }
    (corners, fx, fy)
  }

  /** Elevation lookup for a points DataFrame `(id, lon, lat)` against
    * a tile raster DataFrame `(z, x, y, width, data)`: per point, the
    * first zoom in `zooms` whose 4 corner tiles all resolve wins
    * (`TerrainTileElevationSource.ts:73-216`); a point no zoom can
    * serve keeps null elevation. Output: (id, zoom, tile_x, tile_y,
    * elevation) — elevation un-rounded.
    */
  def elevationAtPoints(points: DataFrame, tiles: DataFrame,
      zooms: Seq[Int], tileSize: Int, encoding: String): DataFrame = {
    var df = points
    for (z <- zooms) {
      val tp0 = lonLatToTilePixel(col("lon"), col("lat"), z, tileSize)
      df = df
        .withColumn(s"z${z}_tx", tp0.tileX)
        .withColumn(s"z${z}_ty", tp0.tileY)
        .withColumn(s"z${z}_px", tp0.pixelX)
        .withColumn(s"z${z}_py", tp0.pixelY)
      val tp = TilePixelCols(col(s"z${z}_tx"), col(s"z${z}_ty"),
        col(s"z${z}_px"), col(s"z${z}_py"))
      val (corners, fx, fy) = interpolationCorners(tp, z, tileSize)
      df = df.withColumn(s"z${z}_fx", fx).withColumn(s"z${z}_fy", fy)
      corners.zipWithIndex.foreach { case (c, i) =>
        df = df
          .withColumn(s"z${z}c${i}_cx", c.tileX)
          .withColumn(s"z${z}c${i}_cy", c.tileY)
          .withColumn(s"z${z}c${i}_lx", c.px)
          .withColumn(s"z${z}c${i}_ly", c.py)
          .withColumn(s"z${z}c${i}_ok", c.inWorld)
      }
      for (i <- 0 until 4) {
        val p = s"z${z}c$i"
        val t = tiles.filter(col("z") === z).select(
          col("x").as(s"${p}_jx"), col("y").as(s"${p}_jy"),
          col("width").as(s"${p}_jw"), col("data").as(s"${p}_jd"))
        df = df.join(broadcast(t),
          col(s"${p}_cx") === col(s"${p}_jx") &&
            col(s"${p}_cy") === col(s"${p}_jy") && col(s"${p}_ok"),
          "left")
      }
      for (i <- 0 until 4) {
        val p = s"z${z}c$i"
        df = df.withColumn(s"z${z}_e$i",
          when(col(s"${p}_jd").isNotNull,
            elevationAt(col(s"${p}_jd"), col(s"${p}_lx"),
              col(s"${p}_ly"), col(s"${p}_jw"), encoding)))
      }
      val es = (0 until 4).map(i => col(s"z${z}_e$i"))
      val have4 = es.map(_.isNotNull).reduce(_ && _)
      val fxz = col(s"z${z}_fx")
      val fyz = col(s"z${z}_fy")
      df = df
        .withColumn(s"z${z}_have", have4)
        .withColumn(s"z${z}_elev",
          when(have4,
            when(fxz === 0.0 && fyz === 0.0, es(0))
              .otherwise(bilinear(es(0), es(1), es(2), es(3), fxz, fyz))))
    }
    def pick(f: Int => Column): Column =
      coalesce(zooms.map(z => when(col(s"z${z}_have"), f(z))): _*)
    df.select(col("id"),
      pick(z => lit(z)).as("zoom"),
      pick(z => col(s"z${z}_tx").cast("long")).as("tile_x"),
      pick(z => col(s"z${z}_ty").cast("long")).as("tile_y"),
      pick(z => col(s"z${z}_elev")).as("elevation"))
  }

  // ---- synthetic fixture ------------------------------------------------
  // Zero-egress container: the tile PYRAMID is synthesized (raw RGB
  // buffers, mapbox-encoded), but everything downstream of "bytes in
  // hand" — offset math, decode, mercator, corners, blend, fallback —
  // is the real production path. The pixel value is a deterministic
  // function of the GLOBAL pixel coordinate so the DuckDB oracle can
  // recompute it without ever seeing the bytes: if the Spark byte
  // indexing or RGB recombination were wrong, every hash would differ.

  val FixtureTileSize = 64

  /** v(gx, gy) in [0, 200000): mapbox-encodes to elevations in
    * [-10000, 9999.9].
    */
  def pixelValue(gx: Long, gy: Long): Long =
    (gx * 2654435761L + gy * 40503L) % 200000L

  /** Raw 3-channel RGB buffer for tile (z, x, y), mapbox-encoded. */
  def tileRaster(x: Long, y: Long, tileSize: Int): Array[Byte] = {
    val buf = new Array[Byte](tileSize * tileSize * 3)
    var py = 0
    while (py < tileSize) {
      var px = 0
      while (px < tileSize) {
        val v = pixelValue(x * tileSize + px, y * tileSize + py)
        val off = (py * tileSize + px) * 3
        buf(off) = ((v >> 16) & 0xFF).toByte
        buf(off + 1) = ((v >> 8) & 0xFF).toByte
        buf(off + 2) = (v & 0xFF).toByte
        px += 1
      }
      py += 1
    }
    buf
  }

  /** Tile pyramid for `zooms` with a deterministic coverage gap:
    * above the coarsest zoom, tile (x, y) is missing when
    * (x + y) % 3 == 0 — exercising the reference's 404 → next-zoom
    * fallback on ~5/9 of the points.
    */
  def synthTiles(s: SparkSession, zooms: Seq[Int], tileSize: Int)
      : DataFrame = {
    import s.implicits._
    val coarsest = zooms.min
    val rows = for {
      z <- zooms
      n = 1L << z
      x <- 0L until n
      y <- 0L until n
      if z == coarsest || (x + y) % 3 != 0
    } yield (z, x, y, tileSize, tileRaster(x, y, tileSize))
    rows.toDF("z", "x", "y", "width", "data")
  }

  // ---- query ------------------------------------------------------------

  private def cornerSql(dx: Int, dy: Int): (String, String, String, String) = {
    val cx = s"(CASE WHEN x0 + $dx >= 64 THEN (tx + 1) % nt" +
      s" WHEN x0 + $dx < 0 THEN (tx - 1 + nt) % nt ELSE tx END)"
    val lx = s"(CASE WHEN x0 + $dx >= 64 THEN 0" +
      s" WHEN x0 + $dx < 0 THEN 63 ELSE x0 + $dx END)"
    val cy = s"(CASE WHEN y0 + $dy >= 64 THEN ty + 1" +
      s" WHEN y0 + $dy < 0 THEN ty - 1 ELSE ty END)"
    val ly = s"(CASE WHEN y0 + $dy >= 64 THEN 0" +
      s" WHEN y0 + $dy < 0 THEN 63 ELSE y0 + $dy END)"
    (cx, cy, lx, ly)
  }

  private def eSql(i: Int): String = {
    val (dx, dy) = Seq((0, 0), (1, 0), (0, 1), (1, 1))(i)
    val (cx, cy, lx, ly) = cornerSql(dx, dy)
    s"""CASE WHEN $cy >= 0 AND $cy < nt
       | AND (z = 2 OR ($cx + $cy) % 3 <> 0)
       |THEN -10000.0 + CAST((($cx * 64 + $lx) * 2654435761
       |  + ($cy * 64 + $ly) * 40503) % 200000 AS DOUBLE) * 0.1
       |END AS e$i""".stripMargin.replace('\n', ' ')
  }

  private val tileElevOracle =
    s"""WITH pts0 AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
      |pts AS (
      |  SELECT id,
      |    CASE WHEN id % 41 = 0
      |      THEN -86.2 + (id % 7) * 0.01
      |      ELSE -80.0 + (id * 53 % 1600) / 10.0 + 0.037 END AS lat,
      |    -180.0 + (id * 37 % 3600) / 10.0 + 0.071 AS lon
      |  FROM pts0),
      |zs AS (SELECT 3 AS z, 0 AS zi, CAST(8 AS BIGINT) AS nt
      |       UNION ALL SELECT 2, 1, CAST(4 AS BIGINT)),
      |base AS (
      |  SELECT id, z, zi, nt,
      |    64.0 * (0.5 + lon / 360.0) AS xw,
      |    64.0 * (0.5 - ln((1.0 + LEAST(GREATEST(sin(lat * pi() / 180.0),
      |      -0.9999), 0.9999)) / (1.0 - LEAST(GREATEST(
      |      sin(lat * pi() / 180.0), -0.9999), 0.9999))) / (4.0 * pi()))
      |      AS yw
      |  FROM pts CROSS JOIN zs),
      |t1 AS (SELECT *, CAST(floor(xw * nt / 64.0) AS BIGINT) AS tx,
      |              CAST(floor(yw * nt / 64.0) AS BIGINT) AS ty FROM base),
      |t2 AS (SELECT *, xw * nt - CAST(tx AS DOUBLE) * 64.0 AS px,
      |              yw * nt - CAST(ty AS DOUBLE) * 64.0 AS py FROM t1),
      |t3 AS (SELECT *, CAST(floor(px) AS BIGINT) AS x0,
      |              CAST(floor(py) AS BIGINT) AS y0,
      |              px - floor(px) AS fx, py - floor(py) AS fy FROM t2),
      |t4 AS (SELECT id, z, zi, tx, ty, fx, fy,
      |  ${eSql(0)}, ${eSql(1)}, ${eSql(2)}, ${eSql(3)}
      |  FROM t3),
      |t5 AS (SELECT *, (e0 IS NOT NULL AND e1 IS NOT NULL
      |    AND e2 IS NOT NULL AND e3 IS NOT NULL) AS have4,
      |  CASE WHEN fx = 0 AND fy = 0 THEN e0
      |    ELSE (e0 * (1.0 - fx) + e1 * fx) * (1.0 - fy)
      |       + (e2 * (1.0 - fx) + e3 * fx) * fy END AS ev
      |  FROM t4),
      |best AS (SELECT id, z, tx, ty, ev FROM t5 WHERE have4
      |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY zi) = 1)
      |SELECT p.id, CAST(b.z AS INT) AS zoom,
      |  b.tx AS tile_x, b.ty AS tile_y,
      |  floor(b.ev * 100.0) / 100.0 AS elevation
      |FROM pts p LEFT JOIN best b ON p.id = b.id
      |ORDER BY p.id""".stripMargin

  /** Deterministic point cloud from `customer`: ~2.4 % of points at
    * lat ≈ -86 (below the Web-Mercator world edge → null elevation),
    * the rest spread across the world including the lon-wrap seam.
    */
  private def fixturePoints(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey").cast("long")
    s.read.parquet(s"$d/customer.parquet").select(
      k.as("id"),
      (when(pmod(k, lit(41)) === 0,
        lit(-86.2) + pmod(k, lit(7)).cast("double") * 0.01)
        .otherwise(lit(-80.0)
          + pmod(k * 53, lit(1600)).cast("double") / 10.0
          + 0.037)).as("lat"),
      (lit(-180.0) + pmod(k * 37, lit(3600)).cast("double") / 10.0
        + 0.071).as("lon"))
  }

  private val qTileElevation = QuerySpec.of(
    "q_ski_tile_elevation", tileElevOracle) { (s, d) =>
    val tiles = synthTiles(s, Seq(3, 2), FixtureTileSize)
    elevationAtPoints(fixturePoints(s, d), tiles, Seq(3, 2),
      FixtureTileSize, "mapbox")
      .withColumn("elevation", floor(col("elevation") * 100.0) / 100.0)
      .orderBy("id")
  }

  val specs: Seq[QuerySpec] = Seq(qTileElevation)
}
