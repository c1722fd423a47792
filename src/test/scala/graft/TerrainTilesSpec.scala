package graft

import graft.operators.TerrainTiles
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Goldens ported from the reference elevation suite
  * (`/root/reference/src/transforms/elevation/ElevationDecoder.unit.test.ts`,
  * `TileCoordinates.unit.test.ts`) plus an end-to-end lookup over a
  * synthetic pyramid exercising zoom fallback and world-edge nulls.
  */
class TerrainTilesSpec extends SparkSpec {

  import spark.implicits._

  private def buf(pixels: (Int, Int, Int)*): Array[Byte] =
    pixels.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte)
    }.toArray

  private def elevAt(data: Array[Byte], x: Int, y: Int, width: Int,
      encoding: String): Double =
    Seq((data, x, y)).toDF("data", "x", "y")
      .select(TerrainTiles.elevationAt(col("data"), col("x"), col("y"),
        lit(width), encoding).as("e"))
      .head().getDouble(0)

  test("mapbox decode goldens") {
    assert(math.abs(elevAt(buf((1, 134, 160)), 0, 0, 1, "mapbox")) < 0.05)
    assert(elevAt(buf((0, 0, 0)), 0, 0, 1, "mapbox") === -10000.0)
    assert(math.abs(elevAt(buf((1, 135, 0)), 0, 0, 1, "mapbox") - 9.6) < 0.05)
    assert(math.abs(elevAt(buf((2, 224, 74)), 0, 0, 1, "mapbox") - 8849.0) < 0.05)
  }

  test("terrarium decode goldens") {
    assert(math.abs(elevAt(buf((128, 0, 0)), 0, 0, 1, "terrarium")) < 0.05)
    assert(elevAt(buf((0, 0, 0)), 0, 0, 1, "terrarium") === -32768.0)
    assert(math.abs(elevAt(buf((128, 10, 0)), 0, 0, 1, "terrarium") - 10.0) < 0.05)
    assert(math.abs(elevAt(buf((162, 145, 0)), 0, 0, 1, "terrarium") - 8849.0) < 0.05)
  }

  test("elevationAtPixel offset math on a 2x2 buffer") {
    val b = buf((1, 134, 160), (1, 135, 0), (1, 134, 160), (1, 135, 0))
    assert(math.abs(elevAt(b, 0, 0, 2, "mapbox")) < 0.05)
    assert(math.abs(elevAt(b, 1, 0, 2, "mapbox") - 9.6) < 0.05)
    assert(math.abs(elevAt(b, 0, 1, 2, "mapbox")) < 0.05)
    assert(math.abs(elevAt(b, 1, 1, 2, "mapbox") - 9.6) < 0.05)
  }

  private def tilePixel(lon: Double, lat: Double, zoom: Int, tileSize: Int)
      : (Long, Long, Double, Double) = {
    val tp = TerrainTiles.lonLatToTilePixel(col("lon"), col("lat"),
      zoom, tileSize)
    val r = Seq((lon, lat)).toDF("lon", "lat")
      .select(tp.tileX, tp.tileY, tp.pixelX, tp.pixelY).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
  }

  test("lonLatToTilePixel goldens") {
    val (tx0, ty0, px0, py0) = tilePixel(0, 0, 0, 512)
    assert(tx0 === 0L && ty0 === 0L)
    assert(math.abs(px0 - 256) < 0.5 && math.abs(py0 - 256) < 0.5)

    val (tx1, ty1, _, _) = tilePixel(-84.8866, 39.1453, 12, 512)
    assert(tx1 === 1082L && ty1 === 1563L)

    // lon 180 wraps to the start of tile 2 at zoom 1
    val (tx2, _, px2, py2) = tilePixel(180, 0, 1, 256)
    assert(tx2 === 2L && math.abs(px2) < 0.5 && math.abs(py2) < 0.5)

    // extreme latitude clamped by the siny limit
    val (tx3, ty3, _, _) = tilePixel(0, 85, 2, 512)
    assert(tx3 === 2L && ty3 === 0L)
  }

  private def corners(tileX: Long, tileY: Long, pixelX: Double,
      pixelY: Double, zoom: Int, tileSize: Int)
      : (Seq[(Long, Long, Long, Long, Boolean)], Double, Double) = {
    val tp = TerrainTiles.TilePixelCols(col("tx"), col("ty"),
      col("px"), col("py"))
    val (cs, fx, fy) = TerrainTiles.interpolationCorners(tp, zoom, tileSize)
    val cols = cs.flatMap(c => Seq(c.tileX, c.tileY, c.px, c.py,
      c.inWorld)) ++ Seq(fx, fy)
    val r = Seq((tileX, tileY, pixelX, pixelY)).toDF("tx", "ty", "px", "py")
      .select(cols: _*).head()
    val out = (0 until 4).map { i =>
      (r.getLong(i * 5), r.getLong(i * 5 + 1), r.getLong(i * 5 + 2),
        r.getLong(i * 5 + 3), r.getBoolean(i * 5 + 4))
    }
    (out, r.getDouble(20), r.getDouble(21))
  }

  test("interpolation corners: interior pixel") {
    val (cs, fx, fy) = corners(1, 1, 100.3, 200.7, 2, 512)
    assert(math.abs(fx - 0.3) < 1e-9 && math.abs(fy - 0.7) < 1e-9)
    assert(cs(0) === ((1L, 1L, 100L, 200L, true)))
    assert(cs(1) === ((1L, 1L, 101L, 200L, true)))
    assert(cs(2) === ((1L, 1L, 100L, 201L, true)))
    assert(cs(3) === ((1L, 1L, 101L, 201L, true)))
  }

  test("interpolation corners: right-edge wrap to next tile") {
    val (cs, fx, fy) = corners(1, 1, 511.5, 100.0, 2, 512)
    assert(math.abs(fx - 0.5) < 1e-9 && fy === 0.0)
    assert(cs(0) === ((1L, 1L, 511L, 100L, true)))
    assert(cs(1) === ((2L, 1L, 0L, 100L, true)))
    assert(cs(3) === ((2L, 1L, 0L, 101L, true)))
  }

  test("interpolation corners: bottom wrap and both-axis wrap") {
    val (cs, _, _) = corners(1, 1, 511.5, 511.5, 2, 512)
    assert(cs(0) === ((1L, 1L, 511L, 511L, true)))
    assert(cs(1) === ((2L, 1L, 0L, 511L, true)))
    assert(cs(2) === ((1L, 2L, 511L, 0L, true)))
    assert(cs(3) === ((2L, 2L, 0L, 0L, true)))
  }

  test("interpolation corners: antimeridian x wrap") {
    val (cs, _, _) = corners(3, 1, 511.5, 100.0, 2, 512)
    assert(cs(1)._1 === 0L && cs(3)._1 === 0L && cs(1)._3 === 0L)
  }

  test("interpolation corners: bottom world boundary is out-of-world") {
    val (cs, _, _) = corners(1, 3, 100.0, 511.5, 2, 512)
    assert(cs(0)._5 && cs(1)._5)
    assert(!cs(2)._5 && !cs(3)._5)
  }

  test("bilinear goldens") {
    def bl(e00: Double, e10: Double, e01: Double, e11: Double,
        fx: Double, fy: Double): Double =
      Seq(1).toDF("i").select(TerrainTiles.bilinear(lit(e00), lit(e10),
        lit(e01), lit(e11), lit(fx), lit(fy)).as("b")).head().getDouble(0)
    assert(bl(100, 200, 300, 400, 0, 0) === 100.0)
    assert(bl(100, 200, 300, 400, 1, 0) === 200.0)
    assert(bl(100, 200, 300, 400, 0, 1) === 300.0)
    assert(bl(100, 200, 300, 400, 1, 1) === 400.0)
    assert(math.abs(bl(0, 10, 0, 10, 0.5, 0) - 5) < 1e-9)
    assert(math.abs(bl(0, 10, 20, 30, 0, 0.5) - 10) < 1e-9)
    assert(math.abs(bl(50, 50, 50, 50, 0.3, 0.7) - 50) < 1e-9)
    assert(math.abs(bl(0, 10, 20, 30, 0.5, 0.5) - 15) < 1e-9)
  }

  test("end-to-end lookup: zoom fallback and world-edge null") {
    val tiles = TerrainTiles.synthTiles(spark, Seq(1, 0), 8)
    // z1 gap rule (x+y)%3==0 → tile (0,0) missing, (1,0)/(0,1)/(1,1)
    // present; z0 (coarsest) complete.
    val pts = Seq(
      (1L, -90.0, 10.0),  // west hemisphere north → z1 tile (0,0) missing → z0
      (2L, 90.0, 10.0),   // east hemisphere north → z1 tile (1,0) present
      (3L, 0.0, -86.5),   // below world edge → null at every zoom
      (4L, -90.0, -10.0)  // z1 tile (0,1) present
    ).toDF("id", "lon", "lat")
    val out = TerrainTiles.elevationAtPoints(pts, tiles, Seq(1, 0), 8,
      "mapbox").orderBy("id").collect()
    assert(out(0).getInt(1) === 0) // fell back
    assert(out(1).getInt(1) === 1)
    assert(out(2).isNullAt(1) && out(2).isNullAt(4))
    assert(out(3).getInt(1) === 1)
    // spot-check one decoded value against the synthetic pixel function
    val r2 = out(1)
    assert(!r2.isNullAt(4) && r2.getDouble(4) > -10000.0
      && r2.getDouble(4) < 10000.0)
  }
}
