package graft

import graft.functions.GeoFunctions._
import org.apache.spark.sql.functions._

class GeoFunctionsSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Double = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.cast("double")).collect().head.getDouble(0)
  }

  test("haversine of 1 degree latitude ≈ 111.195 km") {
    val d = eval1(haversineM(lit(0.0), lit(0.0), lit(0.0), lit(1.0)))
    assert(math.abs(d - math.Pi * EarthRadiusM / 180.0) < 1e-6)
  }

  test("haversine is symmetric and zero at identity") {
    val a = eval1(haversineM(lit(10.0), lit(45.0), lit(11.0), lit(46.0)))
    val b = eval1(haversineM(lit(11.0), lit(46.0), lit(10.0), lit(45.0)))
    assert(a == b)
    assert(eval1(haversineM(lit(10.0), lit(45.0), lit(10.0), lit(45.0))) == 0.0)
  }

  test("lineLengthM sums segments; degenerate lines are 0") {
    import spark.implicits._
    val df = Seq(
      Seq(Seq(0.0, 0.0), Seq(0.0, 1.0), Seq(0.0, 2.0)),
      Seq(Seq(5.0, 5.0))).toDF("coords")
      .select(lineLengthM(col("coords")).as("len"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 2 * math.Pi * EarthRadiusM / 180.0) < 1e-5)
    assert(got(1) == 0.0)
  }

  test("centroid is the vertex average") {
    import spark.implicits._
    val df = Seq(Seq(Seq(0.0, 0.0), Seq(2.0, 4.0))).toDF("coords")
      .select(centroid(col("coords")).as("c"))
      .select(col("c.lon"), col("c.lat"))
    val r = df.collect().head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 2.0)
  }

  test("viirs pixel: equator/prime-meridian lands in tile (18,8) top row") {
    import spark.implicits._
    // lat slightly >0 → just above the v=9 boundary → tile row 8
    val df = Seq(1).toDF("x")
      .select(viirsPixel(lit(0.0001), lit(0.0001)).as("p"))
      .select(col("p.h"), col("p.v"), col("p.px"), col("p.py"))
    val r = df.collect().head
    assert(r.getInt(0) == 18 && r.getInt(1) == 8)
    assert(r.getInt(2) >= 0 && r.getInt(2) < 3000)
    assert(r.getInt(3) >= 0 && r.getInt(3) < 3000)
  }

  test("grid cell floors negative coordinates correctly") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
      .select(gridCell(lit(-0.001), lit(0.001), 0.01).as("c"))
      .select(col("c.cx"), col("c.cy"))
    val r = df.collect().head
    assert(r.getLong(0) == -1L && r.getLong(1) == 0L)
  }

  test("profilePointCount: every 25 m plus endpoints, min 2") {
    import spark.implicits._
    val df = Seq(0.0, 10.0, 60.0, 250.0).toDF("len")
      .select(profilePointCount(col("len"), 25.0).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 2L, 4L, 12L))
  }

  test("pointInPolygon: ray cast handles convex and concave rings") {
    import spark.implicits._
    // C-shape: notch interior points are OUTSIDE
    val c = Seq(Seq(0.0, 0.0), Seq(3.0, 0.0), Seq(3.0, 1.0), Seq(1.0, 1.0),
      Seq(1.0, 2.0), Seq(3.0, 2.0), Seq(3.0, 3.0), Seq(0.0, 3.0))
    val df = Seq(
      (0.5, 0.5, true),   // inside left arm
      (2.0, 1.5, false),  // in the notch
      (2.0, 0.5, true),   // bottom arm
      (5.0, 5.0, false))  // far outside
      .toDF("px", "py", "want")
      .withColumn("got", graft.functions.GeoFunctions.pointInPolygon(
        col("px"), col("py"), typedLit(c)))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
  }

  test("nearestPointOnLine snaps onto the segment with clamping") {
    import spark.implicits._
    val line = Seq(Seq(0.0, 0.0), Seq(1.0, 0.0))
    val df = Seq((0.5, 0.1), (-1.0, 0.0), (2.0, 0.5)).toDF("px", "py")
      .withColumn("np", graft.functions.GeoFunctions.nearestPointOnLine(
        col("px"), col("py"), typedLit(line)))
      .select(col("np.lon"), col("np.lat"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.5) < 1e-9
      && math.abs(rows(0).getDouble(1)) < 1e-9)
    assert(rows(1).getDouble(0) == 0.0) // clamped to start
    assert(rows(2).getDouble(0) == 1.0) // clamped to end
  }

  test("geohash6 matches the canonical geohash") {
    import spark.implicits._
    // well-known reference: geohash(57.64911 N, 10.40744 E) = u4pruydqqvj
    val df = Seq((10.40744, 57.64911), (-5.6, -70.2)).toDF("lon", "lat")
      .select(graft.functions.GeoFunctions.geohash6(col("lon"), col("lat")))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got.head == "u4pruy")
    assert(got(1).length == 6)
  }

  test("profileHeights interpolates along segments and appends endpoint") {
    import spark.implicits._
    // ~111.2 km of latitude, z 0 -> 1000; 25 km resolution
    val line = Seq(Seq(0.0, 0.0, 0.0), Seq(0.0, 1.0, 1000.0))
    val df = Seq(1).toDF("x")
      .select(graft.functions.GeoFunctions.profileHeights(
        typedLit(line), 25000.0).as("hs"))
    val hs = df.collect().head.getSeq[Double](0)
    assert(hs.length == 6) // floor(111.19/25)+1 samples + endpoint
    assert(hs.head == 0.0 && hs.last == 1000.0)
    assert(hs(1) > 200 && hs(1) < 250) // ~224.9 at 25 km of ~111.19
  }

  // ---- P12/J6 validity: one case per invalid class ----
  private def ringCase(ring: Seq[Seq[Double]]): (Boolean, Boolean) = {
    import spark.implicits._
    val df = Seq(1).toDF("x")
      .select(force2D(typedLit(ring)).as("c2"))
      .select(ringValid(col("c2")).as("raw"),
        ringValid(closeRing(col("c2"))).as("rep"))
    val r = df.collect().head
    (r.getBoolean(0), r.getBoolean(1))
  }

  test("unclosed ring is invalid and close-ring repair fixes it") {
    val (raw, rep) = ringCase(Seq(
      Seq(0.0, 0.0, 5.0), Seq(1.0, 0.0, 6.0), Seq(1.0, 1.0, 7.0),
      Seq(0.0, 1.0, 8.0)))
    assert(!raw && rep)
  }

  test("closed 5-point ring is valid as-is (3D z ignored by force2D)") {
    val (raw, rep) = ringCase(Seq(
      Seq(0.0, 0.0, 5.0), Seq(1.0, 0.0, 6.0), Seq(1.0, 1.0, 7.0),
      Seq(0.0, 1.0, 8.0), Seq(0.0, 0.0, 9.0)))
    assert(raw && rep)
  }

  test("too-short ring stays invalid after repair (<4 points closed)") {
    val (raw, rep) = ringCase(Seq(Seq(0.0, 0.0), Seq(1.0, 0.0)))
    assert(!raw && !rep)
  }

  test("out-of-range longitude stays invalid after repair") {
    val (raw, rep) = ringCase(Seq(
      Seq(400.0, 0.0), Seq(401.0, 0.0), Seq(401.0, 1.0), Seq(400.0, 1.0),
      Seq(400.0, 0.0)))
    assert(!raw && !rep)
  }

  test("out-of-range latitude is invalid") {
    val (raw, rep) = ringCase(Seq(
      Seq(0.0, 91.0), Seq(1.0, 91.0), Seq(1.0, 92.0), Seq(0.0, 92.0),
      Seq(0.0, 91.0)))
    assert(!raw && !rep)
  }

  test("viewportHint matches the reference's 2D snapshot numbers") {
    import spark.implicits._
    // RunFormatter.unit.test.ts:67-73 — a (0,0)→(1,1) 2D line:
    // bearing null, center [0.5, 0.5], minCameraY -55660,
    // rotatedHeightMeters 111320, rotatedWidthMeters 111315.76127550355
    val line = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val r = Seq(1).toDF("x")
      .select(viewportHint(typedLit(line)).as("h")).select("h.*")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("bearing")))
    assert(r.getDouble(r.fieldIndex("center_lon")) == 0.5)
    assert(r.getDouble(r.fieldIndex("center_lat")) == 0.5)
    assert(r.getDouble(r.fieldIndex("min_camera_y")) == -55660.0)
    assert(r.getDouble(r.fieldIndex("rotated_height_m")) == 111320.0)
    assert(math.abs(r.getDouble(r.fieldIndex("rotated_width_m"))
      - 111315.76127550355) < 1e-6)
  }

  test("viewportHint bearing follows the downhill z-gradient") {
    import spark.implicits._
    def bearingOf(line: Seq[Seq[Double]]): Option[Double] = {
      val r = Seq(1).toDF("x")
        .select(viewportHint(typedLit(line)).as("h"))
        .select("h.bearing").collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    // descending toward north → bearing 0; toward south → 180
    assert(bearingOf(Seq(Seq(0.0, 0.0, 1000.0), Seq(0.0, 1.0, 0.0)))
      .contains(0.0))
    assert(bearingOf(Seq(Seq(0.0, 1.0, 1000.0), Seq(0.0, 0.0, 0.0)))
      .contains(180.0))
    // descending toward east → 90
    assert(bearingOf(Seq(Seq(0.0, 0.0, 500.0), Seq(1.0, 0.0, 0.0)))
      .contains(90.0))
    // flat 3D → null (zero gradient)
    assert(bearingOf(Seq(Seq(0.0, 0.0, 100.0), Seq(1.0, 0.0, 100.0)))
      .isEmpty)
  }

  test("LineLengthMExpr interpreted eval matches the column result") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val coords = ArrayData.toArrayData(Array(
      ArrayData.toArrayData(Array(0.0, 0.0)),
      ArrayData.toArrayData(Array(0.0, 1.0)),
      ArrayData.toArrayData(Array(0.0, 2.0))))
    val got = graft.functions.GeoKernels.lineLengthM(coords)
    assert(math.abs(got - 2 * math.Pi * EarthRadiusM / 180.0) < 1e-5)
    // degenerate + singleton
    assert(graft.functions.GeoKernels.lineLengthM(
      ArrayData.toArrayData(Array(ArrayData.toArrayData(Array(5.0, 5.0)))))
      == 0.0)
  }

  test("pointInRings: holes exclude, disjoint second part includes") {
    import spark.implicits._
    // part 0: square (0,0)-(4,4) with hole (1,1)-(2,2); part 1: (10,0)-(14,4)
    val rings = Seq(
      Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(0.0, 4.0)),
      Seq(Seq(1.0, 1.0), Seq(2.0, 1.0), Seq(2.0, 2.0), Seq(1.0, 2.0)),
      Seq(Seq(10.0, 0.0), Seq(14.0, 0.0), Seq(14.0, 4.0), Seq(10.0, 4.0)))
    val cases = Seq(
      (3.0, 3.0, true),   // part 0, outside hole
      (1.5, 1.5, false),  // inside the hole → excluded
      (7.0, 2.0, false),  // gap between parts
      (12.0, 2.0, true),  // second part
      (20.0, 2.0, false)) // outside everything
    val got = cases.toDF("px", "py", "want")
      .select(pointInRings(col("px"), col("py"),
        typedLit(rings)).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("viewportHint degrades on a single-point geometry (no throw)") {
    import spark.implicits._
    // regression: sequence(1, size-1) on one point is sequence(1, 0)
    // = [1, 0] and element_at(coords, 0) threw
    val r = Seq(1).toDF("x")
      .select(viewportHint(typedLit(Seq(Seq(7.0, 46.0, 1200.0)))).as("h"))
      .select("h.*").collect().head
    assert(r.isNullAt(r.fieldIndex("bearing")))
    assert(r.getDouble(r.fieldIndex("center_lon")) == 7.0)
    assert(r.getDouble(r.fieldIndex("center_lat")) == 46.0)
    assert(r.getDouble(r.fieldIndex("rotated_height_m")) == 0.0)
    assert(r.getDouble(r.fieldIndex("rotated_width_m")) == 0.0)
  }

  test("lineLengthM skips null / degenerate points instead of NPE") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val clean = graft.functions.GeoKernels.lineLengthM(
      ArrayData.toArrayData(Array(
        ArrayData.toArrayData(Array(0.0, 0.0)),
        ArrayData.toArrayData(Array(0.0, 1.0)))))
    val withNull = graft.functions.GeoKernels.lineLengthM(
      ArrayData.toArrayData(Array(
        ArrayData.toArrayData(Array(0.0, 0.0)),
        null,
        ArrayData.toArrayData(Array(0.5)), // degenerate: 1 ordinate
        ArrayData.toArrayData(Array(0.0, 1.0)))))
    assert(withNull == clean)
    // the column path over a nullable element survives too
    import spark.implicits._
    val got = Seq(Seq(Some(Seq(0.0, 0.0)), None, Some(Seq(0.0, 1.0))))
      .toDF("coords")
      .select(lineLengthM(col("coords"))).collect().head.getDouble(0)
    assert(got == clean)
  }

  test("vector dot treats null elements as 0 instead of NPE") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array[Any](1.0, null, 3.0))
    val b = ArrayData.toArrayData(Array[Any](2.0, 5.0, null))
    assert(graft.functions.VectorKernels.dot(a, b) == 2.0)
    import spark.implicits._
    val got = Seq((Seq(Some(1.0), None, Some(3.0)),
        Seq(Some(2.0), Some(5.0), None)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.dot(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(got == 2.0)
  }

  test("lineValid requires >=2 in-range positions; force2D drops z") {
    import spark.implicits._
    val df = Seq(
      (Seq(Seq(0.0, 0.0, 3.0), Seq(1.0, 1.0, 4.0)), true),
      (Seq(Seq(0.0, 0.0, 3.0)), false),
      (Seq(Seq(200.0, 0.0), Seq(201.0, 0.0)), false))
      .toDF("coords", "expect")
      .select(lineValid(force2D(col("coords"))).as("got"), col("expect"),
        array_max(transform(force2D(col("coords")), p => size(p)))
          .as("arity"))
    df.collect().foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(1))
      assert(r.getInt(2) == 2)
    }
  }
}
