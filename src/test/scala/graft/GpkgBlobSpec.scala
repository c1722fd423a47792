package graft

import org.apache.spark.sql.functions._

/** Byte-level proof for the GeoPackage geometry encoder: parse the
  * GP header, envelope and WKB back from the emitted blobs and check
  * them against the row's own lon/lat source values.
  */
class GpkgBlobSpec extends SparkSpec {

  private final class R(b: Array[Byte]) {
    val bb: java.nio.ByteBuffer = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def u8(): Int = bb.get() & 0xff
    def i32(): Int = bb.getInt()
    def f64(): Double = bb.getDouble()
  }

  private case class Gpkg(srid: Int, env: (Double, Double, Double, Double),
      wkbType: Int, parts: Seq[Seq[Seq[(Double, Double)]]])

  private def parse(b: Array[Byte]): Gpkg = {
    val r = new R(b)
    assert(r.u8() === 'G'.toInt && r.u8() === 'P'.toInt, "magic")
    assert(r.u8() === 0, "version")
    assert(r.u8() === 0x03, "flags: little-endian + XY envelope")
    val srid = r.i32()
    val env = (r.f64(), r.f64(), r.f64(), r.f64())
    def readSingle(): (Int, Seq[Seq[(Double, Double)]]) = {
      assert(r.u8() === 1, "wkb little-endian")
      val t = r.i32()
      val rings = t match {
        case 1 => Seq(Seq((r.f64(), r.f64())))
        case 2 => Seq(Seq.fill(r.i32())((r.f64(), r.f64())))
        case 3 => Seq.fill(r.i32())(Seq.fill(r.i32())((r.f64(), r.f64())))
      }
      (t, rings)
    }
    val pos = r.bb.position()
    assert(r.u8() === 1); val outer = r.i32()
    val g =
      if (outer <= 3) { r.bb.position(pos); val (t, rr) = readSingle(); Gpkg(srid, env, t, Seq(rr)) }
      else {
        val n = r.i32()
        val parts = Seq.fill(n) {
          val (t, rr) = readSingle()
          assert(t === outer - 3, "member type matches Multi* type")
          rr
        }
        Gpkg(srid, env, outer, parts)
      }
    assert(!r.bb.hasRemaining, "no trailing bytes")
    g
  }

  private def allPts(g: Gpkg): Seq[(Double, Double)] =
    g.parts.flatten.flatten

  test("blobs parse: header, srid, envelope, ring closure, sizes") {
    val rows = operators.GeoPackage.gpkgGeoms(spark, sf).collect()
    assert(rows.nonEmpty)
    val seenTypes = scala.collection.mutable.Set[Int]()
    for (row <- rows) {
      val wkbType = row.getInt(2)
      val g0 = row.getStruct(3)
      val blob = g0.getAs[Array[Byte]]("blob")
      val g = parse(blob)
      assert(g.srid === 4326)
      assert(g.wkbType === wkbType)
      seenTypes += wkbType
      // rings are closed on the wire; input n_points excludes closure
      val declared = g0.getInt(1)
      val wirePts = allPts(g).length
      val nRings = if (wkbType == 3 || wkbType == 6) g.parts.map(_.size).sum
        else 0
      assert(wirePts === declared + nRings,
        s"wire=$wirePts declared=$declared rings=$nRings")
      if (nRings > 0)
        g.parts.foreach(_.foreach(ring =>
          assert(ring.head === ring.last, "closed ring")))
      // envelope equals min/max over wire points and the struct copy
      val xs = allPts(g).map(_._1)
      val ys = allPts(g).map(_._2)
      assert(g.env === ((xs.min, xs.max, ys.min, ys.max)))
      assert(g.env === ((g0.getDouble(2), g0.getDouble(3),
        g0.getDouble(4), g0.getDouble(5))))
    }
    assert(seenTypes === Set(1, 2, 3, 6),
      "all of Point/LineString/Polygon/MultiPolygon exercised")
  }

  test("kernel encodes MultiPoint and MultiLineString too") {
    import graft.functions.GpkgGeomExpr.gpkgGeom
    val df = spark.range(1).select(
      gpkgGeom(lit(4), array(
        array(array(struct(lit(1.5).as("lon"), lit(2.5).as("lat")))),
        array(array(struct(lit(-3.0).as("lon"), lit(4.0).as("lat"))))))
        .as("mp"),
      gpkgGeom(lit(5), array(
        array(array(struct(lit(0.0).as("lon"), lit(0.0).as("lat")),
          struct(lit(1.0).as("lon"), lit(1.0).as("lat")))),
        array(array(struct(lit(2.0).as("lon"), lit(2.0).as("lat")),
          struct(lit(3.0).as("lon"), lit(4.0).as("lat"))))))
        .as("ml"))
    val r = df.head
    val mp = parse(r.getStruct(0).getAs[Array[Byte]]("blob"))
    assert(mp.wkbType === 4)
    assert(allPts(mp) === Seq((1.5, 2.5), (-3.0, 4.0)))
    assert(mp.env === ((-3.0, 1.5, 2.5, 4.0)))
    val ml = parse(r.getStruct(1).getAs[Array[Byte]]("blob"))
    assert(ml.wkbType === 5)
    assert(ml.parts.map(_.head.size) === Seq(2, 2))
    assert(ml.env === ((0.0, 3.0, 0.0, 4.0)))
  }

  test("blob length matches the WKB wire-size arithmetic") {
    val rows = operators.GeoPackage.gpkgGeoms(spark, sf)
      .select(col("wkb_type"), col("g")("blob").as("blob"),
        col("g")("n_points").as("np"))
      .collect()
    for (row <- rows) {
      val g = parse(row.getAs[Array[Byte]]("blob"))
      val np = row.getInt(2)
      val expected = g.wkbType match {
        case 1 => 40 + 21
        case 2 => 40 + 9 + 16 * np
        case 3 => 40 + 13 + 16 * (np + 1)
        case 6 => 40 + 9 +
          g.parts.map(p => 13 + 16 * p.head.size).sum
      }
      assert(row.getAs[Array[Byte]]("blob").length === expected)
    }
  }
}
