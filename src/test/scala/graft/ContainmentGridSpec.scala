package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

/** Differential test of the hole-aware even-odd containment kernel:
  * every point of a dense grid is classified by `pointInRings` (the
  * Spark column expression) and by an independent scalar ray-cast
  * implementation below; the two must agree everywhere — including on
  * the non-convex outer boundary region and inside the hole. One
  * Spark job for the whole grid.
  */
class ContainmentGridSpec extends SparkSpec {
  import spark.implicits._

  // Non-convex (L-shaped) outer ring + square hole in its lower arm.
  private val outer: Seq[(Double, Double)] = Seq(
    (0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0),
    (4.0, 10.0), (0.0, 10.0))
  private val hole: Seq[(Double, Double)] = Seq(
    (6.0, 1.0), (8.0, 1.0), (8.0, 3.0), (6.0, 3.0))

  /** Independent scalar even-odd ray cast (same half-open rule). */
  private def inRing(px: Double, py: Double,
      ring: Seq[(Double, Double)]): Boolean = {
    var in = false
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      if ((y1 > py) != (y2 > py) &&
        px < (x2 - x1) * (py - y1) / (y2 - y1) + x1) in = !in
      i += 1
    }
    in
  }

  private def expected(px: Double, py: Double): Boolean =
    inRing(px, py, outer) ^ inRing(px, py, hole)

  test("pointInRings agrees with an independent ray cast on a dense grid") {
    // Offset by 0.05 so no grid point sits exactly on an edge (the
    // half-open boundary rule is representation-dependent there).
    val pts = for {
      ix <- 0 until 45; iy <- 0 until 45
    } yield (ix * 0.25 + 0.05, iy * 0.25 + 0.05)
    val ringsCol = typedLit(Seq(
      outer.map(p => Seq(p._1, p._2)),
      hole.map(p => Seq(p._1, p._2))))
    val got = pts.toDF("px", "py")
      .select(col("px"), col("py"),
        GeoFunctions.pointInRings(col("px"), col("py"), ringsCol).as("in"))
      .collect()
      .map(r => ((r.getDouble(0), r.getDouble(1)), r.getBoolean(2)))
      .toMap
    var inside = 0
    pts.foreach { case (px, py) =>
      assert(got((px, py)) == expected(px, py), s"disagree at ($px,$py)")
      if (expected(px, py)) inside += 1
    }
    // the grid actually exercises all three regions
    assert(inside > 100 && inside < pts.size)
    assert(!got((6.55, 1.55))) // a point inside the hole is OUT
    assert(got((5.05, 0.55)))  // lower arm, outside the hole: IN
    assert(!got((8.05, 8.05))) // the notch of the L: OUT
  }
}
