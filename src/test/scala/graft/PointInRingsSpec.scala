package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** The native containment kernels must be bit-identical to the
  * replaced interpreted folds — same crossing op order, same 1-based
  * wrap, same null-edge/null-ring skip algebra, same even-odd parity
  * across hole rings.
  */
class PointInRingsSpec extends SparkSpec {

  // the REPLACED folds, verbatim, as the comparison oracle
  private def foldInPolygon(px: Column, py: Column, ring: Column): Column =
    aggregate(
      sequence(lit(1), size(ring)),
      lit(false),
      (acc, i) => {
        val v1 = element_at(ring, i)
        val v2 = element_at(ring, pmod(i, size(ring)) + 1)
        val x1 = element_at(v1, 1); val y1 = element_at(v1, 2)
        val x2 = element_at(v2, 1); val y2 = element_at(v2, 2)
        val crosses = ((y1 > py) =!= (y2 > py)) &&
          (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
        when(crosses, !acc).otherwise(acc)
      })
  private def foldInRings(px: Column, py: Column, rings: Column): Column =
    aggregate(rings, lit(false), (acc, ring) =>
      when(foldInPolygon(px, py, ring), !acc).otherwise(acc))

  private val square = Seq(Seq(0.0, 0.0), Seq(4.0, 0.0),
    Seq(4.0, 4.0), Seq(0.0, 4.0))
  private val hole = Seq(Seq(1.0, 1.0), Seq(3.0, 1.0),
    Seq(3.0, 3.0), Seq(1.0, 3.0))
  private val triangle = Seq(Seq(-2.0, -1.0), Seq(2.0, -1.0), Seq(0.0, 2.5))

  test("single ring: kernel equals the fold on a point grid") {
    import spark.implicits._
    val pts = for (x <- -1 to 5; y <- -1 to 5)
      yield (x + 0.25, y + 0.25)
    val df = pts.toDF("px", "py")
      .withColumn("ring", typedLit(square))
      .union(pts.toDF("px", "py").withColumn("ring", typedLit(triangle)))
      .withColumn("k", GeoFunctions.pointInPolygon(
        col("px"), col("py"), col("ring")))
      .withColumn("f", foldInPolygon(col("px"), col("py"), col("ring")))
    val bad = df.filter(col("k") =!= col("f")).count()
    assert(bad == 0, s"$bad grid points disagree")
  }

  test("ring set with hole: parity matches, boundary-ish included") {
    import spark.implicits._
    val pts = Seq((0.5, 0.5), (2.0, 2.0), (3.5, 2.0), (2.0, 0.5),
      (4.0, 4.0), (0.0, 2.0), (1.0, 2.0), (3.0, 3.0), (-0.1, 2.0))
    val df = pts.toDF("px", "py")
      .withColumn("rings", typedLit(Seq(square, hole)))
      .withColumn("k", GeoFunctions.pointInRings(
        col("px"), col("py"), col("rings")))
      .withColumn("f", foldInRings(col("px"), col("py"), col("rings")))
    df.collect().foreach { r =>
      assert(r.getBoolean(3) == r.getBoolean(4),
        s"parity mismatch at (${r.getDouble(0)}, ${r.getDouble(1)})")
    }
    // sanity anchors, not just self-consistency
    val m = df.collect().map(r =>
      (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(3)).toMap
    assert(m((0.5, 0.5)))       // in outer, outside hole
    assert(!m((2.0, 2.0)))      // inside the hole → out
    assert(m((3.5, 2.0)))       // between hole and outer
    assert(!m((-0.1, 2.0)))     // outside
  }

  test("degenerate edges: horizontal segments and null vertices") {
    import spark.implicits._
    // horizontal edge (y1 == y2 → division by zero in the crossing
    // expression; IEEE Inf semantics must match) and a null vertex —
    // the fold skips both edge classes
    val rows = Seq(
      (1.0, 0.5, Seq(Seq(0.0, 0.0), Seq(2.0, 0.0), Seq(2.0, 1.0),
        Seq(0.0, 1.0))),
      (1.0, 0.5, Seq(Seq(0.0, 0.0), null, Seq(2.0, 1.0), Seq(0.0, 1.0))))
    val df = rows.toDF("px", "py", "ring")
      .withColumn("k", GeoFunctions.pointInPolygon(
        col("px"), col("py"), col("ring")))
      .withColumn("f", foldInPolygon(col("px"), col("py"), col("ring")))
    df.collect().foreach { r =>
      assert(r.getBoolean(3) == r.getBoolean(4),
        s"degenerate mismatch on ring ${r.getSeq[Any](2)}")
    }
  }

  test("short vertex: kernel skips where the fold THREW") {
    import spark.implicits._
    // a 1-element vertex made the replaced fold raise
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT (element_at(v, 2) on a
    // 1-element array) — malformed geometry previously crashed the
    // query, so no green dataset can contain it; the kernel treats
    // the unreadable edge as missing, which can only be observed on
    // data the old code refused to process at all
    val rows = Seq((1.0, 0.5,
      Seq(Seq(0.0, 0.0), Seq(2.0), Seq(2.0, 1.0), Seq(0.0, 1.0))))
    val df = rows.toDF("px", "py", "ring")
      .withColumn("k", GeoFunctions.pointInPolygon(
        col("px"), col("py"), col("ring")))
    // both edges touching the short vertex are skipped; the two
    // remaining real edges don't cross at (1, 0.5) → false, not null,
    // not an exception
    val r = df.collect().head
    assert(!r.isNullAt(3) && !r.getBoolean(3))
  }

  test("null input propagates null like the replaced fold") {
    import spark.implicits._
    val df = Seq((Option.empty[Double], Some(1.0)),
        (Some(1.0), Option.empty[Double]))
      .toDF("px", "py")
      .withColumn("ring", typedLit(square))
      .withColumn("k", GeoFunctions.pointInPolygon(
        col("px"), col("py"), col("ring")))
    assert(df.collect().forall(_.isNullAt(3)))
  }
}
