package graft

import graft.functions.HilbertExpr
import org.apache.spark.sql.functions._

/** The Hilbert layout kernel: bijection + unit-step adjacency of the
  * scalar curve, SQL-function parity with the expression, and the
  * locality claim the operator exists for — Hilbert ordering jumps
  * strictly less than Morton on the real audit query.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("xy2d/d2xy are inverse bijections on random cells") {
    val rnd = new scala.util.Random(99)
    (1 to 50000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      assert(HilbertExpr.d2xy(HilbertExpr.xy2d(x, y)) == ((x, y)))
    }
  }

  test("consecutive curve positions are grid-adjacent (unit steps)") {
    val rnd = new scala.util.Random(7)
    (1 to 50000).foreach { _ =>
      val d = math.abs(rnd.nextLong()) % (65536L * 65536L - 1)
      val (x1, y1) = HilbertExpr.d2xy(d)
      val (x2, y2) = HilbertExpr.d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
    // corners: first and last positions of the full curve
    assert(HilbertExpr.xy2d(0L, 0L) == 0L)
    assert(HilbertExpr.d2xy(65536L * 65536L - 1)._2 == 0L,
      "order-16 curve must end on the y=0 edge")
  }

  test("graft_hilbert_d SQL function matches the scalar kernel") {
    GraftExtensions.register(spark)
    val rows = (1L to 500L).map { i =>
      (i, (i * 7919) % 65536, (i * 104729) % 65536)
    }
    rows.toDF("id", "x", "y").createOrReplaceTempView("graft_hil_pts")
    val got = spark.sql(
      "SELECT id, graft_hilbert_d(x, y) AS d FROM graft_hil_pts")
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (i, x, y) =>
      assert(got(i) == HilbertExpr.xy2d(x, y))
    }
  }

  test("hilbertRangesForBbox: exact cover pre-budget, sound post-merge") {
    import graft.operators.SpatialLayout
    val rnd = new scala.util.Random(41)
    (1 to 40).foreach { _ =>
      val x0 = rnd.nextInt(60000); val y0 = rnd.nextInt(60000)
      val x1 = math.min(65535, x0 + rnd.nextInt(3000))
      val y1 = math.min(65535, y0 + rnd.nextInt(3000))
      // exact cover: generous budget so no lossy merging happens
      val exact = SpatialLayout
        .hilbertRangesForBbox(x0, x1, y0, y1, maxRanges = 100000)
      def in(d: Long) = exact.exists(r => d >= r._1 && d <= r._2)
      // inside points are covered
      (1 to 200).foreach { _ =>
        val x = x0 + rnd.nextInt(x1 - x0 + 1)
        val y = y0 + rnd.nextInt(y1 - y0 + 1)
        assert(in(HilbertExpr.xy2d(x, y)), s"missed ($x,$y)")
      }
      // outside points are NOT covered by the exact (unmerged) set
      (1 to 200).foreach { _ =>
        val x = rnd.nextInt(65536); val y = rnd.nextInt(65536)
        if (x < x0 || x > x1 || y < y0 || y > y1)
          assert(!in(HilbertExpr.xy2d(x, y)),
            s"exact cover leaked ($x,$y)")
      }
      // budget merge stays a superset (sound pruning)
      val budget = SpatialLayout
        .hilbertRangesForBbox(x0, x1, y0, y1, maxRanges = 16)
      assert(budget.size <= 16)
      (1 to 100).foreach { _ =>
        val x = x0 + rnd.nextInt(x1 - x0 + 1)
        val y = y0 + rnd.nextInt(y1 - y0 + 1)
        val d = HilbertExpr.xy2d(x, y)
        assert(budget.exists(r => d >= r._1 && d <= r._2))
      }
    }
  }

  test("hilbert cover needs no more ranges than morton at equal budget") {
    import graft.operators.SpatialLayout
    val rnd = new scala.util.Random(17)
    var hTot = 0; var mTot = 0
    (1 to 60).foreach { _ =>
      val x0 = rnd.nextInt(60000); val y0 = rnd.nextInt(60000)
      val x1 = math.min(65535, x0 + 100 + rnd.nextInt(4000))
      val y1 = math.min(65535, y0 + 100 + rnd.nextInt(4000))
      hTot += SpatialLayout
        .hilbertRangesForBbox(x0, x1, y0, y1, maxRanges = 100000).size
      mTot += SpatialLayout
        .zRangesForBbox(x0, x1, y0, y1, maxRanges = 100000).size
    }
    assert(hTot < mTot,
      s"hilbert exact covers should coalesce more: h=$hTot m=$mTot")
  }

  test("hilbert ordering jumps less than morton on the audit query") {
    val out = SparkEntry.queries("q_spatial_hilbert")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4))).toMap
    val (hTotal, hMean) = out("hilbert")
    val (mTotal, mMean) = out("morton")
    assert(hTotal < mTotal && hMean < mMean,
      s"hilbert must be more local: h=($hTotal,$hMean) m=($mTotal,$mMean)")
  }
}
