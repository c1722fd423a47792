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
