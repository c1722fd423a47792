package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

/** Value-identity pin for the round-19 containment-join restructure:
  * `cellCandidates` now defaults to broadcasting the area side at its
  * anchor cell and exploding the RUN side over the ±reach cell
  * neighborhood (the pre-r19 shape exploded the AREA side and shuffled
  * both). The candidate (area, run) multiset must be identical in both
  * strategies — including multiplicity (MultiPart counts joined rows
  * without a dedup) and null-coordinate behavior.
  */
class CellCandidatesSpec extends SparkSpec {
  import spark.implicits._

  private val Cell = 0.01

  private def areasDf = Seq(
    // anchors in distinct cells, one shared cell, one far away
    (1L, 0.005, 0.005),
    (2L, 0.006, 0.004),  // same cell as area 1
    (3L, 0.025, 0.005),  // two cells right of area 1
    (4L, 5.0, 5.0)       // far from every run
  ).toDF("area_id", "alon", "alat")
    .withColumn("ring", array(array(col("alon"), col("alat"))))

  private def runsDf = Seq(
    (10L, Some(Seq(Seq(0.004, 0.004), Seq(0.0045, 0.0045)))), // cell (0,0)
    (11L, Some(Seq(Seq(0.015, 0.005)))),                      // cell (1,0)
    (12L, Some(Seq(Seq(0.045, 0.005)))),                      // cell (4,0)
    (13L, Some(Seq(Seq(-0.015, -0.015)))),                    // cell (-2,-2)
    (14L, None)                                               // null coords
  ).toDF("way_id", "coords")

  private def pairs(reach: Int, broadcastOn: Boolean): Seq[(Long, Long)] = {
    spark.conf.set("spark.graft.containment.broadcast",
      broadcastOn.toString)
    try Clustering.cellCandidates(areasDf, runsDf, Cell, reach)
      .select("area_id", "way_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    finally spark.conf.unset("spark.graft.containment.broadcast")
  }

  test("broadcast and exchange strategies produce the identical candidate multiset (reach=1)") {
    val b = pairs(1, broadcastOn = true)
    val e = pairs(1, broadcastOn = false)
    assert(b == e, s"broadcast=$b exchange=$e")
    // sanity: the shared-cell areas both pair with run 10 and 11;
    // the far area and the null/empty-coords runs never appear
    assert(b.contains((1L, 10L)) && b.contains((2L, 10L)) &&
      b.contains((1L, 11L)))
    assert(!b.exists(_._1 == 4L))
    assert(!b.exists(_._2 == 14L))
  }

  test("broadcast and exchange strategies produce the identical candidate multiset (reach=2)") {
    val b = pairs(2, broadcastOn = true)
    val e = pairs(2, broadcastOn = false)
    assert(b == e, s"broadcast=$b exchange=$e")
    // reach=2 picks up the two-cells-away pairs reach=1 misses
    assert(b.contains((3L, 10L)) && b.contains((3L, 12L)))
    assert(!b.contains((1L, 12L))) // 4 cells apart stays out
  }

  test("every candidate pair appears exactly once per strategy") {
    for (on <- Seq(true, false); reach <- Seq(1, 2)) {
      val p = pairs(reach, on)
      assert(p == p.distinct, s"duplicate candidates at reach=$reach broadcast=$on")
    }
  }
}
