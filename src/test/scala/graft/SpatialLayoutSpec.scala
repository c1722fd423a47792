package graft

import graft.operators.SpatialLayout
import org.apache.spark.sql.functions._

/** The Morton interleave must match an independent scalar bit-by-bit
  * reimplementation, be monotone per axis, and the layout helper must
  * produce disjoint, spatially-compact per-file z ranges.
  */
class SpatialLayoutSpec extends SparkSpec {

  // independent scalar reference: interleave bit i of x to 2i, y to 2i+1
  private def refMorton(x: Int, y: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1).toLong << (2 * i) |
        ((y >> i) & 1).toLong << (2 * i + 1)
    }

  test("mortonZ equals a scalar bit-loop reference") {
    import spark.implicits._
    val cells = (for {
      x <- 0 until 32; y <- 0 until 32
    } yield (x, y)) ++ Seq((35999, 17999), (65535, 65535), (0, 65535),
      (65535, 0), (12345, 54321))
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        SpatialLayout.mortonZ(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == refMorton(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)},${r.getInt(1)})")
    }
  }

  test("mortonZ is monotone in each axis (z-ranges are cell rectangles)") {
    import spark.implicits._
    val xs = (0 until 1000).map(i => (i * 37 % 65535, i * 101 % 65534))
    val rows = xs.toDF("x", "y").select(
      SpatialLayout.mortonZ(col("x"), col("y")).as("z"),
      SpatialLayout.mortonZ(col("x") + 1, col("y")).as("zx"),
      SpatialLayout.mortonZ(col("x"), col("y") + 1).as("zy")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(0) < r.getLong(2))
    }
  }

  test("zOrderLayout yields disjoint per-partition z ranges and keeps rows") {
    import spark.implicits._
    val df = (1 to 4000).map { i =>
      (i, graft.TestHash.h32(i.toString) % 36000,
        graft.TestHash.h32("lat:" + i) % 18000)
    }.toDF("id", "cx", "cy")
      .withColumn("z", SpatialLayout.mortonZ(col("cx"), col("cy")))
    val laid = SpatialLayout.zOrderLayout(df, col("z"), 8)
    assert(laid.count() == 4000)
    val ranges = laid
      .groupBy(spark_partition_id().as("p"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"file z-ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }

  test("zRangesForBbox covers exactly the bbox cells (exhaustive 64x64)") {
    // every cell in the bbox must fall in some range; with an
    // unlimited budget no cell OUTSIDE the bbox may be covered
    for ((x0, x1, y0, y1) <- Seq((3, 17, 5, 11), (0, 63, 7, 7),
        (10, 11, 0, 63), (0, 0, 0, 0), (1, 62, 1, 62))) {
      val ranges = SpatialLayout.zRangesForBbox(x0, x1, y0, y1,
        maxRanges = Int.MaxValue)
      def covered(z: Long) = ranges.exists(r => z >= r._1 && z <= r._2)
      for (x <- 0 until 64; y <- 0 until 64) {
        val in = x >= x0 && x <= x1 && y >= y0 && y <= y1
        assert(covered(SpatialLayout.mortonScalar(x, y)) == in,
          s"cell ($x,$y) bbox ($x0..$x1,$y0..$y1)")
      }
      // exact cover: ranges are sorted and non-overlapping
      ranges.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2)
        case _ =>
      }
    }
  }

  test("range budget merges keep the cover sound (superset, never subset)") {
    val exact = SpatialLayout.zRangesForBbox(3, 40, 5, 29,
      maxRanges = Int.MaxValue)
    val merged = SpatialLayout.zRangesForBbox(3, 40, 5, 29, maxRanges = 8)
    assert(merged.size <= 8 && exact.size > merged.size)
    def covered(rs: Seq[(Long, Long)], z: Long) =
      rs.exists(r => z >= r._1 && z <= r._2)
    for (x <- 3 to 40; y <- 5 to 29)
      assert(covered(merged, SpatialLayout.mortonScalar(x, y)))
  }

  test("z-range predicate + cell refine equals the plain bbox filter") {
    import spark.implicits._
    val df = (1 to 4000).map { i =>
      (i, graft.TestHash.h32(i.toString) % 64,
        graft.TestHash.h32("lat:" + i) % 64)
    }.toDF("id", "cx", "cy")
      .withColumn("z", SpatialLayout.mortonZ(col("cx"), col("cy")))
    val (x0, x1, y0, y1) = (5, 37, 11, 52)
    val ranges = SpatialLayout.zRangesForBbox(x0, x1, y0, y1, maxRanges = 8)
    val viaZ = df.filter(SpatialLayout.zRangePredicate(col("z"), ranges)
        && col("cx").between(x0, x1) && col("cy").between(y0, y1))
      .select("id").collect().map(_.getInt(0)).sorted
    val direct = df.filter(col("cx").between(x0, x1)
        && col("cy").between(y0, y1))
      .select("id").collect().map(_.getInt(0)).sorted
    assert(viaZ.toSeq == direct.toSeq && direct.nonEmpty)
  }

  test("z-sorted files are spatially more compact than insert-order files") {
    import spark.implicits._
    val df = (1 to 4000).map { i =>
      (i, graft.TestHash.h32(i.toString) % 36000,
        graft.TestHash.h32("lat:" + i) % 18000)
    }.toDF("id", "cx", "cy")
      .withColumn("z", SpatialLayout.mortonZ(col("cx"), col("cy")))
    def meanBboxArea(laid: org.apache.spark.sql.DataFrame): Double =
      laid.groupBy(spark_partition_id())
        .agg(((max("cx") - min("cx")).cast("double") *
          (max("cy") - min("cy"))).as("area"))
        .agg(avg("area")).collect()(0).getDouble(0)
    val zArea = meanBboxArea(SpatialLayout.zOrderLayout(df, col("z"), 8))
    val idArea = meanBboxArea(df.repartitionByRange(8, col("id")))
    assert(zArea < idArea / 2,
      f"z-layout bbox $zArea%.0f should be far under insert-order $idArea%.0f")
  }
}

/** Scala-side md5-based h32 mirroring HashFunctions.hash32 for test
  * fixtures (no Spark expression round-trip).
  */
object TestHash {
  def h32(s: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toInt & Int.MaxValue
  }
}
