package graft

import org.apache.spark.sql.functions._
import graft.functions.L2SqToLitExpr

/** The native literal-centroid L2² must match the replaced
  * aggregate(zip_with(q, typedLit(cv), (a,b) => (a-b)*(a-b))) fold
  * exactly: same left-to-right float order, NULL on length mismatch
  * (zip_with null padding) or null element.
  */
class L2SqToLitSpec extends SparkSpec {

  private val cv = Array(1.5, -2.0, 0.25, 1e9)

  test("kernel equals the replaced HOF fold, including null algebra") {
    import spark.implicits._
    val rows = Seq(
      Seq[java.lang.Long](1L, -2L, 0L, 1000000000L),
      Seq[java.lang.Long](0L, 0L, 0L, 0L),
      Seq[java.lang.Long](Long.MaxValue, 1L, 2L, 3L),
      Seq[java.lang.Long](1L, 2L, 3L),            // shorter → null
      Seq[java.lang.Long](1L, 2L, 3L, 4L, 5L),    // longer → null
      Seq[java.lang.Long](1L, null, 3L, 4L))      // null elem → null
    val df = rows.toDF("q")
      .withColumn("kernel", L2SqToLitExpr.l2sqToLit(col("q"), cv))
      .withColumn("hof", aggregate(
        zip_with(col("q"), typedLit(cv.toSeq),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x))
    df.collect().foreach { r =>
      val k = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val h = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      // bit-identical, not approximately equal
      assert(k.map(java.lang.Double.doubleToRawLongBits)
          == h.map(java.lang.Double.doubleToRawLongBits),
        s"mismatch on q=${r.getSeq[Any](0)}: kernel=$k hof=$h")
    }
  }
}
