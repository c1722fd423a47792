package graft

import org.apache.spark.sql.functions._
import graft.functions.SigMatchCountExpr

/** The native signature agreement count must match the replaced
  * aggregate(zip_with(...)) fold exactly — including null elements
  * (contribute 0), unequal lengths (zip_with null-padding → 0), and
  * empty arrays.
  */
class SigMatchCountSpec extends SparkSpec {

  test("kernel equals the replaced HOF fold on edge inputs") {
    import spark.implicits._
    val rows = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 9L, 3L)),
      (Seq[java.lang.Long](), Seq[java.lang.Long]()),
      (Seq[java.lang.Long](5L), Seq[java.lang.Long]()),
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (Seq[java.lang.Long](7L, 8L), Seq[java.lang.Long](7L, 8L, 9L, 7L)),
      (Seq[java.lang.Long](-1L, 0L, Long.MaxValue),
        Seq[java.lang.Long](-1L, 0L, Long.MaxValue)))
    val df = rows.toDF("a", "b")
      .withColumn("kernel", SigMatchCountExpr.sigMatchCount(col("a"), col("b")))
      .withColumn("hof", aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v))
    df.collect().foreach { r =>
      assert(r.getInt(2) == r.getInt(3),
        s"mismatch on a=${r.getSeq[Any](0)} b=${r.getSeq[Any](1)}")
    }
  }
}
