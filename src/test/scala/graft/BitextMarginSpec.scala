package graft

import org.apache.spark.sql.functions._

/** Margin-criterion pair mining (q_ann_bitext_margin): one forward
  * top-1 row per even vec_id, and the cosine / ratio-margin / mutual
  * flag of a sampled row must match a plain in-memory recompute over
  * the collected vectors (independent of the distributed windows and
  * fixed-order top-K folds).
  */
class BitextMarginSpec extends SparkSpec {

  private def round(v: Double, d: Int): Double =
    BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("forward top-1 per even id, margins positive") {
    val out = SparkEntry.queries("q_ann_bitext_margin")(spark, sf)
      .collect()
    val nEven = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(2)) === 0).count()
    assert(out.length == nEven)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    assert(out.forall(_.getDouble(3) > 0))
  }

  test("sampled rows match an in-memory reference recompute") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)
      val nx = math.sqrt(x.map(a => a * a).foldLeft(0.0)(_ + _))
      val ny = math.sqrt(y.map(a => a * a).foldLeft(0.0)(_ + _))
      round(d / (nx * ny), 9)
    }
    val aIds = vecs.keys.filter(_ % 2 == 0).toSeq.sorted
    val bIds = vecs.keys.filter(_ % 2 == 1).toSeq.sorted
    def topList(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
      xs.sortBy { case (id, c) => (-c, id) }
    def avg4(xs: Seq[(Long, Double)]): Double =
      topList(xs).take(4).map(_._2).foldLeft(0.0)(_ + _) / 4.0

    val out = SparkEntry.queries("q_ann_bitext_margin")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    for (a <- aIds.take(3) ++ aIds.takeRight(2)) {
      val fw = bIds.map(b => b -> cos(vecs(a), vecs(b)))
      val (b1, c1) = topList(fw).head
      val bw = aIds.map(x => x -> cos(vecs(x), vecs(b1)))
      val mutual = topList(bw).head._1 == a
      val margin = round(c1 / ((avg4(fw) + avg4(bw)) / 2.0), 6)
      val (ob, oc, om, omut) = out(a)
      assert(ob == b1 && oc == round(c1, 6) && omut == mutual,
        s"a_id $a pair/flag mismatch")
      assert(math.abs(om - margin) < 2e-6, s"a_id $a margin $om vs $margin")
    }
  }
}
