package graft

import org.apache.spark.sql.functions._

/** The integer-exact quality-classifier trainers (QualityModel):
  * perceptron trajectory semantics on hand-checkable fixtures, and the
  * exact least-squares (normal equations + BigInt Cramer) path.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // A linearly separable fixture: y = sign(x1 - 5) with x = (1, x1).
  // Padded to Dim=4 with zero features so the production loop runs
  // unchanged.
  private def sepFeats(n: Int) = {
    val rows = (1 to n).map { i =>
      val x1 = i % 11L // 0..10
      val y = if (x1 > 5) 1L else -1L
      (i.toLong, "s", y, 1L, x1 - 5L, 0L, 0L)
    }
    rows.toDF("doc_id", "source", "y", "x0", "x1", "x2", "x3")
  }

  test("perceptron drives misclassifications down on separable data") {
    val traj = operators.QualityModel.train(sepFeats(400))
    assert(traj.length == operators.QualityModel.Epochs)
    val first = traj.head._1
    val last = traj.last._1
    assert(first == 400L, "epoch 1 starts from w=0: everything misses")
    assert(last < first / 4,
      s"separable fixture should mostly converge, got $last of $first")
    // learned direction: positive weight on the informative feature
    assert(traj.last._2(1) > 0)
  }

  test("epoch updates are the truncated-mean gradient") {
    // n = 8 rows, lr = n/4 = 2; epoch 1 misses everything (w = 0), so
    // g = sum(y * x) over ALL rows and w1 = g1 / 2 exactly.
    val rows = Seq(
      (1L, "s", 1L, 1L, 3L, 0L, 0L), (2L, "s", 1L, 1L, 4L, 0L, 0L),
      (3L, "s", 1L, 1L, 5L, 0L, 0L), (4L, "s", 1L, 1L, 6L, 0L, 0L),
      (5L, "s", -1L, 1L, -3L, 0L, 0L), (6L, "s", -1L, 1L, -4L, 0L, 0L),
      (7L, "s", -1L, 1L, -5L, 0L, 0L), (8L, "s", -1L, 1L, -7L, 0L, 0L))
      .toDF("doc_id", "source", "y", "x0", "x1", "x2", "x3")
    val (nMiss, w) = operators.QualityModel.train(rows).head
    assert(nMiss == 8L)
    assert(w(0) == 0L) // Σ y·1 = 0
    assert(w(1) == (3L + 4 + 5 + 6 + 3 + 4 + 5 + 7) / 2) // 37/2 = 18
    assert(w(2) == 0L && w(3) == 0L)
  }

  test("trajectory query is deterministic and epoch-complete") {
    val a = SparkEntry.queries("q_quality_train")(spark, sf).collect()
    val b = SparkEntry.queries("q_quality_train")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == operators.QualityModel.Epochs)
    assert(a.head.getLong(1) > a.last.getLong(1),
      "training should reduce misclassifications from the w=0 start")
  }

  test("lsc agrees with an independently computed exact solve") {
    val row = SparkEntry.queries("q_quality_lsc")(spark, sf).head()
    val nDocs = row.getLong(5)
    val nAgree = row.getLong(4)
    assert(nDocs > 0)
    // the linear model approximates the held-out nonlinear gold rule:
    // well above the base rate, below perfection
    assert(nAgree.toDouble / nDocs > 0.7 && nAgree < nDocs,
      s"lsc agreement $nAgree/$nDocs out of expected band")
    // weight scale: bp weights are |w| < 10 in feature units -> < 1e5
    (0 to 3).foreach(j => assert(math.abs(row.getLong(j)) < 100000L))
  }

  test("distributed trainer equals a sequential reference on seeded data") {
    // five deterministic random datasets: the distributed per-epoch
    // aggregate + driver update must reproduce a plain in-memory loop
    // exactly (catches any drift between the Column algebra and the
    // intended integer arithmetic)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(120)
      val rows = (1 to n).map { i =>
        (i.toLong, "s", if (rnd.nextBoolean()) 1L else -1L, 1L,
          rnd.between(-15L, 90L), rnd.between(-6L, 30L),
          rnd.between(-10L, 13L))
      }
      val df = rows.toDF("doc_id", "source", "y", "x0", "x1", "x2", "x3")
      val dist = operators.QualityModel.train(df)

      val lr = math.max(n / 4L, 1L)
      val w = Array.fill(4)(0L)
      val ref = (1 to operators.QualityModel.Epochs).map { _ =>
        val g = Array.fill(4)(0L)
        var miss = 0L
        rows.foreach { case (_, _, y, x0, x1, x2, x3) =>
          val xs = Array(x0, x1, x2, x3)
          if (y * (0 until 4).map(j => w(j) * xs(j)).sum <= 0L) {
            miss += 1
            for (j <- 0 until 4) g(j) += y * xs(j)
          }
        }
        for (j <- 0 until 4) w(j) += g(j) / lr
        (miss, w.toSeq)
      }
      assert(dist.map { case (m, ws) => (m, ws.toSeq) } == ref,
        s"seed $seed diverged")
    }
  }

  test("uncertainty sampling surfaces the smallest-|margin| docs") {
    val out = SparkEntry.queries("q_quality_uncertainty")(spark, sf)
      .collect()
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 5, s"$src over K")
      val margins = rows.sortBy(_.getInt(1)).map(r => math.abs(r.getLong(3)))
      assert(margins.sameElements(margins.sorted),
        s"$src not |margin|-ascending")
    }
    // the selected docs must be no more certain than the per-source
    // max: every selected |margin| <= the source's 5th-smallest overall
    val feats = operators.QualityModel.docFeatures(spark, sf).collect()
    val w = operators.QualityModel.train(
      operators.QualityModel.docFeatures(spark, sf)).last._2
    val all = feats.map { r =>
      val m = (0 until 4).map(j => w(j) * r.getLong(3 + j)).sum
      (r.getString(1), math.abs(m))
    }
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val k5 = all.filter(_._1 == src).map(_._2).sorted
        .take(rows.length).last
      rows.foreach(r => assert(math.abs(r.getLong(3)) <= k5,
        s"$src selected a more-certain doc than the true top-K"))
    }
  }

  test("apply keeps the gold-rule agreement above the base rate") {
    val df = SparkEntry.queries("q_quality_apply")(spark, sf)
    val tot = df.agg(sum("n_docs"), sum("n_agree")).head()
    val n = tot.getLong(0)
    val agree = tot.getLong(1)
    assert(n > 0 && agree.toDouble / n > 0.7,
      s"perceptron agreement $agree/$n below expected band")
  }
}
