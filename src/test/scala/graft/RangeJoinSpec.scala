package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

/** [[graft.plans.IntervalJoinRule]]: the binned-equi-join rewrite of
  * `JOIN ... ON graft_in_range(t, lo, hi, bin)` — plan shape, exact
  * pair semantics vs a literal BETWEEN join, boundary inclusivity,
  * inverted/NULL intervals, negative-time binning, and the fallback
  * path when the rule cannot apply.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)


  private def planOf(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.queryExecution.toRdd.count()
    planNodes(df.queryExecution.executedPlan)
  }

  test("rewrites to an equi-join and matches the BETWEEN join exactly") {
    val rnd = new scala.util.Random(11)
    // points across [-5000, 5000) — negative times exercise the
    // sign-correct floorDiv; intervals of width 0..600 spanning 1-3
    // bins at bin=300
    val pts = (1L to 800L).map(i =>
      (i, rnd.nextLong(10000) - 5000L)).toDF("pid", "t")
    val ivs = (1L to 60L).map { i =>
      val lo = rnd.nextLong(10000) - 5000L
      (i, lo, lo + rnd.nextLong(600))
    }.toDF("iid", "lo", "hi")
    pts.createOrReplaceTempView("graft_rjs_pts")
    ivs.createOrReplaceTempView("graft_rjs_ivs")

    val viaRule = spark.sql(
      """SELECT pid, iid FROM graft_rjs_pts p JOIN graft_rjs_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 300L)""".stripMargin)
    val expected = spark.sql(
      """SELECT pid, iid FROM graft_rjs_pts p JOIN graft_rjs_ivs i
        |ON p.t BETWEEN i.lo AND i.hi""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture must produce qualifying pairs")
    assert(viaRule.as[(Long, Long)].collect().toSet == expected)

    val all = planOf(viaRule)
    assert(!all.exists(_.getClass.getSimpleName.contains("NestedLoop")) &&
      !all.exists(_.getClass.getSimpleName.contains("Cartesian")),
      "graft_in_range join must not plan as a nested loop:\n" +
        viaRule.queryExecution.executedPlan)
    assert(all.exists(p => p.getClass.getSimpleName.contains("HashJoin") ||
      p.getClass.getSimpleName.contains("SortMergeJoin")),
      "expected an equi-join on the bin id")
    // the BETWEEN control really is the nested loop the rule removes
    val ctl = planOf(expected match { case _ => spark.sql(
      """SELECT pid, iid FROM graft_rjs_pts p JOIN graft_rjs_ivs i
        |ON p.t BETWEEN i.lo AND i.hi""".stripMargin) })
    assert(ctl.exists(_.getClass.getSimpleName.contains("NestedLoop")),
      "control: Spark plans a bare range join as BNLJ")
  }

  test("boundaries are inclusive on both ends") {
    Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "t")
      .createOrReplaceTempView("graft_rjs_b_pts")
    Seq((7L, 10L, 20L)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("graft_rjs_b_ivs")
    val got = spark.sql(
      """SELECT pid FROM graft_rjs_b_pts p JOIN graft_rjs_b_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 4L)""".stripMargin)
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("inverted and NULL intervals contribute no pairs") {
    Seq((1L, 15L)).toDF("pid", "t")
      .createOrReplaceTempView("graft_rjs_i_pts")
    Seq((1L, Some(20L), Some(10L)), // inverted, point inside [10,20]
      (2L, None, Some(30L)), (3L, Some(0L), None))
      .toDF("iid", "lo", "hi")
      .createOrReplaceTempView("graft_rjs_i_ivs")
    val got = spark.sql(
      """SELECT pid, iid FROM graft_rjs_i_pts p JOIN graft_rjs_i_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 7L)""".stripMargin)
    assert(got.count() == 0)
  }

  test("rule leaves OR-context and non-literal-bin predicates alone") {
    Seq((1L, 15L)).toDF("pid", "t")
      .createOrReplaceTempView("graft_rjs_o_pts")
    Seq((1L, 10L, 20L, 5L), (2L, 100L, 110L, 5L)).toDF("iid", "lo", "hi", "b")
      .createOrReplaceTempView("graft_rjs_o_ivs")
    // non-foldable bin: falls back to whatever Spark plans; must still
    // evaluate the predicate correctly
    val nonLit = spark.sql(
      """SELECT pid, iid FROM graft_rjs_o_pts p JOIN graft_rjs_o_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, i.b)""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(nonLit == Set((1L, 1L)))
    // under OR the conjunct split cannot isolate the marker — same
    // fallback, same answer
    val orCtx = spark.sql(
      """SELECT pid, iid FROM graft_rjs_o_pts p JOIN graft_rjs_o_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 5L) OR i.iid = 2""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(orCtx == Set((1L, 1L), (1L, 2L)))
  }

  test("LEFT OUTER with the point side preserved lifts and matches") {
    val rnd = new scala.util.Random(23)
    val pts = (1L to 300L).map(i => (i, rnd.nextLong(4000)))
      .toDF("pid", "t")
    val ivs = (1L to 25L).map { i =>
      val lo = rnd.nextLong(4000); (i, lo, lo + rnd.nextLong(500))
    }.toDF("iid", "lo", "hi")
    pts.createOrReplaceTempView("graft_rjs_lo_pts")
    ivs.createOrReplaceTempView("graft_rjs_lo_ivs")
    val viaRule = spark.sql(
      """SELECT pid, iid FROM graft_rjs_lo_pts p LEFT JOIN graft_rjs_lo_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 250L)""".stripMargin)
    val expected = spark.sql(
      """SELECT pid, iid FROM graft_rjs_lo_pts p LEFT JOIN graft_rjs_lo_ivs i
        |ON p.t BETWEEN i.lo AND i.hi""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sorted
    assert(expected.exists(_._2.isEmpty), "fixture needs unmatched points")
    assert(viaRule.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sorted
      == expected)
    val all = planOf(viaRule)
    assert(!all.exists(_.getClass.getSimpleName.contains("NestedLoop")),
      "point-preserved LEFT range join must lift:\n" +
        viaRule.queryExecution.executedPlan)
    // interval side preserved: must NOT lift (explode would duplicate
    // null padding) — stays a nested loop, still correct
    val keep = spark.sql(
      """SELECT iid, pid FROM graft_rjs_lo_ivs i LEFT JOIN graft_rjs_lo_pts p
        |ON graft_in_range(p.t, i.lo, i.hi, 250L)""".stripMargin)
    val keepExpected = spark.sql(
      """SELECT iid, pid FROM graft_rjs_lo_ivs i LEFT JOIN graft_rjs_lo_pts p
        |ON p.t BETWEEN i.lo AND i.hi""".stripMargin)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sorted
    assert(keep.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq.sorted
      == keepExpected)
    assert(planOf(keep)
      .exists(_.getClass.getSimpleName.contains("NestedLoop")),
      "interval-preserved LEFT range join must stay unrewritten")
  }

  test("open-ended intervals raise the targeted bin-cap error") {
    // an SCD-style 'current' row with hi = far-future sentinel would
    // explode into ~Long.MaxValue/bin sequence elements — the guard
    // must raise the graft_in_range error, not die in Sequence
    Seq((1L, 15L)).toDF("pid", "t")
      .createOrReplaceTempView("graft_rjs_e_pts")
    Seq((1L, 0L, Long.MaxValue / 2)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("graft_rjs_e_ivs")
    val open = spark.sql(
      """SELECT pid, iid FROM graft_rjs_e_pts p JOIN graft_rjs_e_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 100L)""".stripMargin)
    val e = intercept[Exception] { open.collect() }
    assert(e.toString.contains("graft_in_range") &&
      e.toString.contains("bins"),
      s"expected the targeted bin-cap error, got: ${e.toString.take(300)}")
    // a wide-but-capped interval still works (2^20 bins exactly)
    Seq((2L, 0L, (1L << 20) * 100L - 1L)).toDF("iid", "lo", "hi")
      .createOrReplaceTempView("graft_rjs_e2_ivs")
    val ok = spark.sql(
      """SELECT pid, iid FROM graft_rjs_e_pts p JOIN graft_rjs_e2_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 100L)""".stripMargin)
    assert(ok.collect().map(_.getLong(1)).toSeq == Seq(2L))
  }

  test("extra equi-conjuncts survive the rewrite") {
    Seq((1L, 15L, 7L), (2L, 15L, 8L)).toDF("pid", "t", "grp")
      .createOrReplaceTempView("graft_rjs_c_pts")
    Seq((1L, 10L, 20L, 7L)).toDF("iid", "lo", "hi", "grp")
      .createOrReplaceTempView("graft_rjs_c_ivs")
    val got = spark.sql(
      """SELECT pid FROM graft_rjs_c_pts p JOIN graft_rjs_c_ivs i
        |ON graft_in_range(p.t, i.lo, i.hi, 4L) AND p.grp = i.grp"""
        .stripMargin).as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
