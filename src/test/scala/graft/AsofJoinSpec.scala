package graft

import graft.operators.AsofJoin
import graft.plans.{AsofJoinExec, BroadcastAsofJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native as-of join ([[graft.plans.AsofJoinPlan]] /
  * [[graft.plans.AsofJoinExec]]): semantics vs an independent
  * window-function reference, every operator knob (outer/inner,
  * tolerance, composite keys, NULLs, tie dedupe contract, self-join
  * attribute hygiene), and the plan shape the operator exists for
  * (one exchange per side into the merge, no nested-loop anywhere).
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long)], k: String, t: String,
      v: String): DataFrame =
    rows.toDF(k, t, v)

  /** Independent reference: union-and-window last-value encoding. */
  private def windowed(left: DataFrame, right: DataFrame,
      tol: Option[Long]): Seq[(Long, Long, Option[Long])] = {
    val l = left.select($"k", $"t", $"lv".as("payload"),
      lit(0).as("side"))
    val r = right.select($"k", $"t", $"rv".as("payload"),
      lit(1).as("side"))
    val w = Window.partitionBy($"k").orderBy($"t", $"side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // side=1 sorts after side=0 at equal t, but a right row at time t
    // must be visible to a left row at the same t — so carry right
    // payload/time forward and read them from the left rows; equal-t
    // visibility is restored by including currentRow and ordering
    // right rows first at (t, side) via side DESC... simplest correct
    // form: order by (t, side DESC) so right rows precede left at ties.
    val w2 = Window.partitionBy($"k").orderBy($"t".asc, $"side".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m_rv",
        last(when($"side" === 1, $"payload"), ignoreNulls = true).over(w2))
      .withColumn("m_rt",
        last(when($"side" === 1, $"t"), ignoreNulls = true).over(w2))
      .filter($"side" === 0)
      .select($"payload".as("lv"), $"k",
        when($"m_rt".isNotNull &&
          tol.map(x => $"t" - $"m_rt" <= x).getOrElse(lit(true)),
          $"m_rv").as("rv"))
      .collect().map(r0 =>
        (r0.getLong(0), r0.getLong(1),
          if (r0.isNullAt(2)) None else Some(r0.getLong(2))))
      .toSeq.sortBy(x => (x._1, x._2))
  }

  private def native(left: DataFrame, right: DataFrame, tol: Option[Long],
      outer: Boolean = true, bcast: Boolean = false): DataFrame =
    AsofJoin.join(left,
      right.withColumnRenamed("k", "rk").withColumnRenamed("t", "rt"),
      Seq("k" -> "rk"), "t", "rt", tol, outer, bcast)

  test("as-of matches the window-function reference on random data") {
    val rnd = new scala.util.Random(42)
    val lrows = (1L to 400L).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i))
    val rrows = (1L to 300L).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000) * 7L % 1000, i + 1000))
      // tie-free right side per (k, t): keep max payload
      .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq
    val l = df(lrows, "k", "t", "lv")
    val r = df(rrows, "k", "t", "rv")
    for (tol <- Seq(None, Some(100L), Some(0L))) {
      val got = native(l, r, tol)
        .select($"lv", $"k", $"rv").collect()
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getLong(2))))
        .toSeq.sortBy(x => (x._1, x._2))
      assert(got == windowed(l, r, tol), s"tolerance=$tol diverged")
    }
  }

  test("equal timestamps match; tolerance boundary is inclusive") {
    val l = df(Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 301L, 3L)),
      "k", "t", "lv")
    val r = df(Seq((1L, 100L, 10L), (1L, 201L, 20L)), "k", "t", "rv")
    val got = native(l, r, Some(100L))
      .select($"lv", $"rv").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    // lv=1: rt=100 == t, gap 0 -> match; lv=2: newest rt=100, gap 100
    // == tol -> match (inclusive); lv=3: newest rt=201, gap 100 ->
    // match — and with tol=99 it must NOT fall back to rt=100
    assert(got == Set((1L, Some(10L)), (2L, Some(10L)), (3L, Some(20L))))
    val strict = native(l, r, Some(99L))
      .select($"lv", $"rv").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(strict == Set((1L, Some(10L)), (2L, None), (3L, None)),
      "tolerance must reject the newest candidate, not fall back")
  }

  test("inner drops unmatched; outer keeps them with NULLs") {
    val l = df(Seq((1L, 100L, 1L), (2L, 100L, 2L)), "k", "t", "lv")
    val r = df(Seq((1L, 50L, 10L)), "k", "t", "rv")
    assert(native(l, r, None, outer = false).count() == 1)
    val outer = native(l, r, None, outer = true)
    assert(outer.count() == 2)
    assert(outer.filter($"rv".isNull).select($"lv").as[Long].collect()
      .toSeq == Seq(2L))
  }

  test("NULL keys and NULL times never match, on either side") {
    val l = Seq((Some(1L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(1L), None, 3L)).toDF("k", "t", "lv")
    val r = Seq((Some(1L), Some(50L), 10L), (None, Some(40L), 20L),
      (Some(1L), None, 30L)).toDF("k", "t", "rv")
    val got = native(l, r, None).select($"lv", $"rv").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(got == Set((1L, Some(10L)), (2L, None), (3L, None)))
  }

  test("composite keys partition the match space") {
    val l = Seq((1L, 1L, 100L, 1L), (1L, 2L, 100L, 2L))
      .toDF("k1", "k2", "t", "lv")
    val r = Seq((1L, 1L, 90L, 10L), (1L, 2L, 80L, 20L))
      .toDF("rk1", "rk2", "rt", "rv")
    val got = AsofJoin.join(l, r, Seq("k1" -> "rk1", "k2" -> "rk2"),
      "t", "rt", None, outer = true)
      .select($"lv", $"rv").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  test("self-join on one scan gets fresh right-side attributes") {
    val e = df(Seq((1L, 100L, 1L), (1L, 50L, 2L)), "k", "t", "lv")
    val joined = AsofJoin.join(
      e.filter($"lv" === 1L),
      e.filter($"lv" === 2L).select($"k".as("rk"), $"t".as("rt"),
        $"lv".as("rv")),
      Seq("k" -> "rk"), "t", "rt", None, outer = true)
    assert(joined.select($"rv").as[Long].collect().toSeq == Seq(2L))
  }

  test("empty right side: outer all-NULL, inner empty") {
    val l = df(Seq((1L, 100L, 1L)), "k", "t", "lv")
    val r = df(Seq.empty[(Long, Long, Long)], "k", "t", "rv")
    assert(native(l, r, None, outer = true).filter($"rv".isNull)
      .count() == 1)
    assert(native(l, r, None, outer = false).count() == 0)
  }

  test("timestamp time columns work (micros compare)") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("k", "t", "lv")
    val r = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 09:59:59.999999"), 10L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.000001"), 20L))
      .toDF("rk", "rt", "rv")
    val got = AsofJoin.join(l, r, Seq("k" -> "rk"), "t", "rt",
      Some(1000000L), outer = false)
      .select($"rv").as[Long].collect().toSeq
    assert(got == Seq(10L))
  }


  test("plan shape: AsofJoinExec fed by exactly one exchange per side") {
    val l = df((1L to 100L).map(i => (i % 7, i, i)), "k", "t", "lv")
    val r = df((1L to 100L).map(i => (i % 7, i * 3 % 100, i + 500))
      .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq,
      "k", "t", "rv")
    val j = native(l, r, None)
    j.queryExecution.toRdd.count()
    val all = planNodes(j.queryExecution.executedPlan)
    val asof = all.collect { case a: AsofJoinExec => a }
    assert(asof.size == 1, "expected exactly one AsofJoinExec")
    val exchanges = all.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 2,
      s"expected one exchange per side, got ${exchanges.size}:\n" +
        j.queryExecution.executedPlan)
    assert(!all.exists(_.getClass.getSimpleName.contains("NestedLoop")),
      "as-of join must never degrade to a nested loop")
    // output ordering contract: a downstream same-key window reuses
    // the join's partitioning+sort — no further exchange
    val win = Window.partitionBy($"k").orderBy($"t")
    val downstream = j.withColumn("rn", row_number().over(win))
    downstream.queryExecution.toRdd.count()
    val n2 = planNodes(downstream.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e }
    assert(n2.size == 2,
      "downstream same-key window must reuse the as-of partitioning")
  }

  test("chained as-of joins reuse the left partitioning: one left exchange") {
    // the q_ts_resample shape: backward pass, then a forward pass
    // running on the backward pass's OUTPUT — same key, so the merge's
    // ClusteredDistribution is already satisfied and only a partition-
    // local resort is added. 3 exchanges total: left once, each right
    // side once.
    val l = df((1L to 200L).map(i => (i % 9, i, i)), "k", "t", "lv")
    val r1 = df((1L to 50L).map(i => (i % 9, i * 4 % 200, i + 500))
      .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq,
      "rk", "rt", "rv")
    val r2 = r1.select($"rk".as("sk"), (-$"rt").as("st"), $"rv".as("sv"))
    val bk = AsofJoin.join(l, r1, Seq("k" -> "rk"), "t", "rt")
    val fw = AsofJoin.join(bk.withColumn("nt", -$"t"), r2,
      Seq("k" -> "sk"), "nt", "st")
    fw.queryExecution.toRdd.count()
    val all = planNodes(fw.queryExecution.executedPlan)
    assert(all.count(_.isInstanceOf[AsofJoinExec]) == 2)
    val exchanges = all.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 3,
      s"chained as-of must not re-shuffle the left side, got " +
        s"${exchanges.size} exchanges:\n${fw.queryExecution.executedPlan}")
  }

  test("broadcast variant: identical results, zero fact-side exchange") {
    val rnd = new scala.util.Random(7)
    val l = df((1L to 500L).map(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(2000).toLong, i)), "k", "t", "lv")
    val r = df((1L to 120L).map(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(2000).toLong, i + 9000))
      .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toSeq,
      "k", "t", "rv")
    for (tol <- Seq(None, Some(300L)); outer <- Seq(true, false)) {
      val viaMerge = native(l, r, tol, outer)
        .select($"lv", $"rv").collect()
        .map(x => (x.getLong(0),
          if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
      val viaBcast = native(l, r, tol, outer, bcast = true)
        .select($"lv", $"rv").collect()
        .map(x => (x.getLong(0),
          if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
      assert(viaBcast == viaMerge, s"tol=$tol outer=$outer diverged")
    }
    val j = native(l, r, None, outer = true, bcast = true)
    j.queryExecution.toRdd.count()
    val all = planNodes(j.queryExecution.executedPlan)
    assert(all.exists(_.isInstanceOf[BroadcastAsofJoinExec]),
      "broadcastRight must plan the broadcast exec")
    assert(!all.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "broadcast as-of must not shuffle either side:\n" +
        j.queryExecution.executedPlan)
    assert(all.exists(
      _.getClass.getSimpleName.startsWith("BroadcastExchange")),
      "the dimension side must go through a broadcast exchange")
  }

  test("SQL graft_asof_match lifts to the native plan (both join types)") {
    GraftExtensions.register(spark)
    df(Seq((1L, 100L, 1L), (1L, 300L, 2L), (2L, 100L, 3L)), "k", "t", "lv")
      .createOrReplaceTempView("graft_as_l")
    df(Seq((1L, 90L, 10L), (1L, 250L, 20L)), "k", "t", "rv")
      .createOrReplaceTempView("graft_as_r")
    val outer = spark.sql(
      """SELECT l.lv, r.rv FROM graft_as_l l LEFT JOIN graft_as_r r
        |ON l.k = r.k AND graft_asof_match(l.t, r.t)""".stripMargin)
    val got = outer.collect().map(x => (x.getLong(0),
      if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(got == Set((1L, Some(10L)), (2L, Some(20L)), (3L, None)))
    outer.queryExecution.toRdd.count()
    assert(planNodes(outer.queryExecution.executedPlan)
      .exists(_.isInstanceOf[AsofJoinExec]))
    // inner + tolerance literal; swapped time orientation also lifts
    val inner = spark.sql(
      """SELECT l.lv, r.rv FROM graft_as_r r JOIN graft_as_l l
        |ON l.k = r.k AND graft_asof_match(l.t, r.t, 15L)""".stripMargin)
    assert(inner.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ==
      Set((1L, 10L)))
    inner.queryExecution.toRdd.count()
    assert(planNodes(inner.queryExecution.executedPlan)
      .exists(_.isInstanceOf[AsofJoinExec]))
  }

  test("unliftable graft_asof_match fails loudly, never evaluates naively") {
    GraftExtensions.register(spark)
    df(Seq((1L, 100L, 1L)), "k", "t", "lv")
      .createOrReplaceTempView("graft_as_l2")
    df(Seq((1L, 90L, 10L)), "k", "t", "rv")
      .createOrReplaceTempView("graft_as_r2")
    // no equi conjunct -> rule declines -> Unevaluable must throw at
    // plan/execution, NOT return the every-prior-row join
    val noKey = spark.sql(
      """SELECT * FROM graft_as_l2 l JOIN graft_as_r2 r
        |ON graft_asof_match(l.t, r.t)""".stripMargin)
    val e1 = intercept[Exception] { noKey.collect() }
    assert(e1.toString.toLowerCase.contains("graft_asof_match") ||
      e1.toString.toLowerCase.contains("unevaluable"))
    // marker under OR: conjunct split cannot isolate it -> same
    val orCtx = spark.sql(
      """SELECT * FROM graft_as_l2 l JOIN graft_as_r2 r
        |ON l.k = r.k AND (graft_asof_match(l.t, r.t) OR l.lv = 0)"""
        .stripMargin)
    val e2 = intercept[Exception] { orCtx.collect() }
    assert(e2.toString.toLowerCase.contains("graft_asof_match") ||
      e2.toString.toLowerCase.contains("unevaluable"))
    // LEFT JOIN with swapped orientation (probe would be the non-
    // preserved side) must also refuse
    val badOuter = spark.sql(
      """SELECT * FROM graft_as_l2 l LEFT JOIN graft_as_r2 r
        |ON l.k = r.k AND graft_asof_match(r.t, l.t)""".stripMargin)
    val e3 = intercept[Exception] { badOuter.collect() }
    assert(e3.toString.toLowerCase.contains("graft_asof_match") ||
      e3.toString.toLowerCase.contains("unevaluable"))
  }

  test("broadcast variant honors NULL keys/times on both sides") {
    val l = Seq((Some(1L), Some(100L), 1L), (None, Some(100L), 2L),
      (Some(1L), None, 3L)).toDF("k", "t", "lv")
    val r = Seq((Some(1L), Some(50L), 10L), (None, Some(40L), 20L),
      (Some(1L), None, 30L)).toDF("rk", "rt", "rv")
    val got = AsofJoin.join(l, r, Seq("k" -> "rk"), "t", "rt", None,
      outer = true, broadcastRight = true)
      .select($"lv", $"rv").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(got == Set((1L, Some(10L)), (2L, None), (3L, None)))
  }
}
