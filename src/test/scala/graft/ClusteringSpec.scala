package graft

import graft.operators.Clustering

/** Scenario tests for the transitive-closure assignment, mirroring the
  * reference's clustering behavior specs (SURVEY §5): chained claiming,
  * radius cutoff, activity compatibility, deterministic competition.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val cell = 0.01
  private val r = 500.0

  private def areasDf(rows: (Long, String, Double, Double)*) =
    rows.toDF("area_id", "act", "lon", "lat")
  private def objsDf(rows: (Long, Seq[String], Double, Double)*) =
    rows.toDF("okey", "uses", "lon", "lat")

  private def assign(a: org.apache.spark.sql.DataFrame,
      o: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Clustering.transitiveAssign(a, o, r, cell)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

  test("chains assign transitively; far objects stay unassigned") {
    // ~0.003 deg lon at lat 0 ≈ 334 m per hop; okey 4 is far away
    val got = assign(
      areasDf((100L, "downhill", 0.0, 0.0005)),
      objsDf(
        (1L, Seq("downhill"), 0.0, 0.0),
        (2L, Seq("downhill"), 0.003, 0.0),
        (3L, Seq("downhill"), 0.006, 0.0),
        (4L, Seq("downhill"), 0.5, 0.5)))
    assert(got == Map(1L -> 100L, 2L -> 100L, 3L -> 100L))
  }

  test("activity-incompatible objects break the chain") {
    val got = assign(
      areasDf((100L, "downhill", 0.0, 0.0005)),
      objsDf(
        (1L, Seq("downhill"), 0.0, 0.0),
        (2L, Seq("nordic"), 0.003, 0.0),
        (3L, Seq("downhill"), 0.006, 0.0)))
    // 2 is incompatible; 3 only reachable through 2 → unassigned
    assert(got == Map(1L -> 100L))
  }

  test("competing areas: min area id wins deterministically") {
    val got = assign(
      areasDf((200L, "downhill", 0.0, 0.0), (100L, "downhill", 0.004, 0.0)),
      objsDf((1L, Seq("downhill"), 0.002, 0.0)))
    assert(got == Map(1L -> 100L))
  }

  test("distance is a hard cutoff at 500 m") {
    // 0.0046 deg ≈ 512 m at equator → out; 0.0044 ≈ 490 m → in
    val got = assign(
      areasDf((100L, "downhill", 0.0, 0.0)),
      objsDf(
        (1L, Seq("downhill"), 0.0044, 0.0),
        (2L, Seq("downhill"), 0.0046, 0.0)))
    assert(got.contains(1L) && got(1L) == 100L)
    // 2 gets pulled in transitively via 1 (distance 1→2 tiny) — both in
    assert(got.contains(2L))
    val far = assign(
      areasDf((100L, "downhill", 0.0, 0.0))    ,
      objsDf((9L, Seq("downhill"), 0.0046, 0.0)))
    assert(!far.contains(9L))
  }

  test("minLabelComponents: long chain converges to the component min") {
    import spark.implicits._
    // 200-node chain — deep enough that plain one-hop propagation would
    // need ~200 rounds; pointer doubling must converge well under the
    // loop's iteration cap.
    val chain = (1L until 200L).map(i => (i, i + 1))
    val labels = operators.Clustering.minLabelComponents(
      chain.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200)
    assert(labels.values.forall(_ == 1L))
  }

  test("minLabelComponents: disjoint components keep separate min labels") {
    import spark.implicits._
    val pairs = Seq((10L, 11L), (11L, 12L), (50L, 51L)).toDF("a", "b")
    val labels = operators.Clustering.minLabelComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(50L, 51L).forall(labels(_) == 50L))
    // isolated nodes never appear — callers treat them as singletons
    assert(!labels.contains(99L))
  }

  test("q_ski_polygon_assign exercises containment on a NON-EMPTY set") {
    // regression: the former hexagon fixture (~0.006° max radius) never
    // fully covered a 3-vertex run, so the ray-cast refine and both
    // removal rules passed vacuously on 0 rows
    val rows = SparkEntry.queries("q_ski_polygon_assign")(spark, sf).collect()
    assert(rows.length > 10, s"expected >10 assigned areas, got ${rows.length}")
    // the >50%-in-site removal rule must have survivors with site members
    assert(rows.exists(_.getAs[Long]("n_site") > 0),
      "no surviving area has site members — removal rule untested")
  }
}
