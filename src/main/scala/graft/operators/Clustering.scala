package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ski-area clustering core (SURVEY §2.6): the transitive-closure
  * proximity assignment (J10) built from the grid-cell distance join
  * (J1) with activity compatibility (J7).
  *
  * Reference behavior: starting from each ski area's geometry,
  * repeatedly claim compatible objects within 500 m of anything
  * already claimed (`/root/reference/src/clustering/
  * SkiAreaClusteringService.ts:705-779`), sequentially per area.
  * Spark-first re-expression: simultaneous frontier expansion for ALL
  * areas (each iteration = one grid join), with deterministic
  * min-area-id-wins resolution for objects reachable from multiple
  * areas — the label-propagation design SURVEY J10 prescribes in place
  * of sequential claiming (divergence documented there).
  *
  * Scale notes: each iteration shuffles only the frontier (shrinks
  * fast) against the cell-partitioned object table; the object side is
  * computed once and cached. localCheckpoint after each iteration cuts
  * the growing lineage. Chains are geographically short, so the loop
  * converges in a handful of iterations regardless of data size.
  */
object Clustering {

  /** areas: area_id (long), act (string), lon, lat
    * objs:  okey (long), uses (array<string>), lon, lat
    * Returns: okey, area_id (min reaching area).
    */
  def transitiveAssign(areas: DataFrame, objs: DataFrame,
      radiusM: Double, cellDeg: Double): DataFrame = {
    val objCells = objs
      .withColumn("cx", floor(col("lon") / cellDeg).cast("long"))
      .withColumn("cy", floor(col("lat") / cellDeg).cast("long"))
      .persist()

    def expand(frontier: DataFrame): DataFrame = {
      val cells = frontier
        .select(col("area_id"), col("act"),
          col("lon").as("flon"), col("lat").as("flat"),
          explode(transform(sequence(lit(-1), lit(1)),
            i => floor(col("lon") / cellDeg).cast("long") + i)).as("cx"),
          floor(col("lat") / cellDeg).cast("long").as("cyb"))
        .select(col("area_id"), col("act"), col("flon"), col("flat"), col("cx"),
          explode(transform(sequence(lit(-1), lit(1)),
            j => col("cyb") + j)).as("cy"))
      cells.join(objCells, Seq("cx", "cy"))
        .filter(GeoFunctions.haversineM(col("flon"), col("flat"),
          col("lon"), col("lat")) <= radiusM
          && array_contains(col("uses"), col("act")))
        .select(col("area_id"), col("act"), col("okey"),
          col("lon"), col("lat"))
        .distinct()
    }

    var frontier = areas.select(col("area_id"), col("act"),
      col("lon"), col("lat"))
    // reached = lazy union over per-iteration CHECKPOINTED frontier
    // pieces: the anti-join reads materialized blocks either way, and
    // skipping the re-materialization of the growing union saves one
    // full write per iteration
    val reachedParts =
      scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]()
    def reached: org.apache.spark.sql.DataFrame =
      reachedParts.reduce(_ unionByName _)
    var iter = 0
    var done = false
    while (!done && iter < 30) {
      val cand = expand(frontier)
      val newPairs = (if (reachedParts.isEmpty) cand
        else cand.join(reached.select("area_id", "okey"),
          Seq("area_id", "okey"), "left_anti"))
        .localCheckpoint()
      if (newPairs.isEmpty) done = true
      else {
        reachedParts += newPairs
        frontier = newPairs
      }
      iter += 1
    }
    objCells.unpersist()
    if (reachedParts.isEmpty)
      expand(areas.limit(0)).groupBy("okey")
        .agg(min("area_id").as("area_id"))
    else
      reached.groupBy("okey").agg(min("area_id").as("area_id"))
  }

  /** Connected components over an undirected edge list `(a, b)` by
    * min-label propagation with pointer doubling (label := label(label)
    * each round → O(log diameter) tiny-table iterations). Only nodes
    * that appear in some pair are returned — callers treat absent nodes
    * as singleton components. Returns (nid, label).
    *
    * Scale notes: the loop tables hold only edge-participating nodes;
    * every iteration is a join + groupBy on flat longs over
    * checkpointed inputs, and convergence is read from a `chg` flag
    * inside the already-materialized iteration output.
    */
  def minLabelComponents(pairsIn: DataFrame): DataFrame = {
    val pairs = pairsIn.localCheckpoint()
    // empty-graph fast path: no pairs → no labels, and none of the
    // loop's jobs run (the common case for normalization inputs whose
    // arcs never chain — one cheap isEmpty on the checkpointed table)
    if (pairs.isEmpty)
      return pairs.select(col("a").as("nid"), col("a").as("label"))
    val biPairs = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
    var labels = biPairs.select(col("a").as("nid")).distinct()
      .select(col("nid"), col("nid").as("label"))
      .localCheckpoint()
    var changed = true
    var iter = 0
    while (changed && iter < 25) {
      val neighborMin = biPairs
        .join(labels.select(col("nid").as("b"), col("label").as("nlabel")),
          "b")
        .groupBy(col("a").as("nid"))
        .agg(min("nlabel").as("nmin"))
      val stepped = labels.join(neighborMin, Seq("nid"), "left")
        .select(col("nid"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("chg"))
      val updated = stepped
        .join(stepped.select(col("nid").as("label"),
          col("label").as("ll")), Seq("label"), "left")
        .select(col("nid"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"),
          (col("chg") || coalesce(col("ll"), col("label")) < col("label"))
            .as("chg"))
        .localCheckpoint()
      changed = updated.filter(col("chg")).limit(1).count() > 0
      labels = updated.drop("chg")
      iter += 1
    }
    if (changed)
      // pointer doubling covers diameter 2^25 — hitting this means the
      // caller would silently see split components, so make it loud.
      System.err.println(
        s"[minLabelComponents] WARNING: label propagation NOT converged " +
          s"after $iter iterations; components may be split")
    labels
  }
}
