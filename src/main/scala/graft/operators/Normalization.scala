package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run topology normalization (SURVEY §2.4, N1-N4).
  *
  * OSM runs arrive as arbitrary way fragments with duplicated and
  * partially-overlapping geometry. The reference accumulates ALL runs
  * in one heap and runs topojson + graph walks
  * (`/root/reference/src/transforms/accumulator/RunNormalizerAccumulator.ts:16-55`,
  * `normalization/MergeOverlappingRuns.ts:25-171`,
  * `normalization/CombineRunSegments.ts:18-46`). Here the same semantics
  * are a shuffle pipeline — nothing ever materializes on one node:
  *
  *  N1  edges: explode each line into consecutive-point edges on a
  *      1e-7° quantized grid (canonical orientation), drop degenerates;
  *  N1b arc membership: groupBy edge key → sorted set of owning runs;
  *  N2  re-segment: per run, split where the membership set changes
  *      (window lag + running sum), emit each shared arc once (owner =
  *      least member id), merged props = sorted '+'-join of members;
  *  N3  chain-merge: segments with identical merged props meeting at a
  *      degree-2 endpoint are label-propagated into components
  *      (iterative min-label joins — bounded by chain diameter) and
  *      stitched back into one line per component (mapGroups; groups
  *      are single physical runs, so tiny).
  *
  * Scale notes: the edge exchange is the one unavoidable shuffle (same
  * barrier the reference pays in RAM); everything after operates on
  * per-run or per-arc groups. The label-propagation loop checkpoints
  * via localCheckpoint to cut lineage. Quantization at 1e-7° is our
  * canonical grid (SURVEY §4.2 risk 2) — output equivalence, not byte
  * equality, with topojson.
  */
object Normalization {

  private val Q = 1e7

  /** N1+N2: split runs into maximal arcs of constant run-membership.
    *
    * Input:  run_id: Long, props: String, coords: array<array<double>>
    * Output: seg_run: Long (owner), seg_id: Long, members: array<long>,
    *         props: String (merged), pts: array<array<long>> (quantized)
    */
  def splitSharedArcs(runs: DataFrame): DataFrame = {
    val q = runs.select(col("run_id"), col("props"),
      transform(col("coords"), p => array(
        round(element_at(p, 1) * Q).cast("long"),
        round(element_at(p, 2) * Q).cast("long"))).as("qpts"))

    // directed edges with per-run position; canonical undirected key
    val edges = q.select(col("run_id"), col("props"),
        posexplode(zip_with(
          slice(col("qpts"), lit(1), size(col("qpts")) - 1),
          slice(col("qpts"), lit(2), size(col("qpts")) - 1),
          (a, b) => struct(a.as("p1"), b.as("p2")))))
      .withColumnRenamed("pos", "idx")
      .select(col("run_id"), col("props"), col("idx"),
        col("col.p1").as("p1"), col("col.p2").as("p2"))
      .filter(col("p1") =!= col("p2"))
      .withColumn("k1", concat_ws("_", col("p1")(0), col("p1")(1)))
      .withColumn("k2", concat_ws("_", col("p2")(0), col("p2")(1)))
      .withColumn("ekey",
        when(col("k1") < col("k2"), concat_ws("__", col("k1"), col("k2")))
          .otherwise(concat_ws("__", col("k2"), col("k1"))))
      .drop("k1", "k2")
      // edges feed both the membership aggregation and the join back —
      // materialize once so the quantize/explode chain isn't recomputed
      // (and re-inlined) per consumer.
      .localCheckpoint()

    // arc membership: which runs own each undirected edge
    val membership = edges.groupBy("ekey").agg(
      sort_array(collect_set(col("run_id"))).as("members"),
      sort_array(collect_set(col("props"))).as("member_props"))

    val withM = edges.join(membership, "ekey")
      .withColumn("mkey", concat_ws(",", col("members")))

    // N2: per-run segmentation where membership changes
    val w = Window.partitionBy("run_id").orderBy("idx")
    val seg = withM
      .withColumn("chg",
        when(lag("mkey", 1).over(w).isNull
          || lag("mkey", 1).over(w) =!= col("mkey"), 1).otherwise(0))
      .withColumn("seg_no", sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))

    // each shared arc once: the least member id owns it
    seg.filter(col("run_id") === element_at(col("members"), 1))
      .groupBy(col("run_id").as("seg_run"), col("seg_no"))
      .agg(
        first(col("members")).as("members"),
        concat_ws("+", first(col("member_props"))).as("props"),
        array_append(
          transform(sort_array(collect_list(struct(col("idx"), col("p1")))),
            s => s.getField("p1")),
          max_by(col("p2"), col("idx"))).as("pts"))
      .withColumn("seg_id",
        col("seg_run") * 100000 + col("seg_no"))
      .select("seg_run", "seg_id", "members", "props", "pts")
  }

  /** Public (not private) so the Catalyst-generated encoder projection
    * class can instantiate it.
    */
  case class LabeledSeg(label: Long, seg_id: Long, props: String,
    pts: Seq[Seq[Long]])

  /** N3: merge chains of segments with identical props that meet at
    * endpoints where exactly two same-props segments touch.
    * Returns run_id (component label), props, pts (stitched, quantized).
    */
  def combineSegments(segmentsIn: DataFrame): DataFrame = {
    val spark = segmentsIn.sparkSession
    import spark.implicits._
    // materialize: the label-propagation loop would otherwise re-run
    // the whole upstream pipeline (synthesis, formatting, arc split)
    // on every iteration's join.
    val segments = segmentsIn.localCheckpoint()

    val ends = segments.select(col("seg_id"), col("props"),
        explode(array(element_at(col("pts"), 1),
          element_at(col("pts"), -1))).as("pt"))
      .withColumn("pkey", concat_ws("_",
        col("pt")(0), col("pt")(1), col("props")))

    // joinable endpoints: exactly 2 same-props segments touch
    val deg2 = ends.groupBy("pkey")
      .agg(collect_set("seg_id").as("segs"))
      .filter(size(col("segs")) === 2)

    val pairs = deg2.select(
      element_at(col("segs"), 1).as("a"),
      element_at(col("segs"), 2).as("b"))
      .filter(col("a") =!= col("b"))

    // iterative min-label propagation (chains are short)
    var labels = segments.select(col("seg_id"),
      col("seg_id").as("label"))
    val biPairs = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
    var changed = true
    var iter = 0
    while (changed && iter < 20) {
      val neighborMin = biPairs
        .join(labels.withColumnRenamed("seg_id", "b")
          .withColumnRenamed("label", "nlabel"), "b")
        .groupBy(col("a").as("seg_id"))
        .agg(min("nlabel").as("nmin"))
      val updated = labels.join(neighborMin, Seq("seg_id"), "left")
        .select(col("seg_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      changed = updated.join(labels.withColumnRenamed("label", "old"), "seg_id")
        .filter(col("label") =!= col("old")).limit(1).count() > 0
      labels = updated
      iter += 1
    }

    val labeledAll = segments.join(labels, "seg_id")

    // Only multi-segment components need the object-path stitch; the
    // overwhelming majority of components are singletons and stay in
    // the columnar path (the Dataset deserializer is the hot spot
    // otherwise).
    val multiLabels = labels.filter(col("seg_id") =!= col("label"))
      .select("label").distinct()
    val singles = labeledAll
      .join(multiLabels, Seq("label"), "left_anti")
      .select(col("label").as("run_id"), col("props"), col("pts"))
    val multis = labeledAll
      .join(broadcast(multiLabels), Seq("label"))
      .select(col("label"), col("seg_id"), col("props"), col("pts"))
      .as[LabeledSeg]
      .groupByKey(_.label)
      .mapGroups { (label, it) =>
        val segs = it.toSeq
        val props = segs.head.props
        (label, props, stitch(segs.map(s => s.pts.map(_.toSeq).toSeq)))
      }
      .toDF("run_id", "props", "pts")
    singles.unionByName(multis)
  }

  /** Stitch polyline fragments that pairwise share endpoints into one
    * line. Greedy walk from a degree-1 endpoint; fragments are reversed
    * as needed. Falls back to concatenation order for pathological
    * inputs (cycles), which the reference also leaves unmerged.
    */
  private[graft] def stitch(frags: Seq[Seq[Seq[Long]]]): Seq[Seq[Long]] = {
    if (frags.size == 1) return frags.head
    val remaining = scala.collection.mutable.ArrayBuffer(frags: _*)
    // find a fragment with an endpoint not shared by any other fragment
    def endpoints(f: Seq[Seq[Long]]) = (f.head, f.last)
    val counts = scala.collection.mutable.Map[Seq[Long], Int]()
    frags.foreach { f =>
      val (a, b) = endpoints(f)
      counts(a) = counts.getOrElse(a, 0) + 1
      counts(b) = counts.getOrElse(b, 0) + 1
    }
    val startIdx = remaining.indexWhere(f =>
      counts(f.head) == 1 || counts(f.last) == 1)
    val first = if (startIdx >= 0) remaining.remove(startIdx)
      else remaining.remove(0)
    val out = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    out ++= (if (startIdx >= 0 && counts(first.head) != 1) first.reverse
      else first)
    var extended = true
    while (remaining.nonEmpty && extended) {
      extended = false
      val tail = out.last
      val i = remaining.indexWhere(f => f.head == tail || f.last == tail)
      if (i >= 0) {
        val f = remaining.remove(i)
        val oriented = if (f.head == tail) f else f.reverse
        out ++= oriented.drop(1)
        extended = true
      }
    }
    // anything unreachable (shouldn't happen for true chains): append raw
    remaining.foreach(f => out ++= f)
    out.toSeq
  }

  /** Full N1→N3 pipeline; returns run_id, props, coords (degrees). */
  def normalizeRuns(runs: DataFrame): DataFrame = {
    val segs = splitSharedArcs(runs)
    combineSegments(segs)
      .select(col("run_id"), col("props"),
        transform(col("pts"), p => array(
          element_at(p, 1).cast("double") / Q,
          element_at(p, 2).cast("double") / Q)).as("coords"))
  }
}
