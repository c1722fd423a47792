package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** OSM JSON element assembly (SURVEY S3): build way geometries from
  * node references — the one nontrivial ingest operator. The reference
  * does this in-process via osmtogeojson
  * (`/root/reference/src/io/OSMToGeoJSONConverter.ts:91-115`); here it
  * is two shuffle joins + an ordered re-assembly, fully distributed:
  *
  *   ways → posexplode(nodes) → equi-join node coords on ref →
  *   groupBy(way).agg(sort_array(collect_list(struct(idx, coord))))
  *
  * Scale notes: the join shuffles on node id — at planet scale both
  * sides would be bucketed by node id; the per-way collect_list groups
  * are way-sized (tiny). Relations→multipolygons compose the same
  * pattern one level up (members → ways).
  */
object OsmAssembly {

  /** nodes: node_id (long), lon, lat
    * ways:  way_id (long), refs (array<long>, ordered)
    * Returns way_id, coords array<array<double>> in ref order; ways
    * with missing nodes keep the resolvable points (reference drops
    * unresolvable refs the same way).
    */
  def assembleWays(ways: DataFrame, nodes: DataFrame): DataFrame = {
    val exploded = ways.select(col("way_id"),
      posexplode(col("refs")).as(Seq("idx", "ref")))
    exploded.join(nodes, exploded("ref") === nodes("node_id"))
      .groupBy("way_id")
      .agg(
        transform(
          sort_array(collect_list(struct(col("idx"),
            array(col("lon"), col("lat")).as("pt")))),
          s => s.getField("pt")).as("coords"))
  }

  /** Greedy closed-ring assembly from undirected way fragments —
    * osmtogeojson's multipolygon member join (members of one ring are
    * arbitrary way segments in arbitrary order and orientation). Walks
    * from a fragment extending at the tail (reversing as needed, ways
    * carry no direction here) until the ring closes; broken chains
    * (unclosable) are dropped with the same silent-skip the reference
    * converter applies to incomplete rings. Returns rings as point
    * sequences whose first and last positions coincide.
    */
  private[graft] def assembleRings[P](
      frags: Seq[Seq[P]]): Seq[Seq[P]] = {
    val remaining = scala.collection.mutable.ArrayBuffer(
      frags.filter(_.size >= 2): _*)
    val rings = scala.collection.mutable.ArrayBuffer[Seq[P]]()
    while (remaining.nonEmpty) {
      val out = scala.collection.mutable.ArrayBuffer[P](
        remaining.remove(0): _*)
      var extended = true
      while (out.head != out.last && extended) {
        extended = false
        val tail = out.last
        val i = remaining.indexWhere(f => f.head == tail || f.last == tail)
        if (i >= 0) {
          val f = remaining.remove(i)
          out ++= (if (f.head == tail) f else f.reverse).drop(1)
          extended = true
        }
      }
      if (out.head == out.last && out.size >= 4) rings += out.toSeq
      // else: incomplete ring — dropped, fragments already consumed
    }
    rings.toSeq
  }

  /** Relations → multipolygon rings: one level above [[assembleWays]].
    *
    * relations: rel_id (long), members (array<struct<ref: long,
    * role: string>>, roles "outer"/"inner"); ways: way_id, coords.
    * Returns (rel_id, role, ring_no, ring) — one row per CLOSED ring,
    * ring_no numbering rings per (rel, role) deterministically by
    * first-point order.
    *
    * Scale shape: member explode + equi-join on way_id (bucketable),
    * then per-(relation, role) groups — relation-sized, tiny — walk
    * the ring assembly in a mapGroups.
    */
  /** Relations → full MultiPolygon parts: [[assembleRelations]]'s
    * labeled rings routed into the canonical multi-part form
    * (rel_id, parts: array<array<ring>>) — part = outer ring followed
    * by its interior rings. Each inner ring attaches to the outer ring
    * containing its first vertex (OSM multipolygon rings don't cross,
    * so one vertex decides; ties broken by lowest outer ring_no);
    * inner rings inside no outer are dropped, as osmtogeojson drops
    * unplaceable members. This is the missing downstream route for the
    * inner/outer labels — the result feeds `GeoJson.featureJsonFull`,
    * `Formatters.explodeParts` and hole-aware containment
    * (`GeoFunctions.pointInRings`) directly.
    */
  def assembleMultipolygons(relations: DataFrame, ways: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rings = assembleRelations(relations, ways)
    val outers = rings.filter(col("role") === "outer")
      .select(col("rel_id"), col("ring_no").as("outer_no"),
        col("ring").as("outer_ring"))
    val inners = rings.filter(col("role") === "inner")
      .select(col("rel_id"), col("ring_no").as("inner_no"),
        col("ring").as("inner_ring"))
    val px = element_at(element_at(col("inner_ring"), 1), 1)
    val py = element_at(element_at(col("inner_ring"), 1), 2)
    val w = Window.partitionBy("rel_id", "inner_no").orderBy("outer_no")
    val holes = inners.join(outers, Seq("rel_id"))
      .filter(graft.functions.GeoFunctions.pointInPolygon(
        px, py, col("outer_ring")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("rel_id", "outer_no")
      .agg(transform(
        sort_array(collect_list(struct(col("inner_no"), col("inner_ring")))),
        h => h.getField("inner_ring")).as("holes"))
    outers.join(holes, Seq("rel_id", "outer_no"), "left")
      .select(col("rel_id"), col("outer_no"),
        concat(array(col("outer_ring")),
          coalesce(col("holes"),
            array().cast("array<array<array<double>>>"))).as("rings"))
      .groupBy("rel_id")
      .agg(transform(
        sort_array(collect_list(struct(col("outer_no"), col("rings")))),
        s => s.getField("rings")).as("parts"))
  }

  def assembleRelations(relations: DataFrame, ways: DataFrame): DataFrame = {
    val spark = relations.sparkSession
    val members = relations
      .select(col("rel_id"), posexplode(col("members")).as(Seq("idx", "m")))
      .select(col("rel_id"), col("idx"), col("m.ref").as("way_id"),
        col("m.role").as("role"))
      .join(ways, "way_id")
      .select(col("rel_id"), col("role"), col("idx"), col("coords"))
    val outSchema = StructType(Seq(
      StructField("rel_id", LongType),
      StructField("role", StringType),
      StructField("ring_no", IntegerType),
      StructField("ring", ArrayType(ArrayType(DoubleType)))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    import spark.implicits._
    members
      .as[(Long, String, Int, Seq[Seq[Double]])]
      .groupByKey { case (rel, role, _, _) => (rel, role) }
      .flatMapGroups(
        (key: (Long, String),
            it: Iterator[(Long, String, Int, Seq[Seq[Double]])]) => {
          val frags = it.toSeq.sortBy(_._3).map(_._4)
          val rings = assembleRings(frags)
            .sortBy(r => (r.head(0), r.head(1)))
          rings.zipWithIndex.map { case (ring, i) =>
            Row(key._1, key._2, i, ring)
          }.iterator
        })(enc)
  }
}
