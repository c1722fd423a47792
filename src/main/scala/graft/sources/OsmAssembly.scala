package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
