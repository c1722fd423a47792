package graft

import graft.sources.{GeoJson, OsmAssembly}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("assembleWays joins node coords in ref order") {
    val nodes = Seq((1L, 10.0, 47.0), (2L, 10.001, 47.0), (3L, 10.002, 47.1))
      .toDF("node_id", "lon", "lat")
    val ways = Seq((100L, Seq(3L, 1L, 2L)), (200L, Seq(2L, 99L)))
      .toDF("way_id", "refs")
    val got = OsmAssembly.assembleWays(ways, nodes).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq).toSeq).toMap
    assert(got(100L) == Seq(Seq(10.002, 47.1), Seq(10.0, 47.0),
      Seq(10.001, 47.0)))
    // missing ref 99 dropped, resolvable point kept
    assert(got(200L) == Seq(Seq(10.001, 47.0)))
  }

  test("GeoJSON feature round-trip (LineString + Point + Polygon)") {
    val rows = Seq(
      (Map("type" -> "run", "name" -> "A"), "LineString",
        Seq(Seq(10.0, 47.0), Seq(10.001, 47.002))),
      (Map("type" -> "spot"), "Point", Seq(Seq(9.5, 46.5))),
      (Map("type" -> "area"), "Polygon",
        Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(1.0, 1.0), Seq(0.0, 0.0))))
      .toDF("properties", "geomType", "coords")
    val json = rows.select(GeoJson.featureJson(
      col("properties"), col("geomType"), col("coords")).as("value"))
    val back = GeoJson.decodeFeatures(json, col("value"))
      .orderBy("geomType").collect()
    assert(back.length == 3)
    val byType = back.map(r => r.getString(1) -> r).toMap
    assert(byType.keySet == Set("LineString", "Point", "Polygon"))
    assert(byType("Point").getSeq[scala.collection.Seq[Double]](2)
      .map(_.toSeq) == Seq(Seq(9.5, 46.5)))
    assert(byType("LineString").getSeq[scala.collection.Seq[Double]](2)
      .map(_.toSeq).toSeq == Seq(Seq(10.0, 47.0), Seq(10.001, 47.002)))
    assert(byType("Polygon").getSeq[scala.collection.Seq[Double]](2)
      .map(_.toSeq).toSeq.head == Seq(0.0, 0.0))
    assert(byType("LineString").getMap[String, String](0)("name") == "A")
  }

  test("featureJson emits parseable standard GeoJSON") {
    val rows = Seq((Map("a" -> "1"), "LineString",
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))).toDF("properties", "geomType", "coords")
    val s = rows.select(GeoJson.featureJson(col("properties"),
      col("geomType"), col("coords"))).collect().head.getString(0)
    assert(s.contains(""""type":"Feature""""))
    assert(s.contains(""""coordinates":[[1.0,2.0],[3.0,4.0]]"""))
  }
}
