package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON feature IO (SURVEY S4/S5).
  *
  * Internal canonical geometry is (geomType: string, coords:
  * array<array<double>>) — Point is a 1-element coords list, Polygon
  * the outer ring (SURVEY §1.2 chose the inspectable nested-array form
  * over WKB). Files are JSONL of Feature objects — the streaming-
  * friendly shape; a literal FeatureCollection wrapper is a driver-side
  * concat (`wrapFeatureCollection`), mirroring how the reference
  * streams `features.*` (`/root/reference/src/io/GeoJSONReader.ts:4-8`)
  * and re-wraps on write (`src/transforms/FeatureCollection.ts:3-9`).
  *
  * GeoJSON coordinates are schema-flexible (depth varies per geometry
  * type), so they are extracted as raw JSON text (`get_json_object`)
  * and decoded per type — the Spark-native version of the reference's
  * duck-typed parse.
  */
object GeoJson {

  /** Parse a JSONL file of GeoJSON Features into
    * (properties: map<string,string>, geomType, coords).
    * Supported: Point (1-element coords), LineString, Polygon (outer
    * ring; `$.coordinates[0]`).
    */
  def readFeatures(spark: SparkSession, path: String): DataFrame =
    decodeFeatures(spark.read.text(path), col("value"))

  /** Same decode over an arbitrary column of Feature JSON strings. */
  def decodeFeatures(df: DataFrame, json: Column): DataFrame = {
    val line = ArrayType(ArrayType(DoubleType))
    val geomType = get_json_object(json, "$.geometry.type")
    df.select(
      from_json(get_json_object(json, "$.properties"),
        MapType(StringType, StringType)).as("properties"),
      geomType.as("geomType"),
      when(geomType === "Point",
        array(from_json(get_json_object(json, "$.geometry.coordinates"),
          ArrayType(DoubleType))))
        .when(geomType === "Polygon",
          from_json(get_json_object(json, "$.geometry.coordinates[0]"), line))
        .otherwise(
          from_json(get_json_object(json, "$.geometry.coordinates"), line))
        .as("coords"))
  }

  /** Full multi-part decode: (properties, geomType, parts) where
    * `parts: array<array<array<array<double>>>>` is part → ring →
    * position. Every GeoJSON geometry embeds losslessly:
    *  - Point            → one part, one ring, one position
    *  - LineString       → one part, one ring (the line)
    *  - Polygon          → one part, ALL rings (outer first, then
    *                       interior rings — holes are preserved, unlike
    *                       the 2-level [[decodeFeatures]] canonical form)
    *  - MultiPoint       → one part per point (the reference's
    *                       per-part central points are MultiPoint,
    *                       `GeoTransforms.ts:16-82`)
    *  - MultiLineString  → one part per line, one ring each
    *  - MultiPolygon     → verbatim (part → rings → positions)
    * The reference explodes Multi* runs per part
    * (`/root/reference/src/transforms/RunFormatter.ts:83-99`) and honors
    * interior rings in containment; this form is what those operators
    * consume.
    */
  def decodeFeaturesFull(df: DataFrame, json: Column): DataFrame = {
    val ring = ArrayType(ArrayType(DoubleType))
    val rings = ArrayType(ring)
    val multi = ArrayType(rings)
    val geomType = get_json_object(json, "$.geometry.type")
    val raw = get_json_object(json, "$.geometry.coordinates")
    df.select(
      from_json(get_json_object(json, "$.properties"),
        MapType(StringType, StringType)).as("properties"),
      geomType.as("geomType"),
      when(geomType === "Point",
        array(array(array(from_json(raw, ArrayType(DoubleType))))))
        .when(geomType === "LineString",
          array(array(from_json(raw, ring))))
        .when(geomType === "Polygon", array(from_json(raw, rings)))
        .when(geomType === "MultiPoint",
          transform(from_json(raw, ring), p => array(array(p))))
        .when(geomType === "MultiLineString",
          transform(from_json(raw, rings), l => array(l)))
        .when(geomType === "MultiPolygon", from_json(raw, multi))
        .as("parts"))
  }

  def readFeaturesFull(spark: SparkSession, path: String): DataFrame =
    decodeFeaturesFull(spark.read.text(path), col("value"))

  /** Render the full (properties, geomType, parts) form back to a
    * GeoJSON Feature JSON string — inverse of [[decodeFeaturesFull]].
    */
  def featureJsonFull(properties: Column, geomType: Column,
      parts: Column): Column =
    concat(
      lit("""{"type":"Feature","properties":"""),
      coalesce(to_json(properties), lit("null")),
      lit(""","geometry":{"type":""""), geomType,
      lit("""","coordinates":"""),
      when(geomType === "Point",
        to_json(element_at(element_at(element_at(parts, 1), 1), 1)))
        .when(geomType === "LineString",
          to_json(element_at(element_at(parts, 1), 1)))
        .when(geomType === "Polygon", to_json(element_at(parts, 1)))
        .when(geomType === "MultiPoint",
          to_json(transform(parts,
            p => element_at(element_at(p, 1), 1))))
        .when(geomType === "MultiLineString",
          to_json(transform(parts, p => element_at(p, 1))))
        .when(geomType === "MultiPolygon", to_json(parts)),
      lit("}}"))

  /** Render (properties, geomType, coords) as a GeoJSON Feature JSON
    * string (one per row — JSONL when written with text()). Polygon
    * coords are re-wrapped as a single outer ring.
    */
  def featureJson(properties: Column, geomType: Column, coords: Column): Column =
    concat(
      lit("""{"type":"Feature","properties":"""),
      coalesce(to_json(properties), lit("null")),
      lit(""","geometry":{"type":""""), geomType,
      lit("""","coordinates":"""),
      when(geomType === "Point", to_json(element_at(coords, 1)))
        .when(geomType === "Polygon",
          concat(lit("["), to_json(coords), lit("]")))
        .otherwise(to_json(coords)),
      lit("}}"))

  /** Driver-side FeatureCollection wrapper around a written JSONL dir.
    * The literal-JSON wrapper is inherently single-writer, but it
    * STREAMS partition-by-partition via toLocalIterator — the dataset
    * is never materialized on the driver (one partition in memory at a
    * time), so the sink survives outputs far larger than driver heap.
    *
    * NOT the primary sink at scale: the engine's canonical output is
    * the sharded JSONL directory itself (parallel writers, splittable
    * readers); this wrapper is an opt-in convenience for consumers that
    * require the literal single-file `FeatureCollection` shape, and its
    * throughput is bounded by the one driver-side writer regardless of
    * cluster size.
    */
  def wrapFeatureCollection(spark: SparkSession, jsonlDir: String,
      outFile: String): Unit = {
    val out = java.nio.file.Files.newBufferedWriter(
      java.nio.file.Paths.get(outFile), java.nio.charset.StandardCharsets.UTF_8)
    try {
      out.write("{\"type\":\"FeatureCollection\",\"features\":[\n")
      val it = spark.read.text(jsonlDir).toLocalIterator()
      var first = true
      while (it.hasNext) {
        if (!first) out.write(",\n")
        out.write(it.next().getString(0))
        first = false
      }
      out.write("\n]}")
    } finally out.close()
  }
}
