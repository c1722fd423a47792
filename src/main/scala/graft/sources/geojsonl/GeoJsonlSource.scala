package graft.sources.geojsonl

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for GeoJSONL feature files (SURVEY S4 as a
  * first-class `spark.read.format(...)` source):
  *
  * {{{
  *   spark.read.format("geojsonl").load("/data/runs")   // registered name
  *   spark.read.format("graft.sources.geojsonl.GeoJsonlSource").load(...)
  * }}}
  *
  * Rows come out in the library's full canonical form — `properties:
  * map<string,string>`, `geomType: string`, `parts: array<array<array<
  * array<double>>>>` (part → ring → position) — exactly
  * [[graft.sources.GeoJson.decodeFeaturesFull]]'s output, so every
  * downstream operator (per-part explode, hole-aware containment,
  * central points) consumes it unchanged. A unit spec pins row-level
  * equality between this reader and the column-expression decoder.
  *
  * Scale shape: one input partition per file — the upstream sink
  * writes sharded JSONL, so file-granular splits parallelize exactly
  * like the text source they replace; a byte-range line splitter is
  * the extension point if someone feeds one giant file. Column
  * pruning pushes down ([[SupportsPushDownRequiredColumns]]): a query
  * touching only `geomType` never parses properties or builds
  * coordinate arrays — visible as ReadSchema in `.explain`.
  *
  * Spatial pruning: the table exposes METADATA columns `bbox_w/s/e/n`
  * (per-feature bbox, null without geometry; absent from `SELECT *`).
  * Range predicates over them push into the scan, filter rows before
  * the expensive decode, and — where the sink's `.bbox` sidecar
  * summaries exist — prune whole FILES at planning time
  * ([[GeoJsonlBbox]]), the behavior that matters at 100 TB.
  */
class GeoJsonlSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "geojsonl"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoJsonlSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GeoJsonlTable(properties.get("path"))
}

object GeoJsonlSource {
  /** The session's Hadoop conf, serialized for executor-side file
    * access — so `spark.hadoop.*` settings (credentials, custom
    * filesystems) apply on the read and write paths, not just during
    * driver-side listing.
    */
  private[geojsonl] def sessionConf(): SerializableConfiguration =
    new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())

  private val Ring = ArrayType(ArrayType(DoubleType))
  val Schema: StructType = StructType(Seq(
    StructField("properties", MapType(StringType, StringType)),
    StructField("geomType", StringType),
    StructField("parts", ArrayType(ArrayType(Ring)))))
}

private[geojsonl] class GeoJsonlTable(path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"geojsonl($path)"
  override def schema(): StructType = GeoJsonlSource.Schema
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    GeoJsonlBbox.Cols.toArray.sorted.map { c =>
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = c
        override def dataType(): org.apache.spark.sql.types.DataType =
          DoubleType
        override def isNullable: Boolean = true
        override def comment(): String =
          "per-feature bbox ordinate (null without geometry)"
      }
    }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoJsonlScanBuilder(
      Option(path).getOrElse(options.get("path")),
      "permissive".equalsIgnoreCase(
        options.getOrDefault("mode", "failfast")))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GeoJsonlWriteBuilder(
      Option(path).getOrElse(info.options.get("path")), info.schema(),
      GeoJsonlSource.sessionConf())
}

private[geojsonl] class GeoJsonlScanBuilder(path: String,
    permissive: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = GeoJsonlSource.Schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // geomType predicates are evaluated exactly in the reader (before
  // the expensive properties/coordinates decode), so they are
  // accepted as fully pushed; everything else stays residual
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (accepted, residual) = filters.partition(GeoJsonlFilters.supported)
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed
  override def build(): Scan =
    new GeoJsonlScan(path, required, permissive, pushed)
}

private[geojsonl] case class GeoJsonlInputPartition(file: String)
    extends InputPartition

private[geojsonl] class GeoJsonlScan(path: String, required: StructType,
    permissive: Boolean,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"geojsonl $path, PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  // driver-side listing through the session's Hadoop conf (so the
  // source honors the same filesystems as every other reader); hidden
  // and _SUCCESS files are skipped like Spark's file sources do.
  // Files whose `.bbox` sidecar proves the pushed filters cannot
  // match any contained row are pruned HERE — the scan never opens
  // them (sidecar-less files always read).
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .filterNot(f => f.getName.startsWith("_")
            || f.getName.startsWith("."))
          .sortBy(_.toString)
      else Array(p)
    val kept =
      if (filters.isEmpty) files
      else files.filter { f =>
        GeoJsonlBbox.read(fs, f)
          .forall(s => GeoJsonlBbox.mayMatchAll(filters, s))
      }
    kept.map(f => GeoJsonlInputPartition(f.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonlReaderFactory(required.fieldNames, permissive,
      GeoJsonlSource.sessionConf(), filters)

  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read
      .streaming.MicroBatchStream =
    new GeoJsonlMicroBatchStream(path, required.fieldNames, permissive,
      checkpointLocation, GeoJsonlSource.sessionConf(), filters)
}

private[geojsonl] class GeoJsonlReaderFactory(fields: Array[String],
    permissive: Boolean, conf: SerializableConfiguration,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new GeoJsonlPartitionReader(
      partition.asInstanceOf[GeoJsonlInputPartition].file, fields,
      permissive, conf, filters)
}

/** Per-file line reader: Jackson-parse each Feature, emit only the
  * pruned fields. Runs on executors with the serialized session
  * Hadoop conf.
  */
private[geojsonl] class GeoJsonlPartitionReader(file: String,
    fields: Array[String], permissive: Boolean,
    conf: SerializableConfiguration,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper
  private val in = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p),
        java.nio.charset.StandardCharsets.UTF_8))
  }
  private var line: String = _
  private var node: JsonNode = _
  private var bbox: Array[java.lang.Double] = _

  private val wantBbox = fields.exists(GeoJsonlBbox.Cols)
  private val filterBbox = filters.exists(GeoJsonlFilters.needsBbox)

  // parse inside next() so `mode=permissive` can SKIP malformed lines
  // (the default, failfast, surfaces the file and offending line);
  // pushed geomType/bbox filters reject non-matching features HERE,
  // before the expensive properties/coordinates decode in get()
  override def next(): Boolean = {
    node = null
    while (node == null) {
      line = in.readLine()
      while (line != null && line.trim.isEmpty) line = in.readLine()
      if (line == null) return false
      try {
        val parsed = mapper.readTree(line)
        bbox = if (wantBbox || filterBbox) featureBbox(parsed) else null
        if (filters.isEmpty
            || GeoJsonlFilters.evalAll(filters, geomType(parsed), bboxAt))
          node = parsed
      }
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          if (!permissive) throw new IllegalArgumentException(
            s"malformed GeoJSON line in $file: " +
              line.take(120), e)
      }
    }
    true
  }

  private def bboxAt(col: String): java.lang.Double =
    if (bbox == null) null
    else col match {
      case GeoJsonlBbox.W => bbox(0)
      case GeoJsonlBbox.S => bbox(1)
      case GeoJsonlBbox.E => bbox(2)
      case GeoJsonlBbox.N => bbox(3)
      case _ => null
    }

  /** (w, s, e, n) over every coordinate, or null without geometry. */
  private def featureBbox(n: JsonNode): Array[java.lang.Double] = {
    var minLon = Double.MaxValue; var minLat = Double.MaxValue
    var maxLon = Double.MinValue; var maxLat = Double.MinValue
    var seen = false
    def walk(c: JsonNode): Unit =
      if (c.isArray && c.size() > 0) {
        if (c.get(0).isNumber) {
          if (c.size() >= 2) {
            val lon = c.get(0).asDouble(); val lat = c.get(1).asDouble()
            if (lon < minLon) minLon = lon
            if (lon > maxLon) maxLon = lon
            if (lat < minLat) minLat = lat
            if (lat > maxLat) maxLat = lat
            seen = true
          }
        } else {
          val it = c.elements()
          while (it.hasNext) walk(it.next())
        }
      }
    walk(n.path("geometry").path("coordinates"))
    if (!seen) null
    else Array[java.lang.Double](minLon, minLat, maxLon, maxLat)
  }

  override def get(): InternalRow = {
    InternalRow.fromSeq(fields.toSeq.map {
      case "properties" => props(node.path("properties"))
      case "geomType" => geomType(node) match {
        case null => null
        case t => UTF8String.fromString(t)
      }
      case "parts" => parts(node)
      case c if GeoJsonlBbox.Cols(c) => bboxAt(c) match {
        case null => null
        case d => d.doubleValue()
      }
      case other => throw new IllegalArgumentException(
        s"unknown geojsonl field $other")
    })
  }

  private def geomType(node: JsonNode): String = {
    val t = node.path("geometry").path("type")
    if (t.isTextual) t.asText() else null
  }

  private def props(p: JsonNode): ArrayBasedMapData =
    if (!p.isObject) null
    else {
      val entries = p.properties().asScala.toSeq
      new ArrayBasedMapData(
        new GenericArrayData(
          entries.map(e => UTF8String.fromString(e.getKey)).toArray[Any]),
        new GenericArrayData(entries.map { e =>
          val v = e.getValue
          if (v.isNull) null
          else UTF8String.fromString(
            if (v.isTextual) v.asText() else v.toString)
        }.toArray[Any]))
    }

  // part → ring → position nesting, mirroring decodeFeaturesFull
  private def parts(node: JsonNode): GenericArrayData = {
    val c = node.path("geometry").path("coordinates")
    geomType(node) match {
      case "Point" => arr(arr(arr(pos(c))))
      case "LineString" => arr(arr(ring(c)))
      case "Polygon" => arr(rings(c))
      case "MultiPoint" =>
        new GenericArrayData(
          c.asScala.map(p => arr(arr(pos(p))): Any).toArray)
      case "MultiLineString" =>
        new GenericArrayData(c.asScala.map(l => arr(ring(l)): Any).toArray)
      case "MultiPolygon" =>
        new GenericArrayData(c.asScala.map(rings(_): Any).toArray)
      case _ => null
    }
  }

  private def arr(e: Any): GenericArrayData = new GenericArrayData(Array(e))
  private def pos(p: JsonNode): GenericArrayData =
    new GenericArrayData(p.asScala.map(_.asDouble(): Any).toArray)
  private def ring(l: JsonNode): GenericArrayData =
    new GenericArrayData(l.asScala.map(pos(_): Any).toArray)
  private def rings(rs: JsonNode): GenericArrayData =
    new GenericArrayData(rs.asScala.map(ring(_): Any).toArray)

  override def close(): Unit = in.close()
}
